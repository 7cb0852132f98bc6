"""Native (C++) runtime components, loaded via ctypes.

The library builds lazily on first use (single cc invocation); all
callers fall back to the pure-numpy path when no compiler is available,
so the package works identically either way — native is a speedup, not a
dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libhtkio.so")
_SRC = os.path.join(_HERE, "htkio.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def get_htkio() -> Optional[ctypes.CDLL]:
    """The libhtkio handle, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.htkio_crc16.restype = ctypes.c_uint16
    lib.htkio_crc16.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.htkio_load.restype = ctypes.c_int64
    lib.htkio_load.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.htkio_load_batch.restype = ctypes.c_int64
    lib.htkio_load_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.htkio_mlf_marks.restype = ctypes.c_int64
    lib.htkio_mlf_marks.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def load_corpus_batch(paths, max_frames: int, width: int):
    """Load many HTK feature files in one native call.

    Returns (arena (N, max_frames, width) f32, frames (N,) i64,
    periods (N,) i32, kinds (N,) i32) or None when native is unavailable.
    Files that fail to load report negative frame counts.

    Measured on this box: ~2x faster than the numpy reader for _C
    compressed corpora (the scalar dequantise dominates there); for
    uncompressed float32 files numpy's SIMD byteswap already wins, so
    callers should route through here only for compressed data.
    """
    import numpy as np

    lib = get_htkio()
    if lib is None:
        return None
    n = len(paths)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    out = np.empty((n, max_frames, width), np.float32)
    periods = np.zeros(n, np.int32)
    kinds = np.zeros(n, np.int32)
    frames = np.zeros(n, np.int64)
    lib.htkio_load_batch(
        blob, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_frames, width,
        periods.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out, frames, periods, kinds
