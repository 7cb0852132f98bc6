"""Windowed explicit-bigram gather kernel (the HLVRec LM-access hot path).

The factored cross-word step's explicit leg evaluates, per frame,
``cand[slot] = WE[pred[slot]] + lp[slot]`` over every bigram slot
(`HTKLVRec/HLVRec-LM.c` walks the LM arrays per active token; here the
whole leg is data-parallel). As a plain XLA gather this serialises at
~0.75 ns/element on v5e — 2.6 ms/frame at 20k vocabulary, 82% of exact
decode wall-clock (benchmarks/xw_profile.py).

Mosaic's vectorised `dynamic_gather` handles ONLY 128-lane tables
(benchmarks/dyngather_probe.py), so the kernel exploits locality
arranged statically: slots are sorted by 128-wide PREDECESSOR WINDOW,
so every (8, 128) slot tile reads from one window of WE. Per tile the
kernel dynamic-slices that window row out of the VMEM-resident WE
plane and lane-gathers it — no serialised element gathers anywhere.

MEASURED OUTCOME (v5e, benchmarks/xw_kernel_probe.py, 20k vocab /
430k slots / B=8, inside a scan): the kernel gathers at 0.24 ns/elem
vs XLA's 0.55 — a real 2.3x — but the decoder needs the candidates
back in the SUCC-major bucket layout for the vectorised per-word max,
and that static re-permutation is itself an elementwise XLA gather of
the same size (1.37 ms/frame): kernel+permute 2.29 ms/frame LOSES to
the plain bucket gather's 1.87. Window (pred) locality and succ
contiguity are incompatible for bigram sparsity, so an end-to-end win
needs the permutation done on-chip — a radix-128 Benes/Clos router
(5 lane-local stages + 4 block transposes, host-side Hall-coloring
routing), bounded at ~4-6x on a leg that top-A histogram pruning
(`-u`, decode.py) already bypasses losslessly ~3x cheaper. The kernel
is therefore NOT wired into the decoder; it stays as the measured
building block (bit-exact, tested) should exact no-pruning decode at
50k+ vocab ever justify the router.

Layout contract (as built by benchmarks/xw_kernel_probe.py):
  lidx (NT*8, 128) int32  pred & 127 per slot; tile t = rows 8t..8t+7
  lp   (NT*8, 128) f32    bigram log-prob (LZERO padding)
  win  (NT,)       int32  WE window (pred >> 7) per tile
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 8        # one f32 register tile: 8 x 128 slots, one window
BLOCK_TILES = 16     # tiles per grid step (16 * 1024 slots)
_LZERO = -1.0e10


def _kernel(win_ref, we_ref, lidx_ref, lp_ref, out_ref):
    i = pl.program_id(1)
    for k in range(BLOCK_TILES):
        w = win_ref[i * BLOCK_TILES + k]
        row = we_ref[0, pl.ds(w, 1), :]                  # (1, 128)
        tb = jnp.broadcast_to(row, (TILE_ROWS, 128))
        sl = pl.ds(k * TILE_ROWS, TILE_ROWS)
        cand = jnp.take_along_axis(tb, lidx_ref[sl, :], axis=1)
        out_ref[0, sl, :] = cand + lp_ref[sl, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _window_gather_jit(we, win, lidx, lp, interpret=False):
    B, Wn = we.shape[0], we.shape[1]
    NT = win.shape[0]
    NB = NT // BLOCK_TILES
    rows = BLOCK_TILES * TILE_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec((1, Wn, 128), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((rows, 128), lambda b, i, *_: (i, 0)),
            pl.BlockSpec((rows, 128), lambda b, i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda b, i, *_: (b, i, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NT * TILE_ROWS, 128),
                                       jnp.float32),
        interpret=interpret,
    )(win, we, lidx, lp)
    return out.reshape(B, NT * TILE_ROWS * 128)


def window_gather(WE, win, lidx, lp, interpret=False):
    """cand (B, N) = WE[b, window[tile]*128 + lidx] + lp, tile-blocked.

    WE: (B, C) word-end scores; win/lidx/lp: the wg_* tables (lp already
    LM-scaled). Pads WE to whole 128-windows and the tile list to whole
    grid blocks (dummy window 0, lp = LZERO) inside the call.
    """
    B, C = WE.shape
    Wn = -(-C // 128)
    we = jnp.pad(WE, ((0, 0), (0, Wn * 128 - C)),
                 constant_values=_LZERO).reshape(B, Wn, 128)
    NT = win.shape[0]
    NTp = -(-NT // BLOCK_TILES) * BLOCK_TILES
    if NTp != NT:
        win = jnp.pad(win, (0, NTp - NT))
        lidx = jnp.pad(lidx, ((0, (NTp - NT) * TILE_ROWS), (0, 0)))
        lp = jnp.pad(lp, ((0, (NTp - NT) * TILE_ROWS), (0, 0)),
                     constant_values=_LZERO)
    return _window_gather_jit(we, win, lidx, lp,
                              interpret=interpret)[:, : NT * TILE_ROWS * 128]


_PROBE_OK = None


def kernel_available() -> bool:
    """Compile-and-run a tiny instance once; False if Mosaic rejects it."""
    global _PROBE_OK
    if _PROBE_OK is None:
        if os.environ.get("HTKTPU_XWGK", "auto") == "0":
            _PROBE_OK = False
        else:
            try:
                import numpy as np

                we = jnp.zeros((1, 130), jnp.float32)
                win = jnp.zeros((1,), jnp.int32)
                lidx = jnp.asarray(
                    np.arange(8 * 128, dtype=np.int32).reshape(8, 128) % 128)
                lp = jnp.zeros((8, 128), jnp.float32)
                jax.block_until_ready(window_gather(we, win, lidx, lp))
                _PROBE_OK = True
            except Exception:  # noqa: BLE001
                _PROBE_OK = False
    return _PROBE_OK
