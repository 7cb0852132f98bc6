"""File-based accumulator exchange (HERest -p parity mode).

Mirrors `HTKLib/HTrain.c : DumpAccs()/LoadAccs()`: a shard job writes its
summed Accumulators to disk; a combine job loads and adds them before
updating. Kept alongside the psum path (parallel/mesh.py) for recipe
parity and fault tolerance — a crashed shard is simply re-run (SURVEY.md
§5.3).

Format: numpy .npz with the Accumulator fields plus a shape-audit header.
[LC] Not byte-compatible with HTK's binary .acc files (the reference was
unavailable to verify its exact layout); the role and algebra are
identical.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..algo.fb import Accumulators
from ..utils.errors import HError

_FIELDS = ("occ", "sum_x", "sum_xx", "wt_occ", "tr",
           "total_logp", "total_frames", "n_utts")


def dump_accs(accs: Accumulators, path: str) -> None:
    # atomic (temp + fsync + rename): a crashed shard must either leave
    # a complete .acc to combine or nothing — never a truncated file
    # that poisons the -p 0 combine (SURVEY §5.3 idempotent recovery)
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(
                f, __version__=1,
                **{k: np.asarray(getattr(accs, k)) for k in _FIELDS})
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_accs(path: str) -> Accumulators:
    try:
        z = np.load(path)
    except OSError as e:
        HError(7110, "LoadAccs: cannot open accumulator file %s (%s)", path, e)
    missing = [f for f in _FIELDS if f not in z]
    if missing:
        HError(7111, "LoadAccs: %s missing fields %s", path, missing)
    return Accumulators(**{f: jnp.asarray(z[f]) for f in _FIELDS})


def sum_accs(accs_list: Sequence[Accumulators]) -> Accumulators:
    out = accs_list[0]
    for a in accs_list[1:]:
        if a.occ.shape != out.occ.shape or a.tr.shape != out.tr.shape:
            HError(7112, "sum_accs: accumulator shape mismatch (different model?)")
        out = Accumulators(*[x + y for x, y in zip(out, a)])
    return out
