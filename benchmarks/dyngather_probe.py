"""Probe Mosaic's dynamic_gather (take_along_axis) forms and rates.

Determines whether a Pallas kernel can gather from a VMEM-resident
table faster than XLA's serialised gather — and at what table width.
Run on the chip: python benchmarks/dyngather_probe.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096  # gather rows per call
T = 100   # calls per timed scan (simulating frames)


def build(width, n):
    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]  # (8, width)
        idx = idx_ref[:]  # (n, width->? ) use (n, 128) idx
        # broadcast table rows across the n rows in chunks of 8
        tb = jnp.broadcast_to(tbl[0][None, :], (n, width))
        out_ref[:] = jnp.take_along_axis(tb, idx, axis=1)

    @jax.jit
    def scan(tbl, idx):
        def step(carry, _):
            o = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n, idx.shape[1]),
                                               jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(carry, idx)
            return carry + o[0, 0] * 1e-9, o[0, 0]

        return jax.lax.scan(step, tbl, None, length=T)

    return scan


def timed(name, fn, *args):
    try:
        jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace(chr(10), " ")[:240]
        print(f"{name}: FAILED {type(e).__name__}: {msg}")
        return
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[2]
    n_el = N * 128 * T
    print(f"{name}: {med * 1e3 / T:.4f} ms/call "
          f"({med / n_el * 1e9:.3f} ns/elem)")


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  rows/call={N}x128")
    for width in (128, 256, 512, 1024, 2048):
        tbl = jnp.asarray(rng.standard_normal((8, width)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, width, size=(N, 128), dtype=np.int32))
        timed(f"take_along_axis width={width}", build(width, N), tbl, idx)


if __name__ == "__main__":
    main()
