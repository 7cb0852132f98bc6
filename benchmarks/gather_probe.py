"""Probe: can a Pallas VMEM gather beat XLA's serialised gather?

The factored cross-word leg's hot op is `WE[preds] + scores` with
static `preds` (Cb, Fb) indices into a (C,) table that changes every
frame — measured at the XLA gather's ~3 ns/index floor (NOTES_ROUND2).
This times, inside a frame-loop scan like the decoder's:
  a) the XLA gather leg (current production form)
  b) a Pallas kernel gathering from a VMEM-resident table
  c) a one-hot bf16 MXU matmul formulation (for reference)
Run on the real chip: python benchmarks/gather_probe.py [C] [NNZ]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

C = int(sys.argv[1]) if len(sys.argv) > 1 else 22000
NNZ = int(sys.argv[2]) if len(sys.argv) > 2 else 640_000
FB = 16  # bucket width
CB = NNZ // FB
T = 50  # frames per timed scan
REPS = 5

rng = np.random.default_rng(0)
preds = jnp.asarray(rng.integers(0, C, size=(CB, FB), dtype=np.int32))
scores = jnp.asarray(rng.standard_normal((CB, FB)).astype(np.float32))
we0 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32))


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name}: {med * 1e3 / T:.3f} ms/frame  (total {med * 1e3:.1f} ms)")
    return out


@jax.jit
def xla_leg(we):
    def step(carry, _):
        cand = carry[preds] + scores
        m = jnp.max(cand, axis=1)
        # keep a data dependency frame-to-frame without changing size
        upd = jnp.zeros((C,), jnp.float32).at[jnp.arange(CB) % C].max(m)
        return jnp.maximum(carry * 0.999, upd), m[0]

    out, ms = jax.lax.scan(step, we, None, length=T)
    return out, ms


def pallas_leg_build():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(we_ref, preds_ref, scores_ref, out_ref):
        idx = preds_ref[:]  # (CB, FB) int32
        tbl = we_ref[:]  # (C,)
        g = jnp.take(tbl, idx, axis=0)
        out_ref[:] = jnp.max(g + scores_ref[:], axis=1, keepdims=True)

    def one(we):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((CB, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(we, preds, scores)

    @jax.jit
    def scan(we):
        def step(carry, _):
            m = one(carry)[:, 0]
            upd = jnp.zeros((C,), jnp.float32).at[jnp.arange(CB) % C].max(m)
            return jnp.maximum(carry * 0.999, upd), m[0]

        return jax.lax.scan(step, we, None, length=T)

    return scan


def main():
    print(f"C={C} NNZ={NNZ} buckets=({CB},{FB}) backend="
          f"{jax.default_backend()}")
    timed("xla gather", xla_leg, we0)
    try:
        fn = pallas_leg_build()
        timed("pallas gather", fn, we0)
    except Exception as e:  # noqa: BLE001
        print(f"pallas gather FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:300]}")


if __name__ == "__main__":
    main()
