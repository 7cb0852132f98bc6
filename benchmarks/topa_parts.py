"""Decompose the top-A explicit-leg cost: top_k vs approx_max_k vs
row-gathers vs scatter-max, each in a frame-loop scan at 20k scale."""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

C = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
B, A, O, T = 8, 256, 21, 200
LZERO = -1e10

rng = np.random.default_rng(0)
succ_j = jnp.asarray(rng.integers(0, C, size=(C, O), dtype=np.int32))
succ_p = jnp.asarray(rng.standard_normal((C, O)).astype(np.float32))
we0 = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))


def scan_of(body):
    @jax.jit
    def f(we):
        def step(carry, _):
            out = body(carry)
            return carry * 0.999 + out * 1e-6, ()

        return jax.lax.scan(step, we, None, length=T)[0]

    return f


def b_topk(we):
    v, i = jax.lax.top_k(we, A)
    return jnp.zeros_like(we).at[:, 0].set(v[:, 0] + i[:, 0])


def b_approx(we):
    v, i = jax.lax.approx_max_k(we, A)
    return jnp.zeros_like(we).at[:, 0].set(v[:, 0] + i[:, 0])


idxs_fix = jnp.asarray(rng.integers(0, C, size=(B, A), dtype=np.int32))


def b_rowgather(we):
    sj = succ_j[idxs_fix]
    sp = succ_p[idxs_fix]
    return jnp.zeros_like(we).at[:, 0].set(
        sp.sum((1, 2)) + sj.sum((1, 2)).astype(jnp.float32) * 1e-9
        + we[:, 0])


def b_scatter(we):
    sj = succ_j[idxs_fix]  # (B, A, O)
    cand = we[:, :A, None] + succ_p[idxs_fix]
    bidx = jnp.arange(B)[:, None, None]
    ex = jnp.full((B, C + 1), 2.0 * LZERO, jnp.float32)
    ex = ex.at[bidx, sj].max(cand, mode="promise_in_bounds")
    return ex[:, :C]


def b_gatherback(we):
    sj = succ_j[idxs_fix]
    bidx = jnp.arange(B)[:, None, None]
    exg = we[:, :(C + 1) - 1][
        jnp.arange(B)[:, None, None], jnp.clip(sj, 0, C - 1)]
    return jnp.zeros_like(we).at[:, 0].set(exg.sum((1, 2)))


def timed(name, body):
    f = scan_of(body)
    jax.block_until_ready(f(we0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(we0))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name}: {med / T * 1e3:.3f} ms/frame")


print(f"C={C} B={B} A={A} O={O} backend={jax.default_backend()}")
timed("top_k      ", b_topk)
try:
    timed("approx_max_k", b_approx)
except Exception as e:  # noqa: BLE001
    print("approx_max_k FAILED:", str(e)[:120])
timed("row-gathers", b_rowgather)
timed("scatter-max", b_scatter)
timed("gather-back", b_gatherback)
