"""A/B the windowed explicit-bigram Pallas gather vs the XLA bucket gather.

Measures, inside a scan at 20k-vocab LV-decode scale (430k bigram
slots, B=8): the plain serialised XLA gather (the shipped exact path),
the Pallas window-sorted kernel alone, and the kernel plus the static
re-permutation back to the succ-major reduction layout. See
ops/xw_pallas.py's docstring for the measured conclusion (kernel 2.3x
on the gather; the permutation eats it; not wired).

Run on the chip: python benchmarks/xw_kernel_probe.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from htk_tpu.ops.xw_pallas import window_gather

rng = np.random.default_rng(0)
C, B, SLOTS, T = 20000, 8, 430_000, 50
pred = rng.integers(0, C, SLOTS)
lp = rng.normal(size=SLOTS).astype(np.float32)
TILE = 8*128
order = np.argsort(pred >> 7, kind="stable")
rows_i, rows_p, wins = [], [], []
nwin = -(-C//128)
pad_tot = 0
for w in range(nwin):
    sel = order[(pred[order] >> 7) == w]
    if not len(sel): continue
    nt = -(-len(sel)//TILE)
    pad_tot += nt*TILE - len(sel)
    ai = np.zeros(nt*TILE, np.int32); ap = np.full(nt*TILE, -1e10, np.float32)
    ai[:len(sel)] = pred[sel] & 127; ap[:len(sel)] = lp[sel]
    rows_i.append(ai); rows_p.append(ap); wins += [w]*nt
lidx = jnp.asarray(np.concatenate(rows_i).reshape(-1,128))
lpf = jnp.asarray(np.concatenate(rows_p).reshape(-1,128))
win = jnp.asarray(np.asarray(wins, np.int32))
print(f"slots={SLOTS} padded={lidx.size} (+{100*pad_tot/SLOTS:.0f}%) tiles={win.size}", flush=True)
predj = jnp.asarray(pred); lpj = jnp.asarray(lp)
perm = jnp.asarray(rng.permutation(lidx.size)[:SLOTS].astype(np.int32))

@jax.jit
def scan_kernel(WE0):
    def step(carry, _):
        cand = window_gather(carry, win, lidx, lpf)
        m = jnp.max(cand[:, perm].reshape(B, -1, 4), axis=(1,2))
        return carry + m[:, None]*1e-9, ()
    return jax.lax.scan(step, WE0, None, length=T)[0]

@jax.jit
def scan_kernel_noperm(WE0):
    def step(carry, _):
        cand = window_gather(carry, win, lidx, lpf)
        m = jnp.max(cand.reshape(B, -1, 4), axis=(1,2))
        return carry + m[:, None]*1e-9, ()
    return jax.lax.scan(step, WE0, None, length=T)[0]

@jax.jit
def scan_gather(WE0):
    def step(carry, _):
        cand = carry[:, predj] + lpj[None]
        m = jnp.max(cand.reshape(B, -1, 4), axis=(1,2))
        return carry + m[:, None]*1e-9, ()
    return jax.lax.scan(step, WE0, None, length=T)[0]

WE0 = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
for name, fn in (("xla-gather", scan_gather), ("kernel+perm", scan_kernel), ("kernel-noperm", scan_kernel_noperm)):
    jax.block_until_ready(fn(WE0))
    ts = []
    for _ in range(5):
        t0=time.perf_counter(); jax.block_until_ready(fn(WE0)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {sorted(ts)[2]/T*1e3:.3f} ms/frame", flush=True)
