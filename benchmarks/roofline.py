"""MFU / roofline accounting for the three hot kernels (VERDICT r3 #7).

Reports, for the benchmark system's OutP matmul, the FB scan step and
the LV decode scan step: achieved FLOP/s or bytes/s against the v5e
peaks, so "fast" is stated as a fraction of the chip rather than
against a soft xRT target.

v5e peaks used (public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
f32 matmuls lower as 3-pass bf16 (ppprecision HIGHEST) ~ 1/3 of peak;
the table reports both the raw achieved rate and the fraction of the
relevant ceiling.

Run on the chip: python benchmarks/roofline.py  (VOCAB=5000 default)
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

PEAK_BF16 = 197e12
PEAK_HBM = 819e9

VOCAB = int(os.environ.get("VOCAB", "5000"))
REPS = int(os.environ.get("REPS", "5"))


def timed(fn, *args):
    import jax

    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_tied_triphone_system
    from htk_tpu.ops.outp import pack_gaussians, mix_scores

    print(f"backend={jax.default_backend()} vocab={VOCAB}", flush=True)
    comp, vocab, words, lm = build_tied_triphone_system(
        VOCAB, n_tied=2000, seed=11)

    # --- 1. OutP matmul: (T, 2D) @ (2D, M) ---------------------------
    # R kernel invocations ride ONE jitted scan: a single-op call is
    # dominated by the dev tunnel's ~25 ms dispatch, not the kernel
    Wt, c = pack_gaussians(jnp.asarray(comp.means),
                           jnp.asarray(comp.variances),
                           jnp.asarray(comp.gconsts))
    D = comp.means.shape[1]
    M = comp.means.shape[0]
    T = 16384
    R = 16
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(R, T, D)).astype(np.float32))

    for prec in ("highest", "default"):
        def loop(xs, prec=prec):
            def step(acc, x):
                s = mix_scores(x, Wt, c, precision=prec)
                return acc + s[0, 0] + s[-1, -1], None
            out, _ = jax.lax.scan(step, jnp.float32(0), xs)
            return out

        f = jax.jit(loop)
        dt = timed(f, xs) / R
        flops = 2.0 * T * (2 * D) * M
        out_gb = T * M * 4 / 1e9  # the (T, M) result write dominates IO
        rate = flops / dt
        print(f"OutP matmul [{prec:7s}]: {T}x{2*D} @ {2*D}x{M}: "
              f"{dt*1e3:7.2f} ms  {rate/1e12:6.2f} TFLOP/s "
              f"({100*rate/PEAK_BF16:5.1f}% of bf16 peak; output stream "
              f"{out_gb/dt:6.1f} GB/s = {100*out_gb/dt/(PEAK_HBM/1e9):5.1f}%"
              f" of HBM)", flush=True)

    # --- 2. FB scan step (LAdd matvec over dense logA) ----------------
    from htk_tpu.algo.fb import backward_scan, forward_scan

    # a representative training composite: ~600 states, B=16 x T=500
    Q, B, Tf = 600, 16, 500
    logb = jnp.asarray(
        rng.normal(size=(B, Tf, Q)).astype(np.float32) - 4.0)
    a0 = jnp.full((Q,), -1e10, jnp.float32).at[0].set(0.0)
    aE = jnp.full((Q,), -1e10, jnp.float32).at[Q - 1].set(0.0)
    la = np.full((Q, Q), -1e10, np.float32)
    idx = np.arange(Q)
    la[idx, idx] = -0.1
    la[idx[:-1], idx[:-1] + 1] = -2.3
    la[idx[:-2], idx[:-2] + 2] = -3.0
    laj = jnp.asarray(la)

    def fb_run(lb):
        al = jax.vmap(lambda o: forward_scan(o, laj, a0, Tf))(lb)
        be = jax.vmap(lambda o: backward_scan(o, laj, aE, Tf))(lb)
        return al.sum() + be.sum()

    f = jax.jit(fb_run)
    dt = timed(f, logb)
    # each direction: Q^2 LAdd terms per frame per utterance (an LAdd
    # is ~6 flops: add, sub, exp, log1p, select, clamp)
    ladds = 2.0 * B * Tf * Q * Q
    # bandwidth view: the logA matrix streams per frame per utterance
    bytes_ = 2.0 * B * Tf * Q * Q * 4
    print(f"FB scan: B={B} T={Tf} Q={Q}: {dt*1e3:7.2f} ms "
          f"({dt/(B*Tf)*1e6:6.1f} us/frame-utt)  "
          f"{ladds/dt/1e9:6.1f} G LAdd/s "
          f"(~{6*ladds/dt/1e12:.2f} TFLOP/s equiv; logA stream "
          f"{bytes_/dt/1e9:6.1f} GB/s = {100*bytes_/dt/PEAK_HBM:5.1f}% "
          f"of HBM)", flush=True)

    # --- 3. LV decode scan step --------------------------------------
    from htk_tpu.algo.decode import (_net_dev, _scale_xw,
                                     decode_scan_uniform_batch)
    from htk_tpu.algo.lvnet import compile_lv_loop

    net = compile_lv_loop(words, vocab, comp, lm=lm)
    d = _net_dev(net)
    S = net.uniform_width
    Ns = net.n_states
    C = net.n_chains
    B, Tf = 8, 128
    outp = jnp.asarray(
        rng.normal(size=(B, Tf, Ns)).astype(np.float32) - 4.0)
    xw_s = _scale_xw(d.get("xw"), 8.0)
    for ma in (None, 256):
        f = jax.jit(lambda o, m=ma: decode_scan_uniform_batch(
            o, d["band"], d["a0"], d["aE"], S, d["bonus"],
            d["trans"] * 8.0, d["start"] * 8.0, -10.0,
            max_active=m, xw=xw_s))
        try:
            dt = timed(f, outp)
        except Exception as e:  # noqa: BLE001
            print(f"decode ma={ma}: failed {str(e)[:120]}")
            continue
        # state planes: v/rec read+write + entry/within compares + outp
        bytes_fr = B * Ns * 4 * 6
        if net.xw_backoff is None:
            # dense cross-word: (C, C) matrix streamed once per frame
            # for the whole batch; top-A reads only A rows per elem
            bytes_fr += (B * 256 * C * 4) if ma else (C * C * 4)
        rate = bytes_fr * Tf / dt
        label = f"top-A {ma}" if ma else "exact"
        print(f"decode scan [{label:9s}]: B={B} C={C} S={S}: "
              f"{dt*1e3:7.2f} ms ({dt/Tf*1e3:6.2f} ms/frame)  "
              f"{rate/1e9:6.1f} GB/s ({100*rate/PEAK_HBM:5.1f}% of HBM)",
              flush=True)


if __name__ == "__main__":
    main()
