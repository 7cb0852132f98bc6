"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: HVite-style word-loop Viterbi decode real-time factor
(xRT) per chip on a synthetic RM-like task (100-word loop, 40 monophone
8-mix 39-dim GMM-HMMs, 5 s utterances). BASELINE.md north star:
< 0.01 xRT per chip on TPU v5e; `vs_baseline` reports target/actual so
values > 1.0 beat the target.

Also measures HERest Baum-Welch accumulation throughput (utterances/sec/
chip) and reports it inside the JSON line's `extra` field.

Run on the real chip (default env). Use JAX_PLATFORMS=cpu for a smoke run.
"""

from __future__ import annotations

import json
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_model(n_phones=40, nstates=5, dim=39, nmix=8, seed=0):
    from htk_tpu.models.proto import clone_proto, make_proto
    from htk_tpu.models.hmmset import compile_hmmset

    rng = np.random.default_rng(seed)
    hs = make_proto(nstates=nstates, dim=dim, parm_kind="MFCC_E_D_A", nmix=nmix)
    names = [f"ph{i}" for i in range(n_phones)]
    cl = clone_proto(hs, "proto", names)
    for h in cl.hmms.values():
        for si in h.states:
            for mp in si.streams[0].mixes:
                mp.mean = rng.normal(size=dim).astype(np.float32) * 2
                mp.var = (0.5 + rng.random(dim)).astype(np.float32)
                mp.fix_gconst()
    return compile_hmmset(cl), names


def build_net(comp, names, vocab_size=100, seed=1):
    from htk_tpu.algo.net import compile_network
    from htk_tpu.io.dictionary import Vocab
    from htk_tpu.tools.hbuild import word_loop_lattice

    rng = np.random.default_rng(seed)
    v = Vocab()
    words = []
    for i in range(vocab_size):
        w = f"w{i}"
        n_ph = int(rng.integers(3, 6))
        v.add_pron(w, [names[j] for j in rng.integers(0, len(names), n_ph)])
        words.append(w)
    lat = word_loop_lattice(words)
    return compile_network(lat, v, comp)


def bench_decode(comp, net, n_utts=16, T=500, dim=39, batch=8, seed=2):
    """Batched decode throughput; returns xRT per chip."""
    from htk_tpu.algo.decode import run_decode_batch
    from htk_tpu.ops.outp import all_state_outp

    rng = np.random.default_rng(seed)
    comp_state = jnp.asarray(net.comp_state)
    means = jnp.asarray(comp.means)
    variances = jnp.asarray(comp.variances)
    gconsts = jnp.asarray(comp.gconsts)
    state_mix = jnp.asarray(comp.state_mix)
    state_logw = jnp.asarray(comp.state_logw)

    @jax.jit
    def outp_batch(feats):  # (B, T, D)
        def one(x):
            logb, _ = all_state_outp(
                x, means, variances, gconsts, state_mix, state_logw,
                precision="default",
            )
            return logb[:, comp_state]

        return jax.vmap(one)(feats)

    def decode_batch(feats):
        # fused Pallas kernel on TPU, lax.scan elsewhere (algo/decode.py)
        return run_decode_batch(outp_batch(feats), net, 1.0, -10.0)

    feats = jnp.asarray(rng.normal(size=(batch, T, dim)).astype(np.float32))
    # warm up / compile
    out = decode_batch(feats)
    jax.block_until_ready(out)

    n_batches = max(1, n_utts // batch)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = decode_batch(feats)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    audio_seconds = n_batches * batch * T * 0.01  # 10 ms frames
    return dt / audio_seconds


def bench_herest(comp, names, n_utts=16, T=500, dim=39, seed=3):
    """BW accumulation throughput (utt/s/chip), device-composite path."""
    from htk_tpu.algo.trainer import (DeviceCompositeTrainer,
                                      prepare_utterance_ids)

    rng = np.random.default_rng(seed)
    utts = []
    for i in range(n_utts):
        seq = [names[j] for j in rng.integers(0, len(names), 40)]
        feats = rng.normal(size=(T, dim)).astype(np.float32)
        utts.append(prepare_utterance_ids(comp, f"u{i}", feats, seq))
    tr = DeviceCompositeTrainer(comp, precision="default")
    tr.accumulate(utts[:8], batch_size=8)  # warm up (same padded shapes)
    t0 = time.perf_counter()
    n_pass = 4
    for _ in range(n_pass):
        accs = tr.accumulate(utts, batch_size=8)
    jax.block_until_ready(accs.occ)
    dt = time.perf_counter() - t0
    return n_pass * n_utts / dt


def main():
    backend = jax.default_backend()
    comp, names = build_model()
    net = build_net(comp, names)
    xrt = bench_decode(comp, net)
    utt_s = bench_herest(comp, names)
    target = 0.01
    print(
        json.dumps(
            {
                "metric": "hvite_decode_xrt_per_chip",
                "value": round(xrt, 6),
                "unit": "xRT",
                "vs_baseline": round(target / xrt, 3),
                "extra": {
                    "herest_bw_utt_per_sec_per_chip": round(utt_s, 2),
                    "backend": backend,
                    "decode_network_states": int(net.n_states),
                    "note": "vs_baseline = 0.01 xRT north-star target / measured",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
