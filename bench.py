"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: HVite-style word-loop Viterbi decode real-time factor
(xRT) per chip at BASELINE config #4 scale: 1,000-word vocabulary,
back-off bigram LM on the links, tied-state 8-mixture word-internal
triphones (2,000 physical tied states, 39-dim), 5 s utterances, decoded
through the uniform-row LV network (algo/lvnet). BASELINE.md north
star: < 0.01 xRT per chip on TPU v5e; `vs_baseline` reports
target/actual so values > 1.0 beat the target.

Extras inside the JSON line:
  - hdecode_5kvocab_xrt:   config #5 scale (5,000 words, back-off bigram
    pass-1 with word-end histogram pruning -u 256) — the LVCSR
    feasibility number the round-1 verdict asked for.
  - hvite_100w_loop_xrt:   the round-1 headline (kept for continuity).
  - herest_bw_utt_per_sec_per_chip: Baum-Welch accumulation throughput.

Features are synthetic noise: xRT measures compute, not WER (WER
pipelines are exercised in tests/ on synthesized speech).

Run on the real chip (default env). Use JAX_PLATFORMS=cpu for a smoke
run (BENCH_SMOKE=1 shrinks sizes).
"""

from __future__ import annotations

import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

SMOKE = os.environ.get("BENCH_SMOKE") == "1"


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


def build_tied_triphone_system(n_words, n_phones=40, n_tied=2000, nmix=8,
                               dim=39, seed=0):
    """Synthetic tied-state word-internal triphone system at config-#4
    scale: a pool of `n_tied` shared 8-mix states (the decision-tree
    tying outcome), word-internal triphones drawing 3 emitting states
    each from the pool, a random 3-5 phone lexicon, and a back-off
    bigram LM. Vocab prons hold the triphone names directly."""
    from htk_tpu.io.dictionary import Vocab
    from htk_tpu.io.lm import NGramLM
    from htk_tpu.io.mmf import HMMSet, HMMDef, MixPDF, StateInfo, StreamElem
    from htk_tpu.io.parmkind import str2parmkind
    from htk_tpu.models.hmmset import compile_hmmset
    from htk_tpu.models.proto import left_to_right_transp

    rng = np.random.default_rng(seed)
    phones = [f"p{i}" for i in range(n_phones)]

    # lexicon over monophone strings
    lex = {}
    words = []
    for i in range(n_words):
        w = f"w{i}"
        n_ph = int(rng.integers(3, 6))
        lex[w] = [phones[j] for j in rng.integers(0, n_phones, n_ph)]
        words.append(w)

    # word-internal triphone names per pron
    def internal(ph):
        out = []
        n = len(ph)
        for k, p in enumerate(ph):
            l = ph[k - 1] if k > 0 else None
            r = ph[k + 1] if k < n - 1 else None
            if l and r:
                out.append(f"{l}-{p}+{r}")
            elif r:
                out.append(f"{p}+{r}")
            elif l:
                out.append(f"{l}-{p}")
            else:
                out.append(p)
        return out

    vocab = Vocab()
    tri_names = set()
    for w in words:
        tri = internal(lex[w])
        vocab.add_pron(w, tri)
        tri_names.update(tri)

    # shared tied-state pool
    pool = []
    for _ in range(n_tied):
        se = StreamElem(
            weights=[1.0 / nmix] * nmix,
            mixes=[
                MixPDF(
                    mean=(rng.normal(size=dim) * 2).astype(np.float32),
                    var=(0.5 + rng.random(dim)).astype(np.float32),
                )
                for _ in range(nmix)
            ],
        )
        for mp in se.mixes:
            mp.fix_gconst()
        pool.append(StateInfo(streams=[se]))
    tp = left_to_right_transp(5)

    hset = HMMSet(vec_size=dim, parm_kind=str2parmkind("MFCC_E_D_A"))
    for name in sorted(tri_names):
        picks = rng.integers(0, n_tied, 3)
        hset.hmms[name] = HMMDef(
            name=name, nstates=5,
            states=[pool[k] for k in picks], transp=tp)
    comp = compile_hmmset(hset)

    # back-off bigram LM: each word has ~20 favoured successors
    lm = NGramLM(order=2)
    uni = math.log(0.5 / n_words)
    for w in words:
        lm.unigrams[w] = (uni, math.log(0.5))
    lm.unigrams["!ENTER"] = (-99.0, math.log(0.5))
    lm.unigrams["!EXIT"] = (uni, 0.0)
    fanout = 20
    for w in words:
        succ = rng.integers(0, n_words, fanout)
        for j in set(int(x) for x in succ):
            lm.bigrams[(w, words[j])] = (math.log(0.4 / fanout), 0.0)
    return comp, vocab, words, lm


def bench_decode_lv(comp, vocab, words, lm, T=500, batch=8, n_batches=2,
                    max_active=None, seed=2, reps=3):
    """Batched LV word-loop decode; returns xRT per chip (full pipeline:
    OutP + scan + host traceback). Median of `reps` timed passes — the
    dev tunnel's run-to-run variance swings single measurements ±30%."""
    import statistics

    from htk_tpu.algo.decode import decode_batch
    from htk_tpu.algo.lvnet import compile_lv_loop

    net = compile_lv_loop(words, vocab, comp, lm=lm)
    rng = np.random.default_rng(seed)
    dim = comp.means.shape[1]
    feats = [rng.normal(size=(T, dim)).astype(np.float32)
             for _ in range(batch)]
    out = decode_batch(net, comp, feats, lm_scale=8.0, word_pen=-10.0,
                       max_active=max_active)  # warm up / compile
    assert any(r is not None for r in out)
    audio_seconds = n_batches * batch * T * 0.01
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_batches):
            out = decode_batch(net, comp, feats, lm_scale=8.0,
                               word_pen=-10.0, max_active=max_active)
        times.append(time.perf_counter() - t0)

    # device-pipeline xRT: the ONE jitted program (OutP + scan +
    # traceback) with operands resident — excludes the dev tunnel's
    # per-call host round-trips (~25 ms each), i.e. the number real
    # (non-tunnelled) serving hardware sees
    import jax
    import jax.numpy as jnp

    from htk_tpu.algo.decode import _BEAM_OFF, _lv_pipeline

    pipe = _lv_pipeline(net, comp, "highest", max_active, False)
    x = jnp.asarray(np.stack(feats))
    tr = jnp.asarray([T] * batch, jnp.int32)
    args = (jnp.asarray(8.0, jnp.float32), jnp.asarray(-10.0, jnp.float32),
            jnp.asarray(_BEAM_OFF, jnp.float32))
    r = pipe(x, tr, *args)
    jax.block_until_ready(r[0])
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = pipe(x, tr, *args)
        jax.block_until_ready(r[0])
        dts.append(time.perf_counter() - t0)
    dev_xrt = statistics.median(dts) / (batch * T * 0.01)
    return statistics.median(times) / audio_seconds, net, dev_xrt


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
    """Batched decode throughput on the round-1 100-word loop."""
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

    def decode_batch_(feats):
        return run_decode_batch(outp_batch(feats), net, 1.0, -10.0)

    feats = jnp.asarray(rng.normal(size=(batch, T, dim)).astype(np.float32))
    out = decode_batch_(feats)
    jax.block_until_ready(out)
    n_batches = max(1, n_utts // batch)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = decode_batch_(feats)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    audio_seconds = n_batches * batch * T * 0.01
    return dt / audio_seconds


def bench_herest(comp, names, n_utts=16, T=500, dim=39, seed=3):
    """BW accumulation throughput (utt/s/chip), device-composite path."""
    from htk_tpu.algo.trainer import (DeviceCompositeTrainer,
                                      prepare_utterance_ids)

    rng = np.random.default_rng(seed)
    # transcript length must fit the utterance: each model needs >= 3
    # emitting frames (SMOKE's short T made every utterance pathless)
    n_seq = min(40, T // 15)
    utts = []
    for i in range(n_utts):
        seq = [names[j] for j in rng.integers(0, len(names), n_seq)]
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


def bench_hdecode_batch(comp, vocab, words, lm, n_utts=64, seed=3, reps=3):
    """HDecode pass-1 throughput: 64 mixed-length utterances through the
    bucketed batched lattice generator vs the per-utterance loop.
    Returns (batched_xrt, sequential_xrt)."""
    import statistics

    from htk_tpu.algo.decode import generate_lattice, generate_lattice_batch
    from htk_tpu.algo.lvnet import compile_lv_loop

    net = compile_lv_loop(words, vocab, comp, lm=lm)
    rng = np.random.default_rng(seed)
    dim = comp.means.shape[1]
    lens = rng.integers(300, 700, size=n_utts)
    feats = [rng.normal(size=(int(t), dim)).astype(np.float32)
             for t in lens]
    audio = float(lens.sum()) * 0.01
    order = sorted(range(n_utts), key=lambda i: int(lens[i]))
    bsz = 16

    def run_batched():
        for i0 in range(0, n_utts, bsz):
            idx = order[i0:i0 + bsz]
            generate_lattice_batch(net, comp, [feats[j] for j in idx],
                                   lm_scale=8.0, lattice_beam=150.0)

    run_batched()  # compile
    tb = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_batched()
        tb.append(time.perf_counter() - t0)
    # sequential loop: one rep (it is the slow side being replaced)
    t0 = time.perf_counter()
    for f in feats[:16]:
        generate_lattice(net, comp, f, lm_scale=8.0, lattice_beam=150.0)
    seq_audio = float(sum(f.shape[0] for f in feats[:16])) * 0.01
    seq_xrt = (time.perf_counter() - t0) / seq_audio
    return statistics.median(tb) / audio, seq_xrt


def bench_hdecode_20k_topa(reps=3):
    """20k-vocab factored decode with top-A histogram pruning (A=128;
    traceback measured identical to the exact decode on this system).
    Returns (topA_xrt, exact_xrt)."""
    import statistics

    from htk_tpu.algo.decode import decode_batch
    from htk_tpu.algo.lvnet import compile_lv_loop

    comp, vocab, words, lm = build_tied_triphone_system(
        20000, n_tied=2000, seed=11)
    net = compile_lv_loop(words, vocab, comp, lm=lm, factored=True)
    rng = np.random.default_rng(3)
    B, T = 8, 500
    dim = comp.means.shape[1]
    feats = [rng.normal(size=(T, dim)).astype(np.float32)
             for _ in range(B)]
    audio = B * T * 0.01
    out = {}
    for name, ma in (("topA", 128), ("exact", None)):
        decode_batch(net, comp, feats, lm_scale=12.0, max_active=ma)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            decode_batch(net, comp, feats, lm_scale=12.0, max_active=ma)
            ts.append(time.perf_counter() - t0)
        out[name] = statistics.median(ts) / audio
    return out["topA"], out["exact"]


def main():
    backend = jax.default_backend()
    target = 0.01

    # headline: config #4 — 1k-vocab back-off bigram, tied 8-mix triphones
    n1k = 100 if SMOKE else 1000
    comp1, vocab1, words1, lm1 = build_tied_triphone_system(
        n1k, n_tied=(200 if SMOKE else 2000))
    T1 = 100 if SMOKE else 500
    xrt_1k, net1, dev_1k = bench_decode_lv(comp1, vocab1, words1, lm1,
                                           T=T1, batch=(2 if SMOKE else 8))

    # config #5 scale: 5k vocab with histogram pruning
    n5k = 200 if SMOKE else 5000
    comp5, vocab5, words5, lm5 = build_tied_triphone_system(
        n5k, n_tied=(200 if SMOKE else 2000), seed=7)
    xrt_5k, net5, dev_5k = bench_decode_lv(
        comp5, vocab5, words5, lm5, T=(100 if SMOKE else 500),
        batch=(2 if SMOKE else 16), n_batches=1, max_active=128)

    # HDecode batch path: 64 mixed-length utterances, bucketed batched
    # lattice generation vs the per-utterance loop it replaced
    hd_batch, hd_seq = bench_hdecode_batch(
        comp5, vocab5, words5, lm5, n_utts=(8 if SMOKE else 64))

    # 20k-vocab factored decode with/without top-A histogram pruning
    if SMOKE:
        xrt_20k_a = xrt_20k_x = 0.0
    else:
        xrt_20k_a, xrt_20k_x = bench_hdecode_20k_topa()

    # round-1 continuity numbers
    comp0, names0 = build_model()
    net0 = build_net(comp0, names0)
    xrt_100 = bench_decode(comp0, net0, T=(100 if SMOKE else 500),
                           batch=(2 if SMOKE else 8))
    utt_s = bench_herest(comp0, names0, n_utts=(4 if SMOKE else 16),
                         T=(100 if SMOKE else 500))

    print(
        json.dumps(
            {
                "metric": "hvite_1kvocab_bigram_xrt_per_chip",
                "value": round(xrt_1k, 6),
                "unit": "xRT",
                "vs_baseline": round(target / xrt_1k, 3),
                "extra": {
                    "hdecode_5kvocab_xrt": round(xrt_5k, 6),
                    "hdecode_5k_batch64_xrt": round(hd_batch, 6),
                    "hdecode_5k_seq_lattice_xrt": round(hd_seq, 6),
                    "hdecode_20k_topA128_xrt": round(xrt_20k_a, 6),
                    "hdecode_20k_exact_xrt": round(xrt_20k_x, 6),
                    "hdecode_5kvocab_device_xrt": round(dev_5k, 6),
                    "hvite_1kvocab_device_xrt": round(dev_1k, 6),
                    "hvite_100w_loop_xrt": round(xrt_100, 6),
                    "herest_bw_utt_per_sec_per_chip": round(utt_s, 2),
                    "backend": backend,
                    "net_1k_states": int(net1.n_states),
                    "net_5k_states": int(net5.n_states),
                    "note": "headline = BASELINE config #4 (1k-vocab "
                            "back-off bigram, tied-state 8-mix "
                            "triphones); vs_baseline = 0.01 xRT target "
                            "/ measured",
                },
            }
        )
    )


def _wait_backend_healthy(attempts=6, probe_timeout=180, backoff=60):
    """The dev tunnel's TPU claim/compile service flaps; probe backend
    health in a CHILD process (a failed in-process init poisons jax's
    backend cache) and wait out transient outages before running the
    real benchmark in this process."""
    import subprocess
    import sys
    import time as _time

    code = ("import jax, jax.numpy as a; "
            "(a.ones((256,256))@a.ones((256,256))).block_until_ready()")
    for k in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: backend probe {k + 1}/{attempts} failed; "
              f"retrying in {backoff}s", file=sys.stderr, flush=True)
        _time.sleep(backoff)
    return False  # run anyway — the real error message is the report


if __name__ == "__main__":
    _wait_backend_healthy()
    main()
