"""Routed exact explicit leg (ops/xw_route): bit-parity with the
bucket-leg semantics (values AND first-slot argmax tie rule) on random
bigram graphs, in Pallas interpret mode."""

import numpy as np
import pytest

from htk_tpu.ops.xw_route import (LZERO, RoutePlan, build_route,
                                  device_tables, routed_explicit_leg)


def ref_leg(WE, src, tgt, p, C, scale):
    """Slow reference: per-target max over stream-ordered slots,
    first slot wins ties (the bucket-leg rule)."""
    B = WE.shape[0]
    v = np.full((B, C), 2.0 * LZERO, np.float64)
    a = np.full((B, C), -1, np.int64)
    order = np.argsort(tgt, kind="stable")
    for k in order:
        cand = WE[:, src[k]] + p[k] * scale
        for b in range(B):
            if cand[b] > v[b, tgt[k]]:
                v[b, tgt[k]] = cand[b]
                a[b, tgt[k]] = src[k]
    return v, a


def rand_graph(rng, C, N):
    src = rng.integers(0, C, N)
    tgt = rng.integers(0, C, N)
    # dedup (src, tgt) pairs: ARPA bigram sets are unique
    key = src * C + tgt
    _u, idx = np.unique(key, return_index=True)
    src, tgt = src[idx], tgt[idx]
    p = rng.normal(size=len(src)).astype(np.float32) * 2.0
    return src, tgt, p.astype(np.float64)


@pytest.mark.parametrize("C,N,B", [(40, 200, 2), (300, 3000, 3),
                                   (513, 9000, 2)])
@pytest.mark.parametrize("variant", ["transpose", "gather0"])
def test_routed_matches_reference(C, N, B, variant):
    import jax.numpy as jnp

    rng = np.random.default_rng(C + N)
    src, tgt, p = rand_graph(rng, C, N)
    plan = build_route(src, tgt, p, C)
    dev = device_tables(plan)
    WE = rng.normal(size=(B, C)).astype(np.float32) * 10.0
    scale = 3.0
    dev = {**dev, "t_p": dev["t_p"] * scale}
    ev, ea = routed_explicit_leg(jnp.asarray(WE), dev,
                                 interpret=True, variant=variant)
    rv, ra = ref_leg(WE.astype(np.float64), src, tgt, p, C, scale)
    got_v = np.asarray(ev, np.float64)
    has = ra >= 0
    # f32 vs f64 reference: tolerance on values; argmax must agree
    # wherever the winner is unambiguous at f32
    np.testing.assert_allclose(got_v[has], rv[has], atol=1e-4)
    assert np.asarray(ea)[has].shape == ra[has].shape
    agree = (np.asarray(ea) == ra) | ~has
    assert agree.mean() > 0.999, f"argmax mismatch {1 - agree.mean()}"
    # empty targets stay at the pad floor
    assert np.all(got_v[~has] <= LZERO / 2)


def test_exact_vs_f32_bucket_leg():
    """Bit-parity against the REAL bucket leg computed in f32 with
    identical candidate values (same float arithmetic both sides)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    C, N, B = 257, 4000, 2
    src, tgt, p = rand_graph(rng, C, N)
    plan = build_route(src, tgt, p, C)
    dev = device_tables(plan)
    WE = rng.normal(size=(B, C)).astype(np.float32) * 10.0
    scale = 2.0
    dev = {**dev, "t_p": dev["t_p"] * np.float32(scale)}
    ev, ea = routed_explicit_leg(jnp.asarray(WE), dev,
                                 interpret=True)
    # f32 bucket-style reference with identical arithmetic:
    # cand = WE[src] + (p32 * scale32)
    p32 = (np.asarray(p, np.float32) * np.float32(scale))
    v = np.full((B, C), 2.0 * np.float32(LZERO), np.float32)
    a = np.full((B, C), -1, np.int64)
    order = np.argsort(tgt, kind="stable")
    for k in order:
        cand = WE[:, src[k]] + p32[k]
        for b in range(B):
            if cand[b] > v[b, tgt[k]]:
                v[b, tgt[k]] = cand[b]
                a[b, tgt[k]] = src[k]
    has = a >= 0
    np.testing.assert_array_equal(np.asarray(ev)[has], v[has])
    np.testing.assert_array_equal(np.asarray(ea)[has], a[has])


def test_decode_integration_interpret(monkeypatch):
    """Full LV decode with the routed leg (interpret mode) equals the
    bucket-leg decode bit-for-bit."""
    import sys

    sys.path.insert(0, "tests")
    from test_decode import emit_frames
    from test_lvdecode import TestFactoredCrossWord

    from htk_tpu.algo.decode import decode
    from htk_tpu.algo.lvnet import compile_lv_loop

    comp, v, words, lm, _lex = TestFactoredCrossWord._big_fixture()
    net_b = compile_lv_loop(words, v, comp, lm=lm, factored=True)
    net_r = compile_lv_loop(words, v, comp, lm=lm, factored=True)
    for seed, seq in ((3, ["aa", "iy", "aa"]), (9, ["sil", "aa", "iy"])):
        feats = emit_frames(seq, seed=seed)
        monkeypatch.delenv("HTKTPU_XW_ROUTE", raising=False)
        r0 = decode(net_b, comp, feats, lm_scale=2.0, word_pen=-1.0)
        monkeypatch.setenv("HTKTPU_XW_ROUTE", "interpret")
        rr = decode(net_r, comp, feats, lm_scale=2.0, word_pen=-1.0)
        assert rr.words == r0.words
        assert rr.times == r0.times
        assert rr.score == r0.score
