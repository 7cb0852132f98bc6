"""Full-covariance (FULLC/LLTC) recognition path."""

import numpy as np
import pytest

from htk_tpu.io.mmf import load_mmf, save_mmf
from htk_tpu.models.hmmset import compile_hmmset
from htk_tpu.models.proto import clone_proto, make_proto
from htk_tpu.utils.errors import HTKError

from test_decode import emit_frames, separable_set

DIM = 3


def _diag_set():
    hs = make_proto(nstates=4, dim=DIM, parm_kind="USER")
    cl = clone_proto(hs, "proto", ["aa", "iy", "sil"])
    centers = {"aa": 5.0, "iy": -5.0, "sil": 0.0}
    for nm, h in cl.hmms.items():
        for k, si in enumerate(h.states):
            mp = si.streams[0].mixes[0]
            mp.mean = np.full(DIM, centers[nm], np.float32) + 0.3 * k
            mp.var = np.array([0.6, 0.8, 0.5], np.float32)
            mp.fix_gconst()
    return cl


def _to_fullc(hset, corr=0.0):
    """Convert every Gaussian to FULLC with precision diag(1/var) plus
    optional off-diagonal correlation structure."""
    for h in hset.hmms.values():
        for si in h.states:
            mp = si.streams[0].mixes[0]
            Sigma = np.diag(mp.var.astype(np.float64))
            if corr:
                for i in range(DIM):
                    for j in range(DIM):
                        if i != j:
                            Sigma[i, j] = corr * np.sqrt(
                                Sigma[i, i] * Sigma[j, j])
            mp.var = np.linalg.inv(Sigma).astype(np.float32)
            mp.cov_kind = "FULLC"
            mp.fix_gconst()
    return hset


def test_fullc_scores_match_f64_oracle():
    from htk_tpu.ops.outp import full_cov_mix_scores
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    M, D, T = 4, DIM, 6
    mus = rng.normal(size=(M, D))
    Ps = []
    for _ in range(M):
        A = rng.normal(size=(D, D))
        Ps.append(A @ A.T + np.eye(D))
    x = rng.normal(size=(T, D))

    fc_proj = np.zeros((M, D, D), np.float32)
    fc_mu = np.zeros((M, D), np.float32)
    gc = np.zeros(M, np.float32)
    for m, P in enumerate(Ps):
        L = np.linalg.cholesky(P)
        fc_proj[m] = L
        fc_mu[m] = mus[m] @ L
        gc[m] = D * np.log(2 * np.pi) - np.linalg.slogdet(P)[1]
    got = np.asarray(full_cov_mix_scores(
        jnp.asarray(x, jnp.float32), jnp.asarray(fc_proj),
        jnp.asarray(fc_mu), jnp.asarray(gc)))
    for t in range(T):
        for m in range(M):
            d = x[t] - mus[m]
            want = -0.5 * (D * np.log(2 * np.pi)
                           - np.linalg.slogdet(Ps[m])[1] + d @ Ps[m] @ d)
            assert got[t, m] == pytest.approx(want, rel=2e-4, abs=2e-3)


def test_fullc_diag_precision_decodes_like_diagc():
    from htk_tpu.algo.decode import decode
    from htk_tpu.algo.net import compile_network
    from htk_tpu.io.dictionary import Vocab
    from htk_tpu.tools.hbuild import word_loop_lattice

    comp_d = compile_hmmset(_diag_set())
    comp_f = compile_hmmset(_to_fullc(_diag_set()))
    assert comp_f.full_cov and not comp_d.full_cov

    lat = word_loop_lattice(["A", "I", "S"])
    v = Vocab()
    v.add_pron("A", ["aa"])
    v.add_pron("I", ["iy"])
    v.add_pron("S", ["sil"], out_sym="")
    net_d = compile_network(lat, v, comp_d)
    net_f = compile_network(lat, v, comp_f)
    feats = emit_frames(["sil", "aa", "iy", "aa", "sil"], seed=3)
    r_d = decode(net_d, comp_d, feats)
    r_f = decode(net_f, comp_f, feats)
    assert r_f is not None
    assert r_f.words == r_d.words == ["A", "I", "A"]
    assert r_f.score == pytest.approx(r_d.score, rel=1e-5)


def test_fullc_mmf_roundtrip_and_align(tmp_path):
    from htk_tpu.algo.composite import build_composite
    from htk_tpu.algo.viterbi import align

    hs = _to_fullc(_diag_set(), corr=0.3)
    p = str(tmp_path / "hmmdefs")
    save_mmf(hs, p)
    assert "<INVCOVAR>" in open(p).read()
    hs2 = load_mmf(p)
    comp = compile_hmmset(hs2)
    assert comp.full_cov
    seq = ["sil", "aa", "sil"]
    feats = emit_frames(seq)
    hmm = build_composite(comp, [comp.model_id(s) for s in seq])
    res = align(comp, hmm, feats)
    assert len(res.model_seq) == 3
    assert np.isfinite(res.score)


def test_fullc_training_rejected():
    from htk_tpu.algo.trainer import Trainer

    comp = compile_hmmset(_to_fullc(_diag_set()))
    with pytest.raises(HTKError):
        Trainer(comp)
