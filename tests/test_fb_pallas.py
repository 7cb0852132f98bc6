"""Fused Pallas FB kernel: parity vs the lax.scan reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from htk_tpu.algo.fb import backward_scan, forward_scan, xi_scan
from htk_tpu.ops.fb_pallas import fb_scans_pallas
from htk_tpu.utils.logmath import LZERO, ladd_reduce

from test_fb import small_set
from htk_tpu.algo.composite import build_composite


def _setup(seed=0, T=23, t_real=19):
    rng = np.random.default_rng(seed)
    comp = small_set(nmix=2, seed=seed)
    hmm = build_composite(comp, [0, 1, 0])
    Q = hmm.n_states
    outp = jnp.asarray(rng.normal(size=(T, Q)) * 2 - 4, jnp.float32)
    return (outp, jnp.asarray(hmm.logA), jnp.asarray(hmm.a0),
            jnp.asarray(hmm.aE), jnp.asarray(t_real, jnp.int32))


class TestKernelParity:
    def test_bit_exact_vs_scans(self):
        outp, logA, a0, aE, t_real = _setup()
        al_r = forward_scan(outp, logA, a0, t_real)
        be_r = backward_scan(outp, logA, aE, t_real)
        lp_r = ladd_reduce(al_r[t_real - 1] + aE, axis=0)
        xi_r = xi_scan(al_r, be_r, outp, logA, lp_r, t_real)

        al, be, lp, xi = fb_scans_pallas(outp, logA, a0, aE, t_real,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(al), np.asarray(al_r))
        tr = int(t_real)
        np.testing.assert_array_equal(np.asarray(be)[:tr],
                                      np.asarray(be_r)[:tr])
        assert float(lp) == float(lp_r)
        np.testing.assert_array_equal(np.asarray(xi), np.asarray(xi_r))

    def test_vmap_batching(self):
        outp, logA, a0, aE, _ = _setup()
        trs = jnp.asarray([23, 12, 5], jnp.int32)
        outp_b = jnp.stack([outp, outp - 1.0, outp + 0.5])
        f = jax.vmap(lambda o, t: fb_scans_pallas(o, logA, a0, aE, t,
                                                  interpret=True))
        al_b, be_b, lp_b, xi_b = f(outp_b, trs)
        for b in range(3):
            ar = forward_scan(outp_b[b], logA, a0, trs[b])
            lr = ladd_reduce(ar[trs[b] - 1] + aE, axis=0)
            np.testing.assert_array_equal(np.asarray(al_b[b]), np.asarray(ar))
            assert float(lp_b[b]) == float(lr)


class TestIntegration:
    def test_fb_batch_accs_identical(self, monkeypatch):
        """fb_batch with the kernel forced on (interpret) must produce
        the same accumulators as the scan path."""
        from htk_tpu.algo.trainer import Trainer, prepare_utterance

        comp = small_set(nmix=2, seed=3)
        rng = np.random.default_rng(3)
        utts = [prepare_utterance(comp, f"u{i}",
                                  rng.normal(size=(18 + i, 3)).astype(np.float32),
                                  ["a", "b"])
                for i in range(3)]

        monkeypatch.setenv("HTKTPU_FB_PALLAS", "0")
        a_ref = Trainer(comp).accumulate(utts, batch_size=4)
        monkeypatch.setenv("HTKTPU_FB_PALLAS", "1")
        a_pal = Trainer(comp).accumulate(utts, batch_size=4)

        assert float(a_pal.total_logp) == pytest.approx(
            float(a_ref.total_logp), rel=1e-6)
        np.testing.assert_allclose(np.asarray(a_pal.occ),
                                   np.asarray(a_ref.occ), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a_pal.sum_x),
                                   np.asarray(a_ref.sum_x), rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a_pal.tr),
                                   np.asarray(a_ref.tr), rtol=1e-5,
                                   atol=1e-6)
