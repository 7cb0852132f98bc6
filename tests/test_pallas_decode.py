"""Pallas decode kernel parity vs the lax.scan reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from htk_tpu.algo.decode import decode_scan
from htk_tpu.ops.decode_pallas import decode_scan_pallas, make_maskf
from htk_tpu.utils.logmath import LZERO


def random_net(seed=0, Ns=30, Nn=5, K=3, B=2, T=20):
    rng = np.random.default_rng(seed)
    node_of_state = np.sort(rng.integers(0, Nn, Ns)).astype(np.int32)
    outp = (rng.normal(size=(B, T, Ns)) * 2).astype(np.float32)
    band = np.where(
        rng.random((K, Ns)) < 0.7, -rng.random((K, Ns)), LZERO
    ).astype(np.float32)
    band[0] = -0.5
    a0 = np.where(rng.random(Ns) < 0.3, 0.0, LZERO).astype(np.float32)
    aE = np.where(rng.random(Ns) < 0.3, -0.2, LZERO).astype(np.float32)
    bonus = np.zeros(Ns, np.float32)
    trans = np.where(
        rng.random((Nn, Nn)) < 0.5, -rng.random((Nn, Nn)), LZERO
    ).astype(np.float32)
    start = np.where(rng.random(Nn) < 0.5, 0.0, LZERO).astype(np.float32)
    for n in range(Nn):
        sel = np.where(node_of_state == n)[0]
        a0[sel[0]] = 0.0
        aE[sel[-1]] = -0.1
    return node_of_state, outp, band, a0, aE, bonus, trans, start


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_scan(seed):
    node_of_state, outp, band, a0, aE, bonus, trans, start = random_net(seed)
    Nn = int(trans.shape[0])

    ref = jax.vmap(
        lambda o: decode_scan(
            o, jnp.asarray(band), jnp.asarray(a0), jnp.asarray(aE),
            jnp.asarray(node_of_state), jnp.asarray(bonus),
            jnp.asarray(trans), jnp.asarray(start), -1.0, Nn,
        )
    )(jnp.asarray(outp))
    (vr, wnr, wtr), (WEr, pwnr, pwtr) = ref

    maskf = make_maskf(node_of_state, Nn)
    got = decode_scan_pallas(
        jnp.asarray(outp), jnp.asarray(band), jnp.asarray(a0),
        jnp.asarray(aE), jnp.asarray(maskf), jnp.asarray(bonus),
        jnp.asarray(trans), jnp.asarray(start),
        jnp.full((Nn,), -1.0, jnp.float32), Nn, interpret=True,
    )
    (vg, wng, wtg), (WEg, pwng, pwtg) = got

    live = np.asarray(vr) > LZERO / 2
    np.testing.assert_allclose(
        np.asarray(vg)[live], np.asarray(vr)[live], atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(wng), np.asarray(wnr))
    np.testing.assert_array_equal(np.asarray(wtg), np.asarray(wtr))
    liveWE = np.asarray(WEr) > LZERO / 2
    np.testing.assert_allclose(
        np.asarray(WEg)[liveWE], np.asarray(WEr)[liveWE], atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(pwng), np.asarray(pwnr))
    np.testing.assert_array_equal(np.asarray(pwtg), np.asarray(pwtr))


def test_window_gather_interpret():
    """xw_pallas.window_gather == WE[pred] + lp (interpret mode).

    The windowed explicit-bigram gather building block (see
    ops/xw_pallas.py for why it is not wired into the decoder).
    """
    from htk_tpu.ops.xw_pallas import window_gather

    rng = np.random.default_rng(0)
    C, n_slots = 300, 5000
    pred = rng.integers(0, C, n_slots)
    lp = rng.normal(size=n_slots).astype(np.float32)
    TILE = 8 * 128
    order = np.argsort(pred >> 7, kind="stable")
    rows_i, rows_p, wins, spans = [], [], [], []
    k0 = 0
    for w in range(3):
        sel = order[(pred[order] >> 7) == w]
        nt = -(-len(sel) // TILE)
        ai = np.zeros(nt * TILE, np.int32)
        ap = np.full(nt * TILE, -1e10, np.float32)
        ai[: len(sel)] = pred[sel] & 127
        ap[: len(sel)] = lp[sel]
        rows_i.append(ai)
        rows_p.append(ap)
        wins += [w] * nt
        spans.append((k0, sel))
        k0 += nt * TILE
    out = np.asarray(window_gather(
        jnp.asarray(rng.normal(size=(2, C)).astype(np.float32)),
        jnp.asarray(np.asarray(wins, np.int32)),
        jnp.asarray(np.concatenate(rows_i).reshape(-1, 128)),
        jnp.asarray(np.concatenate(rows_p).reshape(-1, 128)),
        interpret=True))
    # recompute WE used above (same rng order): regenerate deterministically
    rng = np.random.default_rng(0)
    pred2 = rng.integers(0, C, n_slots)
    lp2 = rng.normal(size=n_slots).astype(np.float32)
    WE = rng.normal(size=(2, C)).astype(np.float32)
    assert np.array_equal(pred, pred2) and np.array_equal(lp, lp2)
    for k0, sel in spans:
        ref = WE[:, pred[sel]] + lp[sel][None]
        assert np.array_equal(out[:, k0 : k0 + len(sel)], ref)
