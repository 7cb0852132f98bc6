"""Fused Pallas decode kernel — the HRec token-passing loop in VMEM.

One `pallas_call` per utterance batch runs the entire per-frame decode
recursion (word-end reduction, cross-word max-plus, banded within-word
update, word-link record propagation) inside a single kernel: scores and
records live in VMEM for all T frames, eliminating the per-step XLA
dispatch and HBM round-trips of the lax.scan path (~5-10x on the scan).

Semantics match algo/decode.py::decode_scan exactly (same outputs); the
scan path remains the reference implementation and the fallback on
non-TPU backends.

Layout notes (see pallas_guide): all vectors are (1, Ns) / (1, Nn) 2-D
rows; Ns and Nn are padded to lane multiples by the wrapper; the node
membership matrix is an additive f32 mask (0 = member, LZERO = not).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logmath import LZERO, LSMALL


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_row(x, k, fill):
    """(1, N) -> y[0, s] = x[0, s-k], fill for s < k."""
    if k == 0:
        return x
    n = x.shape[1]
    pad = jnp.full((1, k), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : n - k]], axis=1)


def _make_kernel(T: int, K: int):
    def kernel(outp_ref, band_ref, a0_ref, aE_ref, maskf_ref, trans_ref,
               start_ref, wdpen_ref, bonus_ref,
               we_ref, pwn_ref, pwt_ref, v_ref, wn_ref, wt_ref):
        Nn, Ns = maskf_ref.shape
        # block refs carry a leading batch dim of 1 (grid over B)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (Nn, Ns), 1)

        a0 = a0_ref[:]          # (1, Ns)
        aE = aE_ref[:]
        bonus = bonus_ref[:]
        maskf = maskf_ref[:]    # (Nn, Ns) additive mask
        member = maskf > LSMALL
        trans = trans_ref[:]    # (Nn, Nn)
        start = start_ref[:]    # (1, Nn)
        wdpen = wdpen_ref[:]    # (1, Nn) per-node word penalty

        def body(t, carry):
            v, wn, wt = carry  # (1, Ns) f32 / i32 / i32

            # 1. word ends: masked max over member states per node
            e_state = v + aE
            masked = e_state + maskf  # (Nn, Ns) broadcast over rows
            we = jnp.max(masked, axis=1, keepdims=True)  # (Nn, 1)
            eq = masked >= we
            sid = jnp.min(jnp.where(eq, iota_s, Ns), axis=1, keepdims=True)
            onehot = iota_s == sid
            pwn = jnp.sum(jnp.where(onehot, wn, 0), axis=1, keepdims=True)
            pwt = jnp.sum(jnp.where(onehot, wt, 0), axis=1, keepdims=True)
            ok = we > LSMALL
            pwn = jnp.where(ok, pwn, -1)
            pwt = jnp.where(ok, pwt, -1)
            we_ref[0, pl.ds(t, 1), :] = we.reshape(1, Nn)
            pwn_ref[0, pl.ds(t, 1), :] = pwn.reshape(1, Nn)
            pwt_ref[0, pl.ds(t, 1), :] = pwt.reshape(1, Nn)

            # 2. cross-word max-plus (+ start entry at t == 0)
            cand = we + trans  # (Nn_from, Nn_to)
            entry_n = jnp.max(cand, axis=0, keepdims=True) + wdpen  # (1, Nn)
            an = jnp.argmax(cand, axis=0).reshape(1, Nn).astype(jnp.int32)
            entry_n = jnp.where(t == 0, start, entry_n)
            an = jnp.where(t == 0, -1, an)

            # broadcast node entry to member states (masked max over nodes)
            entry_s = (
                jnp.max(entry_n.reshape(Nn, 1) + maskf, axis=0, keepdims=True)
                + a0 + bonus
            )  # (1, Ns)
            an_s = jnp.max(
                jnp.where(member, an.reshape(Nn, 1), -1), axis=0, keepdims=True
            )

            # 3. within-word banded update with running record select
            within = jnp.full_like(v, LZERO)
            wwn = jnp.full_like(wn, -1)
            wwt = jnp.full_like(wt, -1)
            for k in range(K):
                candk = _shift_row(v, k, LZERO) + band_ref[k, :].reshape(1, Ns)
                better = candk > within
                within = jnp.where(better, candk, within)
                wwn = jnp.where(better, _shift_row(wn, k, -1), wwn)
                wwt = jnp.where(better, _shift_row(wt, k, -1), wwt)

            # 4. combine + emit
            outp_t = outp_ref[0, pl.ds(t, 1), :]
            use_entry = entry_s > within
            new_v = jnp.maximum(within, entry_s) + outp_t
            new_wn = jnp.where(use_entry, an_s, wwn)
            new_wt = jnp.where(use_entry, t - 1, wwt)
            dead = new_v <= LSMALL
            new_wn = jnp.where(dead, -1, new_wn)
            new_wt = jnp.where(dead, -1, new_wt)
            return new_v, new_wn, new_wt

        Ns_ = aE.shape[1]
        init = (
            jnp.full((1, Ns_), LZERO, jnp.float32),
            jnp.full((1, Ns_), -1, jnp.int32),
            jnp.full((1, Ns_), -1, jnp.int32),
        )
        v, wn, wt = jax.lax.fori_loop(0, T, body, init)
        v_ref[0] = v
        wn_ref[0] = wn
        wt_ref[0] = wt

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_nodes", "interpret"),
)
def decode_scan_pallas(
    outp_states,  # (B, T, Ns)
    band,  # (K, Ns)
    a0, aE,  # (Ns,)
    maskf,  # (Nn, Ns) additive membership mask (0 / LZERO)
    entry_bonus,  # (Ns,)
    trans,  # (Nn, Nn)
    start_entry,  # (Nn,)
    word_pen,  # (Nn,) per-node word-insertion penalty (traced)
    n_nodes: int,
    interpret: bool = False,
):
    """Batched fused decode; returns ((v, wn, wt), (WEs, pwns, pwts)).

    Output shapes match jax.vmap(decode_scan): finals (B, Ns); per-frame
    records (B, T, Nn).
    """
    B, T, Ns0 = outp_states.shape
    K = band.shape[0]
    Nn0 = trans.shape[0]
    Ns = _round_up(Ns0, 128)
    Nn = _round_up(Nn0, 8)

    def pad2(x, r, c, fill):
        return jnp.pad(x, ((0, r - x.shape[0]), (0, c - x.shape[1])),
                       constant_values=fill)

    outp_p = jnp.pad(outp_states, ((0, 0), (0, 0), (0, Ns - Ns0)),
                     constant_values=LZERO)
    band_p = pad2(band, K, Ns, LZERO)
    a0_p = jnp.pad(a0, (0, Ns - Ns0), constant_values=LZERO).reshape(1, Ns)
    aE_p = jnp.pad(aE, (0, Ns - Ns0), constant_values=LZERO).reshape(1, Ns)
    bonus_p = jnp.pad(entry_bonus, (0, Ns - Ns0),
                      constant_values=0.0).reshape(1, Ns)
    maskf_p = pad2(maskf, Nn, Ns, LZERO)
    trans_p = pad2(trans, Nn, Nn, LZERO)
    start_p = jnp.pad(start_entry, (0, Nn - Nn0),
                      constant_values=LZERO).reshape(1, Nn)
    wdpen_p = jnp.pad(jnp.asarray(word_pen, jnp.float32), (0, Nn - Nn0),
                      constant_values=0.0).reshape(1, Nn)

    kernel = _make_kernel(T, K)
    grid = (B,)
    bcast = lambda i: (0, 0)  # noqa: E731  shared params, same block per program

    out_shapes = (
        jax.ShapeDtypeStruct((B, T, Nn), jnp.float32),  # WE
        jax.ShapeDtypeStruct((B, T, Nn), jnp.int32),  # pwn
        jax.ShapeDtypeStruct((B, T, Nn), jnp.int32),  # pwt
        jax.ShapeDtypeStruct((B, 1, Ns), jnp.float32),  # v
        jax.ShapeDtypeStruct((B, 1, Ns), jnp.int32),  # wn
        jax.ShapeDtypeStruct((B, 1, Ns), jnp.int32),  # wt
    )
    per_b3 = lambda i: (i, 0, 0)  # noqa: E731

    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Ns), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Ns), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((Nn, Ns), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((Nn, Nn), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nn), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nn), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ns), bcast, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, Nn), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Nn), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Nn), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ns), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ns), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ns), per_b3, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(outp_p, band_p, a0_p, aE_p, maskf_p, trans_p, start_p,
      wdpen_p, bonus_p)

    WEs, pwns, pwts, v, wn, wt = res
    return (
        (v[:, 0, :Ns0], wn[:, 0, :Ns0], wt[:, 0, :Ns0]),
        (WEs[:, :, :Nn0], pwns[:, :, :Nn0], pwts[:, :, :Nn0]),
    )


def make_maskf(node_of_state: np.ndarray, n_nodes: int) -> np.ndarray:
    """Additive node-membership mask (Nn, Ns): 0 = member else LZERO."""
    m = node_of_state[None, :] == np.arange(n_nodes, dtype=np.int32)[:, None]
    return np.where(m, 0.0, LZERO).astype(np.float32)
