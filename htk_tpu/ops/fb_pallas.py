"""Fused Pallas forward-backward kernel — HFB's three scans in VMEM.

One kernel per utterance runs the backward recursion, the forward
recursion, the logP reduction and the xi transition-posterior
accumulation without leaving VMEM. Semantics match
algo/fb.py::forward_scan/backward_scan/xi_scan bit-exactly (same LAdd
clamping; tests/test_fb_pallas.py).

Measured on v5e this does NOT beat the production path: fb_batch vmaps
the scans over the utterance batch, so each recursion step is already
one large fused (B, Q, Q) op and the per-step dispatch cost is amortised
x B (~90-114 utt/s/chip scan vs ~83-89 fused, HTKTPU_FB_PALLAS=1 A/B).
Decode is the opposite case (3.7x win) because its steps are many small
gather-shaped ops. Kept opt-in as the substrate for time-sharded FB,
where per-chip sequential chunks will not have a batch to amortise over.

Layout notes (see pallas_guide): state vectors are (1, Q) rows with Q
padded to a lane multiple; the row<->column flips the recursions need are
done with identity-matmul `dot_general` contractions (exact in f32)
instead of transposes. The kernel has no grid — `jax.vmap` batches it by
prepending one, so it drops into the vmapped fb_utterance unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logmath import LSMALL, LZERO, MINEARG, MINLOGEXP


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ladd_reduce_kd(a, axis):
    """logmath.ladd_reduce with keepdims=True, inlined for the kernel."""
    hi = jnp.max(a, axis=axis, keepdims=True)
    diff = a - hi
    contrib = jnp.where(diff < MINLOGEXP, 0.0,
                        jnp.exp(jnp.maximum(diff, MINLOGEXP)))
    s = hi + jnp.log(jnp.sum(contrib, axis=axis, keepdims=True))
    return jnp.where(hi < LSMALL, LZERO, s)


def _make_kernel(T: int, Q: int):
    def kernel(outp_ref, logA_ref, logAT_ref, a0_ref, aE_ref, treal_ref,
               alphas_ref, betas_ref, logp_ref, xi_ref):
        logA = logA_ref[:]    # (Q, Q)
        logAT = logAT_ref[:]  # (Q, Q) transpose
        a0 = a0_ref[:]        # (1, Q)
        aE = aE_ref[:]
        t_real = treal_ref[0, 0]

        # identity for exact row<->column flips on the MXU
        ii = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
        eye = jnp.where(ii == jj, 1.0, 0.0).astype(jnp.float32)

        def col_to_row(col):  # (Q, 1) -> (1, Q)
            return jax.lax.dot_general(
                col, eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def row_to_col(row):  # (1, Q) -> (Q, 1)
            return jax.lax.dot_general(
                eye, row, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # -- backward: beta_t rows, recursion reset at t_real-1 ----------
        def bwd(i, beta_next):
            t = T - 1 - i
            o_next = jnp.where(
                t == T - 1, jnp.zeros((1, Q), jnp.float32),
                outp_ref[pl.ds(jnp.minimum(t + 1, T - 1), 1), :])
            v = o_next + beta_next  # (1, Q), lanes = j
            val_col = _ladd_reduce_kd(logA + v, axis=1)  # (Q, 1), rows = i
            val = col_to_row(val_col)
            beta_t = jnp.where(t == t_real - 1, aE, val)
            betas_ref[pl.ds(t, 1), :] = beta_t
            return beta_t

        jax.lax.fori_loop(0, T, bwd, jnp.full((1, Q), LZERO, jnp.float32))

        # -- forward: alpha_t rows ---------------------------------------
        def fwd(t, alpha):
            # pred[j] = lse_i alpha[i] + A[i, j]; lanes of logAT are i
            pred_col = _ladd_reduce_kd(logAT + alpha, axis=1)  # (Q, 1) = j
            pred = col_to_row(pred_col)
            alpha_new = jnp.where(t == 0, a0, pred) + outp_ref[pl.ds(t, 1), :]
            alphas_ref[pl.ds(t, 1), :] = alpha_new
            return alpha_new

        jax.lax.fori_loop(0, T, fwd, jnp.full((1, Q), LZERO, jnp.float32))

        # -- logP ----------------------------------------------------------
        tr1 = jnp.maximum(t_real - 1, 0)
        alpha_last = alphas_ref[pl.ds(tr1, 1), :]
        logp_row = _ladd_reduce_kd(alpha_last + aE, axis=1)  # (1, 1)
        logp = logp_row[0, 0]
        logp_ref[0, 0] = logp

        # -- xi: summed transition posteriors ------------------------------
        def xis(t, acc):
            alpha_col = row_to_col(alphas_ref[pl.ds(t, 1), :])  # (Q, 1) = i
            tgt = jnp.where(
                t == T - 1, jnp.full((1, Q), LZERO, jnp.float32),
                outp_ref[pl.ds(jnp.minimum(t + 1, T - 1), 1), :]
                + betas_ref[pl.ds(jnp.minimum(t + 1, T - 1), 1), :])
            x = alpha_col + logA + tgt - logp  # (Q, Q)
            term = jnp.where(x > LSMALL,
                             jnp.exp(jnp.maximum(x, MINEARG)), 0.0)
            valid = (t < t_real - 1).astype(jnp.float32)
            return acc + term * valid

        xi_ref[:, :] = jax.lax.fori_loop(
            0, T, xis, jnp.zeros((Q, Q), jnp.float32))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fb_scans_pallas(outp, logA, a0, aE, t_real, interpret: bool = False):
    """Fused scans for ONE utterance: (alphas, betas, logp, xi).

    Shapes: outp (T, Q), logA (Q, Q), a0/aE (Q,), t_real () int32.
    Batched by `jax.vmap` (pallas adds the grid dimension).
    """
    T, Q0 = outp.shape
    Q = _round_up(Q0, 128)

    outp_p = jnp.pad(outp, ((0, 0), (0, Q - Q0)), constant_values=LZERO)
    logA_p = jnp.pad(logA, ((0, Q - Q0), (0, Q - Q0)),
                     constant_values=LZERO)
    a0_p = jnp.pad(a0, (0, Q - Q0), constant_values=LZERO).reshape(1, Q)
    aE_p = jnp.pad(aE, (0, Q - Q0), constant_values=LZERO).reshape(1, Q)
    treal = jnp.asarray(t_real, jnp.int32).reshape(1, 1)

    kernel = _make_kernel(T, Q)
    alphas, betas, logp, xi = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Q), jnp.float32),
            jax.ShapeDtypeStruct((T, Q), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, Q), jnp.float32),
        ),
        interpret=interpret,
    )(outp_p, logA_p, logA_p.T, a0_p, aE_p, treal)

    return (alphas[:, :Q0], betas[:, :Q0], logp[0, 0], xi[:Q0, :Q0])
