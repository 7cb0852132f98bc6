"""Tropical (max-plus) matrix-vector kernel for the cross-word LM step.

The LVCSR decoder's per-frame cross-word update is
    entry[b, j] = max_i ( WE[b, i] + trans[i, j] ),   an[b, j] = argmax_i
over the (C, C) word-transition matrix (HTKLVRec/HLVRec.c's word-end ->
word-start token propagation with the bigram applied; C = number of
(word, pron) rows). XLA materialises the (B, C, C) broadcast (~1 GB per
frame at C=5.5k; measured 1.9-2.7 ms/frame on v5e) because the
lane-broadcast of WE forces a register transpose per tile.

This kernel works in the transposed layout instead: it streams stripes
of trans^T through VMEM and reduces over the *lane* axis, so the only
broadcast is WE's row over sublanes — the cheap direction. Per frame it
reads trans^T exactly once (C*C*4 bytes, ~150 us at C=5.5k) shared
across the whole utterance batch, plus ~B*C*C/1024 VPU element-ops.

Layout per grid program (one per 128-row stripe of trans^T = 128 word
targets j):
    for b in batch:                       # static unroll
      for ic in range(C / CH):            # fori_loop over source chunks
        cand = ttT[:, ic] + WE[b, ic][None, :]   # sublane broadcast
        elementwise max/arg accumulate (128, CH)
      lane-reduce max; argmax = min global index among maxima
      (exactly jnp.argmax's first-maximum tie rule)
writing out^T / arg^T stripes; the caller transposes (B*C*4 bytes,
negligible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LZERO = -1.0e10
_IBIG = np.int32(2**31 - 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tropical_pallas_t(WE, transT, *, interpret=False):
    """WE (B, Cp) f32, transT (Cp, Cp) f32 -> (outT, argT) each (Cp, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C = WE.shape
    JB = 128  # output-stripe height (targets j per program)
    CH = 512 if C % 512 == 0 else 128  # source chunk width (lanes)
    n_ch = C // CH

    def kernel(we_ref, tt_ref, out_ref, arg_ref):
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (JB, CH), 1)
        for b in range(B):  # static unroll over the batch
            def chunk(ic, carry):
                acc, accarg = carry
                t = tt_ref[:, pl.ds(ic * CH, CH)]  # (JB, CH)
                w = we_ref[b, pl.ds(ic * CH, CH)][None, :]  # (1, CH)
                cand = t + w  # sublane broadcast: cheap
                better = cand > acc
                gidx = lane_i + ic * CH
                return (jnp.where(better, cand, acc),
                        jnp.where(better, gidx, accarg))

            acc0 = jnp.full((JB, CH), LZERO, jnp.float32)
            arg0 = jnp.zeros((JB, CH), jnp.int32)
            acc, accarg = jax.lax.fori_loop(0, n_ch, chunk, (acc0, arg0))
            m = jnp.max(acc, axis=1, keepdims=True)  # (JB, 1)
            # first-maximum tie rule == smallest global source index
            a = jnp.min(jnp.where(acc == m, accarg, _IBIG), axis=1)
            out_ref[:, b] = m[:, 0]
            arg_ref[:, b] = a

    grid = (C // JB,)
    outT, argT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, C), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((JB, C), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((JB, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((JB, B), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, B), jnp.float32),
            jax.ShapeDtypeStruct((C, B), jnp.int32),
        ],
        interpret=interpret,
    )(WE, transT)
    return outT, argT


def pad_tropical_operand(trans, C=None):
    """Pad trans to (Cp, Cp) and pre-transpose for the kernel. Do this
    ONCE per network (not per frame): returns transT (Cp, Cp)."""
    C = C if C is not None else trans.shape[0]
    Cp = _round_up(max(C, 128), 128)
    tp = jnp.full((Cp, Cp), LZERO, jnp.float32)
    tp = tp.at[:C, :C].set(trans)
    return jnp.transpose(tp)


def tropical_matvec_argmax_padded(WE_p, transT_p):
    """Pre-padded fast path: WE_p (Bp, Cp), transT_p (Cp, Cp) ->
    (out (Bp, Cp), arg (Bp, Cp)). Padded sources hold LZERO and never
    win; padded targets produce garbage rows the caller masks."""
    outT, argT = _tropical_pallas_t(WE_p, transT_p)
    return jnp.transpose(outT), jnp.transpose(argT)


def tropical_matvec_argmax(WE, trans, use_pallas=None):
    """entry[b, j] = max_i WE[b, i] + trans[i, j], with first-max argmax.

    Convenience wrapper handling padding per call (tests / one-shot use;
    hot loops should pad once via pad_tropical_operand)."""
    B, C = WE.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        cand = WE[:, :, None] + trans[None]
        return jnp.max(cand, axis=1), jnp.argmax(cand, axis=1).astype(jnp.int32)
    Cp = _round_up(max(C, 128), 128)
    Bp = _round_up(max(B, 8), 8)
    WEp = jnp.full((Bp, Cp), LZERO, jnp.float32).at[:B, :C].set(WE)
    tTp = pad_tropical_operand(trans, C)
    out, arg = tropical_matvec_argmax_padded(WEp, tTp)
    return out[:B, :C], arg[:B, :C]
