"""Batch-amortised max-plus matvec kernel (the LV cross-word step).

entry[b, j] = max_i WE[b, i] + trans[i, j]   (+ argmax over i)

This is the per-frame cross-word step of the uniform-row LV decoder.
The XLA formulations all lose: a dense (B, C, C) broadcast re-reads the
(C, C) matrix once PER BATCH ELEMENT (1.6 GB/frame at C=5k, B=16), and
top-k pruning spends ~1.2 ms/frame in the sort — 85% of the whole scan
step (measured on v5e, see NOTES_ROUND2.md). This kernel streams the
matrix in row tiles and applies each tile to ALL batch rows while it
sits in VMEM, so HBM traffic is C²·4 bytes per frame (~100 MB at 5k)
regardless of batch size, and the compare/select work runs on the VPU
at full width. Exact (no pruning), first-maximum tie-breaking like
jnp.argmax.

Grid: one program per row tile, executed sequentially on TPU; the
(B, C) running best/argmax live in the output VMEM blocks across grid
steps (the standard revisiting-reduction pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logmath import LZERO


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(TR: int, SUB: int):
    def kernel(we_ref, trans_ref, out_ref, arg_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_ref[:] = jnp.full(out_ref.shape, LZERO, out_ref.dtype)
            arg_ref[:] = jnp.zeros(arg_ref.shape, arg_ref.dtype)

        tile = trans_ref[:]  # (TR, Cp) this grid step's row tile
        wet_tile = we_ref[:, pl.ds(i * TR, TR)]  # (B, TR): 128-aligned
        best = out_ref[:]  # (B, Cp) running max over source rows
        bi = arg_ref[:]
        for s in range(TR // SUB):
            sub = tile[s * SUB : (s + 1) * SUB, :]  # (SUB, Cp) static
            wet = wet_tile[:, s * SUB : (s + 1) * SUB]  # (B, SUB) static
            cand = wet[:, :, None] + sub[None, :, :]  # (B, SUB, Cp)
            m = jnp.max(cand, axis=1)
            a = (jnp.argmax(cand, axis=1).astype(jnp.int32)
                 + (i * TR + s * SUB))
            take = m > best
            best = jnp.where(take, m, best)
            bi = jnp.where(take, a, bi)
        out_ref[:] = best
        arg_ref[:] = bi

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxplus_matvec(WE: jnp.ndarray, trans: jnp.ndarray,
                   interpret: bool = False):
    """(B, C) x (C, C) max-plus product with argmax.

    Returns (entry (B, C) f32, an (B, C) int32). Padded source rows get
    LZERO WE so they never win; tie-breaking picks the first maximum.
    """
    B, C = WE.shape
    TR = 128  # rows per streamed tile
    SUB = 8  # rows per VPU sub-step ((B, SUB, Cp) stays ~2.5 MB)
    Cp = _round_up(C, TR)
    n_tiles = Cp // TR

    WE_p = jnp.pad(WE, ((0, 0), (0, Cp - C)), constant_values=LZERO)
    trans_p = jnp.pad(trans, ((0, Cp - C), (0, Cp - C)),
                      constant_values=LZERO)

    kernel = _make_kernel(TR, SUB)
    out, arg = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, Cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, Cp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, Cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Cp), jnp.float32),
            jax.ShapeDtypeStruct((B, Cp), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            # blocks + (B, SUB, Cp) intermediates exceed the default
            # 16 MB scoped-vmem budget at C ~ 5k
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(WE_p, trans_p)
    return out[:, :C], arg[:, :C]
