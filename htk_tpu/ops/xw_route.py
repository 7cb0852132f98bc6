"""Routed exact cross-word explicit leg (the `HTKLVRec/HLVRec-LM.c`
LM-access hot path, TPU-shaped — the round-3 "Benes/Clos" design).

The exact explicit-bigram leg is a sparse max-plus mat-vec with a
STATIC pattern: exp_v[j] = max over bigrams (i -> j) of WE[i] + p_ij.
XLA's element gather of WE[preds] serialises (~0.75 ns/elem on v5e —
82% of exact LV decode wall at 20k vocab), while Mosaic's 128-lane
`take_along_axis` runs at vector speed. This module restructures the
leg so every dynamic access is a 128-lane gather:

  1. TRANSIT layout (host-compiled, static): slots are packed into
     (row, lane) positions such that
       - every transit row reads from ONE 128-wide source chunk of
         WE (so stage 1 is `take_along_axis(chunk_row, lanes)`), and
       - every slot's transit LANE equals its destination lane in the
         output layout (so routing never crosses lanes).
  2. ROUTE (in-kernel, VMEM): each 128x128 output tile selects, per
     (row, lane), one element from its transit block — a per-lane row
     gather implemented as blockwise transpose + lane gather +
     transpose (all Mosaic-supported 128x128 ops).
  3. REDUCTION (XLA): the output layout is the pow2-padded per-target
     bucket scheme, so per-target max/argmax are dense reshapes — the
     same shape of code as the existing bucket leg, minus its slow
     gather.

Slot order within each target is preserved from the bucket stream, so
values AND argmax tie-breaks are bit-identical to the bucket leg
(tested). Host compile is one vectorised numpy pass (no Python loops
over slots).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LZERO = -1.0e10
LANES = 128
TILE = LANES * LANES  # output positions per route tile
ROT = 37  # per-out-row transit-lane rotation stride (coprime to 128)


@dataclass
class RoutePlan:
    """Static tables for the routed explicit leg (host numpy)."""
    # transit tables, (D * rmax, 128) layout
    t_chunk: np.ndarray   # (D * rmax,) i32 — WE chunk id per row
    t_lane: np.ndarray    # (D * rmax, 128) i32 — src lane per slot
    t_p: np.ndarray       # (D * rmax, 128) f32 — bigram logp (LZERO pad)
    iroute: np.ndarray    # (D, 128, 128) i32 — transit row per out pos
    # reduction metadata (pow2 bucket groups over the out layout)
    groups: List[Tuple[int, int, int]]  # (fb, n_targets, flat offset)
    preds2: np.ndarray    # (N2,) i32 — source row per out slot (-1 pad)
    inv2: np.ndarray      # (C,) i32 — target row -> position in order2
    order2: np.ndarray    # (C,) i32 — layout position -> target row
    D: int
    rmax: int
    n_chunks: int
    C: int


def build_route(src: np.ndarray, tgt: np.ndarray, p: np.ndarray,
                C: int) -> RoutePlan:
    """Compile the route for the slot set (src row, tgt row, logp)."""
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    p = np.asarray(p, np.float64)
    N = len(src)

    # ---- output layout: pow2-padded per-target segments, grouped by
    # width (the bucket scheme with pow2 widths) -----------------------
    indeg = np.bincount(tgt, minlength=C).astype(np.int64)
    fb2 = np.maximum(1, 1 << np.ceil(
        np.log2(np.maximum(indeg, 1))).astype(np.int64))
    order2 = np.argsort(fb2, kind="stable")
    inv2 = np.empty(C, np.int64)
    inv2[order2] = np.arange(C)
    seg_w = fb2[order2]
    seg_off = np.concatenate([[0], np.cumsum(seg_w)[:-1]])
    N2 = int(seg_w.sum())

    # slot -> out position (stream order preserved within target, so
    # argmax tie-breaks match the bucket leg)
    eorder = np.argsort(tgt, kind="stable")
    tgt_s, src_s, p_s = tgt[eorder], src[eorder], p[eorder]
    row_first = np.cumsum(indeg) - indeg
    slot_in_tgt = np.arange(N, dtype=np.int64) - row_first[tgt_s]
    outpos = seg_off[inv2[tgt_s]] + slot_in_tgt

    preds2 = np.full(N2, -1, np.int32)
    preds2[outpos] = src_s

    groups: List[Tuple[int, int, int]] = []
    uniq_fb, fb_counts = np.unique(seg_w, return_counts=True)
    off = 0
    for fb, nt in zip(uniq_fb.tolist(), fb_counts.tolist()):
        groups.append((int(fb), int(nt), off))
        off += int(fb) * nt

    # ---- transit layout ---------------------------------------------
    D = -(-N2 // TILE)
    n_chunks = -(-C // LANES)
    out_tile = outpos // TILE
    # transit lane: the out column rotated per OUT ROW (stride-37).
    # The pow2 output segments align lanes across rows, which piles a
    # block's elements into few (block, lane) bins (measured 2x the
    # transit rows at 20k vocab); the rotation decorrelates them while
    # keeping per-out-row lane distinctness (it is a permutation of
    # each row), and undoes in-kernel with one lane gather whose
    # indices come from iota — see ROT below.
    out_lane = (outpos % LANES + ROT * (outpos // LANES)) % LANES
    s_chunk = src_s // LANES
    s_lane = src_s % LANES

    # block = (out tile, src chunk); within a block, elements bin by
    # transit lane; depth within the bin = transit row offset
    bkey = out_tile * n_chunks + s_chunk
    korder = np.lexsort((np.arange(N), out_lane, bkey))
    kb = bkey[korder]
    kl = out_lane[korder]
    comb = kb * LANES + kl
    newg = np.concatenate([[True], comb[1:] != comb[:-1]])
    gid = np.cumsum(newg) - 1
    gstart = np.flatnonzero(newg)
    depth = np.arange(N, dtype=np.int64) - gstart[gid]

    # rows per block = max depth + 1 over the block's lanes
    nblocks = D * n_chunks
    rows_blk = np.zeros(nblocks, np.int64)
    np.maximum.at(rows_blk, kb, depth + 1)
    # base row of each block inside its out tile's transit band, blocks
    # laid c-ascending; every tile gets one trailing all-LZERO pad row
    rows_d = np.zeros(D, np.int64)
    blk_d = np.arange(nblocks) // n_chunks
    np.add.at(rows_d, blk_d, rows_blk)
    # +1 guarantees an all-LZERO pad row per tile; round the band up
    # to whole 128-row pieces for the in-kernel transpose route
    rmax = int(rows_d.max()) + 1 if D else 1
    rmax = -(-rmax // LANES) * LANES
    blk_base = np.zeros(nblocks, np.int64)
    # cumsum of rows within each tile (blocks are tile-major)
    cr = np.cumsum(rows_blk)
    tile_first = np.arange(D) * n_chunks
    tile_cum0 = np.concatenate([[0], cr[:-1]])
    # base = cumsum within tile = global cumsum - cumsum at tile start
    start_of_tile = np.zeros(D, np.int64)
    if D:
        start_of_tile = tile_cum0[tile_first]
    blk_base = tile_cum0 - start_of_tile[blk_d]

    Rt = D * rmax
    t_chunk = np.zeros(Rt, np.int32)
    t_lane = np.zeros((Rt, LANES), np.int32)
    t_p = np.full((Rt, LANES), LZERO, np.float32)
    iroute = np.full((D, LANES, LANES), rmax - 1, np.int32)  # pad row

    e_tile = out_tile[korder]
    e_row = blk_base[kb] + depth          # row within tile band
    e_glob = e_tile * rmax + e_row        # global transit row
    t_chunk_rows = np.zeros(Rt, np.int64)
    # every row of a block reads that block's chunk; rows not covered
    # (pads) read chunk 0 (harmless, their p is LZERO)
    blk_rows_rep = np.repeat(np.arange(nblocks), rows_blk)
    blk_row_off = (np.arange(len(blk_rows_rep), dtype=np.int64)
                   - np.repeat(np.cumsum(rows_blk) - rows_blk, rows_blk))
    rows_glob = (blk_d[blk_rows_rep] * rmax
                 + blk_base[blk_rows_rep] + blk_row_off)
    t_chunk[rows_glob] = (blk_rows_rep % n_chunks).astype(np.int32)

    t_lane[e_glob, kl] = s_lane[korder].astype(np.int32)
    t_p[e_glob, kl] = p_s[korder].astype(np.float32)
    out_s = (outpos[korder] // LANES) % LANES
    iroute[e_tile, out_s, kl] = e_row.astype(np.int32)

    return RoutePlan(t_chunk=t_chunk, t_lane=t_lane, t_p=t_p,
                     iroute=iroute, groups=groups, preds2=preds2,
                     inv2=inv2.astype(np.int32),
                     order2=order2.astype(np.int32),
                     D=D, rmax=rmax, n_chunks=n_chunks, C=C)


def _unrotate(V):
    """Undo the per-out-row transit-lane rotation: out[s, j] =
    V[s, (j + ROT * (d*128 + s)) % 128], indices from iota (static)."""
    from jax.experimental import pallas as pl

    d = pl.program_id(1)
    s = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    lm = (j + ROT * (d * LANES + s)) % LANES
    return jnp.take_along_axis(V, lm, axis=1)


def _route_kernel_gather0(tb_ref, lane_ref, p_ref, ir_ref, out_ref):
    """Variant (a): direct axis-0 take_along_axis for the row select."""
    g = jnp.take_along_axis(tb_ref[0, 0], lane_ref[0], axis=1) + p_ref[0]
    out_ref[0, 0] = _unrotate(jnp.take_along_axis(g, ir_ref[0], axis=0))


def _route_kernel_transpose(tb_ref, lane_ref, p_ref, ir_ref, out_ref):
    """Variant (b): per-lane row select via 128x128 transposes + lane
    gathers (for Mosaic versions without axis-0 gather support)."""
    g = jnp.take_along_axis(tb_ref[0, 0], lane_ref[0], axis=1) + p_ref[0]
    rmax = g.shape[0]
    ir = ir_ref[0]
    acc = jnp.full((LANES, LANES), LZERO, jnp.float32)
    for k in range(rmax // LANES):
        gkt = g[k * LANES:(k + 1) * LANES].T      # lanes become rows
        sel = jnp.clip(ir - k * LANES, 0, LANES - 1)
        got = jnp.take_along_axis(gkt, sel.T, axis=1).T
        inpiece = (ir >= k * LANES) & (ir < (k + 1) * LANES)
        acc = jnp.where(inpiece, got, acc)
    out_ref[0, 0] = _unrotate(acc)


def routed_explicit_leg(WE: jnp.ndarray, dev: dict,
                        interpret: bool = False,
                        variant: str = "transpose"):
    """exp_v/exp_src over the routed layout.

    WE: (B, C) word-end scores. dev: device-side RoutePlan tables (see
    decode._net_dev; t_p arrives pre-scaled by lm_scale, like the
    bucket tables). Returns (exp_v (B, C), exp_src (B, C) int32) in
    row order — the same contract as the bucket leg.
    """
    from jax.experimental import pallas as pl

    B, C = WE.shape
    D = dev["D"]
    rmax = dev["rmax"]
    n_chunks = dev["n_chunks"]
    Ct = n_chunks * LANES
    WE_pad = jnp.concatenate(
        [WE, jnp.full((B, Ct - C), LZERO, WE.dtype)], axis=1)
    tiles = WE_pad.reshape(B, n_chunks, LANES)
    tbx = tiles[:, dev["t_chunk"]]               # (B, Rt, 128) row gather
    tbx = tbx.reshape(B, D, rmax, LANES)
    p_s = dev["t_p"].reshape(D, rmax, LANES)
    lane = dev["t_lane"].reshape(D, rmax, LANES)
    kern = (_route_kernel_gather0 if variant == "gather0"
            else _route_kernel_transpose)
    routed = pl.pallas_call(
        kern,
        grid=(B, D),
        in_specs=[
            pl.BlockSpec((1, 1, rmax, LANES), lambda b, d: (b, d, 0, 0)),
            pl.BlockSpec((1, rmax, LANES), lambda b, d: (d, 0, 0)),
            pl.BlockSpec((1, rmax, LANES), lambda b, d: (d, 0, 0)),
            pl.BlockSpec((1, LANES, LANES), lambda b, d: (d, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, LANES, LANES),
                               lambda b, d: (b, d, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, LANES, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(tbx, lane, p_s, dev["iroute"])
    flat = routed.reshape(B, D * TILE)

    # ---- reduction: pow2 bucket groups ------------------------------
    parts_v, parts_a = [], []
    for (fb, nt, off), pr in zip(dev["groups"], dev["preds2_g"]):
        seg = flat[:, off:off + nt * fb].reshape(B, nt, fb)
        parts_v.append(jnp.max(seg, axis=2))
        k = jnp.argmax(seg, axis=2)
        parts_a.append(pr[jnp.arange(nt)[None], k])
    val2 = jnp.concatenate(parts_v, axis=1)       # (B, C) layout order
    src2 = jnp.concatenate(parts_a, axis=1)
    exp_v = val2[:, dev["inv2"]]
    exp_src = src2[:, dev["inv2"]]
    return exp_v, exp_src


def device_tables(plan: RoutePlan) -> dict:
    """Upload the plan (jnp arrays + static metadata)."""
    preds2_g = []
    for fb, nt, off in plan.groups:
        preds2_g.append(jnp.asarray(
            plan.preds2[off:off + nt * fb].reshape(nt, fb)))
    return {
        "t_chunk": jnp.asarray(plan.t_chunk),
        "t_lane": jnp.asarray(plan.t_lane),
        "t_p": jnp.asarray(plan.t_p),
        "iroute": jnp.asarray(plan.iroute),
        "groups": plan.groups,
        "preds2_g": preds2_g,
        "inv2": jnp.asarray(plan.inv2),
        "D": plan.D,
        "rmax": plan.rmax,
        "n_chunks": plan.n_chunks,
    }
