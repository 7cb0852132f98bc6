"""Viterbi alignment over composite utterance HMMs (max-plus scan).

The forced-alignment core of `HTKTools/HVite.c -a` and the segmentation
step of HInit: the same composite HMM used for Baum-Welch (algo/composite)
is decoded with a (max,+)-semiring scan storing per-frame backpointer
planes; traceback runs on host over the int32 planes (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hmmset import CompiledHMMSet
from ..ops.outp import mix_scores, pack_gaussians
from ..utils.logmath import LZERO, ladd_reduce
from .composite import CompositeHMM


def viterbi_scan(outp: jnp.ndarray, logA: jnp.ndarray, a0: jnp.ndarray,
                 aE: jnp.ndarray, t_real) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Max-plus forward pass with backpointers.

    Returns (score, deltas (T, Q), backptrs (T, Q) int32).
    """
    T, Q = outp.shape

    def step(delta, inp):
        outp_t, t = inp
        cand = delta[:, None] + logA  # (Q_from, Q_to)
        best = jnp.max(cand, axis=0)
        bp = jnp.argmax(cand, axis=0).astype(jnp.int32)
        new = jnp.where(t == 0, a0, best) + outp_t
        bp = jnp.where(t == 0, -1, bp)
        return new, (new, bp)

    init = jnp.full_like(outp[0], LZERO)
    _, (deltas, bps) = jax.lax.scan(step, init, (outp, jnp.arange(T)))
    last = deltas[jnp.maximum(t_real - 1, 0)]
    score = jnp.max(last + aE)
    return score, deltas, bps


def state_outp_for(comp_set_arrays, feats: jnp.ndarray, comp_state, q_mask,
                   precision: str = "highest", slot_blocks=None, state_sw=None,
                   fc_proj=None, fc_mu=None):
    means, variances, gconsts, state_mix, state_logw = comp_set_arrays
    if fc_proj is not None:
        from ..ops.outp import full_cov_mix_scores

        mlp = full_cov_mix_scores(feats, fc_proj, fc_mu, gconsts,
                                  precision=precision)
    else:
        Wt, c = pack_gaussians(means, variances, gconsts)
        mlp = mix_scores(feats, Wt, c, precision=precision)
    st_mix = state_mix[comp_state]
    st_logw = state_logw[comp_state]
    gathered = mlp[:, jnp.maximum(st_mix, 0)]
    weighted = jnp.where(st_mix[None] >= 0, gathered + st_logw[None], LZERO)
    blocks = list(slot_blocks) if slot_blocks else [(0, state_mix.shape[1])]
    st_sw = state_sw[comp_state] if state_sw is not None else None
    outp = None
    for (j0, j1) in blocks:
        bs = ladd_reduce(weighted[:, :, j0:j1], axis=-1)
        if st_sw is not None:
            bs = bs * st_sw[None, :, j0]
        outp = bs if outp is None else outp + bs
    return jnp.where(q_mask[None, :], outp, LZERO)


class Alignment(NamedTuple):
    score: float  # total Viterbi log-likelihood
    states: np.ndarray  # (T,) composite state index per frame
    model_seq: List[Tuple[int, int, int, float]]  # (model_idx_in_seq, t0, t1, score)


def align(
    comp: CompiledHMMSet,
    hmm: CompositeHMM,
    feats: np.ndarray,
    precision: str = "highest",
) -> Alignment:
    """Forced alignment of one utterance against its composite HMM."""
    arrays = (
        jnp.asarray(comp.means), jnp.asarray(comp.variances),
        jnp.asarray(comp.gconsts), jnp.asarray(comp.state_mix),
        jnp.asarray(comp.state_logw),
    )
    T = feats.shape[0]
    Q = hmm.n_states
    outp = state_outp_for(
        arrays, jnp.asarray(feats, jnp.float32), jnp.asarray(hmm.comp_state),
        jnp.ones(Q, bool), precision,
        slot_blocks=tuple(comp.slot_blocks) or None,
        state_sw=(jnp.asarray(comp.state_sw)
                  if comp.state_sw is not None else None),
        fc_proj=(jnp.asarray(comp.fc_proj) if comp.full_cov else None),
        fc_mu=(jnp.asarray(comp.fc_mu) if comp.full_cov else None),
    )
    score, deltas, bps = viterbi_scan(
        outp, jnp.asarray(hmm.logA), jnp.asarray(hmm.a0),
        jnp.asarray(hmm.aE), jnp.asarray(T)
    )
    deltas = np.asarray(deltas)
    bps = np.asarray(bps)
    score = float(score)

    # host traceback over int32 planes
    states = np.zeros(T, np.int32)
    j = int(np.argmax(deltas[T - 1] + np.asarray(hmm.aE)))
    states[T - 1] = j
    for t in range(T - 1, 0, -1):
        j = int(bps[t, states[t]])
        states[t - 1] = j

    # composite state -> instance index in the model sequence
    inst_of = np.zeros(Q, np.int32)
    qi = 0
    inst = 0
    for k, mid in enumerate(hmm.model_ids):
        e = int(comp.model_nstates[mid]) - 2
        inst_of[qi : qi + e] = k
        qi += e

    model_seq: List[Tuple[int, int, int, float]] = []
    t0 = 0
    cur = int(inst_of[states[0]])
    for t in range(1, T + 1):
        if t == T or int(inst_of[states[t]]) != cur:
            seg_score = float(deltas[t - 1, states[t - 1]]) - (
                float(deltas[t0 - 1, states[t0 - 1]]) if t0 > 0 else 0.0
            )
            model_seq.append((cur, t0, t, seg_score))
            if t < T:
                cur = int(inst_of[states[t]])
                t0 = t
    return Alignment(score=score, states=states, model_seq=model_seq)
