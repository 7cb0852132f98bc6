"""Struct-of-arrays compilation of an HMMSet for device compute.

The TPU-native replacement for HTK's pointer-linked model structures
(`HTKLib/HModel.c` HMMSet/HLink/StateInfo/MixPDF): all Gaussians live in
one (M, D) block, all states in index tables, so GMM log-likelihoods for
*all* states x *all* frames evaluate as one MXU matmul (ops/outp.py)
instead of HModel.c OutP's per-state scalar loops.

Macro tying (shared ~s/~m/~t structures) is preserved exactly: Python
object identity in the parsed MMF becomes shared row indices here, so a
tied state is one row of `state_mix` referenced by many models and
accumulator updates to it sum contributions from every sharer — the same
semantics as HTK's shared-pointer accumulators.

Only single-stream DIAGC sets are compiled for device use in this round
(the north-star configs); multi-stream and full-covariance sets still
load/save via io.mmf.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.mmf import HMMSet, HMMDef, MixPDF, StateInfo
from ..utils.errors import HError
from ..utils.logmath import LZERO

MINMIX = 1e-5


@dataclass
class CompiledHMMSet:
    """Device-ready arrays for a single-stream diagonal-covariance HMMSet."""

    # Gaussian block (M physical mixture components)
    means: np.ndarray  # (M, D) f32
    variances: np.ndarray  # (M, D) f32
    gconsts: np.ndarray  # (M,) f32
    # State block (S physical emitting states)
    state_mix: np.ndarray  # (S, maxmix) int32 index into Gaussian block
    state_logw: np.ndarray  # (S, maxmix) f32 log mixture weights (LZERO pad)
    # Transition block (Tn physical transition matrices)
    log_transp: np.ndarray  # (Tn, Nmax, Nmax) f32 log probs (LZERO pad)
    # Model block (H logical HMMs)
    model_nstates: np.ndarray  # (H,) int32 total states incl. entry/exit
    model_states: np.ndarray  # (H, Nmax-2) int32 physical state ids (-1 pad)
    model_transp: np.ndarray  # (H,) int32 index into transition block
    names: List[str] = field(default_factory=list)
    name_to_id: Dict[str, int] = field(default_factory=dict)

    # back-references for writing updates into the parsed MMF
    _mix_objs: List[MixPDF] = field(default_factory=list)
    _state_objs: List[StateInfo] = field(default_factory=list)
    _transp_objs: List[np.ndarray] = field(default_factory=list)
    _hset: Optional[HMMSet] = None

    @property
    def n_mix(self) -> int:
        return self.means.shape[0]

    @property
    def dim(self) -> int:
        return self.means.shape[1]

    @property
    def n_states(self) -> int:
        return self.state_mix.shape[0]

    @property
    def max_mix(self) -> int:
        return self.state_mix.shape[1]

    @property
    def n_models(self) -> int:
        return len(self.names)

    @property
    def nmax(self) -> int:
        return self.log_transp.shape[1]

    def model_id(self, name: str) -> int:
        i = self.name_to_id.get(name)
        if i is None:
            HError(7035, "CompiledHMMSet: no HMM named %s", name)
        return i


def compile_hmmset(hset: HMMSet) -> CompiledHMMSet:
    """Flatten a parsed HMMSet into SoA arrays (identity-based tying)."""
    if len(hset.swidth) != 1:
        HError(7060, "compile_hmmset: only single-stream sets supported on device")

    mix_ids: Dict[int, int] = {}
    mixes: List[MixPDF] = []
    state_ids: Dict[int, int] = {}
    states: List[StateInfo] = []
    transp_ids: Dict[int, int] = {}
    transps: List[np.ndarray] = []

    names = list(hset.hmms.keys())
    nmax = max(h.nstates for h in hset.hmms.values())

    for h in hset.hmms.values():
        for si in h.states:
            if id(si) not in state_ids:
                state_ids[id(si)] = len(states)
                states.append(si)
                for mp in si.streams[0].mixes:
                    if mp is not None and id(mp) not in mix_ids:
                        if mp.cov_kind != "DIAGC":
                            HError(
                                7060,
                                "compile_hmmset: covariance kind %s not device-supported",
                                mp.cov_kind,
                            )
                        mix_ids[id(mp)] = len(mixes)
                        mixes.append(mp)
        if id(h.transp) not in transp_ids:
            transp_ids[id(h.transp)] = len(transps)
            transps.append(h.transp)

    M = len(mixes)
    S = len(states)
    D = hset.vec_size or len(mixes[0].mean)
    maxmix = max(
        sum(1 for w, m in zip(si.streams[0].weights, si.streams[0].mixes)
            if m is not None and w >= MINMIX)
        for si in states
    )
    maxmix = max(maxmix, 1)

    means = np.zeros((M, D), np.float32)
    variances = np.ones((M, D), np.float32)
    gconsts = np.zeros((M,), np.float32)
    for i, mp in enumerate(mixes):
        means[i] = mp.mean
        variances[i] = mp.var
        if mp.gconst is None:
            mp.fix_gconst()
        gconsts[i] = mp.gconst

    state_mix = np.full((S, maxmix), -1, np.int32)
    state_logw = np.full((S, maxmix), LZERO, np.float32)
    for si_idx, si in enumerate(states):
        j = 0
        for w, mp in zip(si.streams[0].weights, si.streams[0].mixes):
            if mp is None or w < MINMIX:
                continue
            state_mix[si_idx, j] = mix_ids[id(mp)]
            state_logw[si_idx, j] = np.log(w)
            j += 1

    Tn = len(transps)
    log_transp = np.full((Tn, nmax, nmax), LZERO, np.float32)
    for i, tp in enumerate(transps):
        n = tp.shape[0]
        with np.errstate(divide="ignore"):
            lt = np.where(tp > 0, np.log(np.maximum(tp, 1e-38)), LZERO)
        log_transp[i, :n, :n] = lt

    H = len(names)
    model_nstates = np.zeros((H,), np.int32)
    model_states = np.full((H, nmax - 2), -1, np.int32)
    model_transp = np.zeros((H,), np.int32)
    for hi, name in enumerate(names):
        h = hset.hmms[name]
        model_nstates[hi] = h.nstates
        for k, si in enumerate(h.states):
            model_states[hi, k] = state_ids[id(si)]
        model_transp[hi] = transp_ids[id(h.transp)]

    return CompiledHMMSet(
        means=means,
        variances=variances,
        gconsts=gconsts,
        state_mix=state_mix,
        state_logw=state_logw,
        log_transp=log_transp,
        model_nstates=model_nstates,
        model_states=model_states,
        model_transp=model_transp,
        names=names,
        name_to_id={n: i for i, n in enumerate(names)},
        _mix_objs=mixes,
        _state_objs=states,
        _transp_objs=transps,
        _hset=hset,
    )


def write_back(
    comp: CompiledHMMSet,
    means: Optional[np.ndarray] = None,
    variances: Optional[np.ndarray] = None,
    weights: Optional[np.ndarray] = None,
    transps: Optional[np.ndarray] = None,
) -> HMMSet:
    """Write updated SoA parameters back into the parsed HMMSet objects.

    `weights` is (S, maxmix) linear weights; `transps` is (Tn, Nmax, Nmax)
    linear probabilities. Shared objects are updated once (they are the
    same Python objects everywhere they are tied). Returns the HMMSet for
    saving via io.mmf.save_mmf.
    """
    if means is not None or variances is not None:
        for i, mp in enumerate(comp._mix_objs):
            if means is not None:
                mp.mean = np.asarray(means[i], np.float32).copy()
            if variances is not None:
                mp.var = np.asarray(variances[i], np.float32).copy()
            mp.fix_gconst()
        if means is not None:
            comp.means = np.asarray(means, np.float32)
        if variances is not None:
            comp.variances = np.asarray(variances, np.float32)
        comp.gconsts = np.array([m.gconst for m in comp._mix_objs], np.float32)
    if weights is not None:
        for si_idx, si in enumerate(comp._state_objs):
            se = si.streams[0]
            j = 0
            for k, (w, mp) in enumerate(zip(se.weights, se.mixes)):
                if mp is None or w < MINMIX:
                    continue
                se.weights[k] = float(weights[si_idx, j])
                j += 1
        with np.errstate(divide="ignore"):
            comp.state_logw = np.where(
                comp.state_mix >= 0,
                np.log(np.maximum(np.asarray(weights, np.float32), 1e-38)),
                LZERO,
            ).astype(np.float32)
    if transps is not None:
        for i, tp in enumerate(comp._transp_objs):
            n = tp.shape[0]
            tp[:, :] = np.asarray(transps[i, :n, :n], np.float32)
        with np.errstate(divide="ignore"):
            comp.log_transp = np.where(
                transps > 0, np.log(np.maximum(transps, 1e-38)), LZERO
            ).astype(np.float32)
    return comp._hset
