"""Decode-network compilation (the HNet role, TPU-shaped).

Mirrors `HTKLib/HNet.c : ExpandWordNet()`: a word lattice (SLF) + dict +
HMMSet compile into the recognition network. Instead of linked HMM
instances for token passing, the output is dense arrays for the decode
scan (algo/decode.py):

  - every (word-node, pronunciation) expands to a *chain*: its phone
    models abutted with algo.composite (so tee models and skips inside
    words are exact);
  - all chains stack into one state vector; within-chain transitions
    become a banded matrix B[k, s] = logA[s-k, s] (band width = max skip
    distance), so the per-frame inner update is K shifted adds on the VPU
    instead of a sparse gather;
  - !NULL lattice nodes are epsilon-closed on host into a dense
    word-node -> word-node log-prob matrix (max-plus closure), so the
    cross-word step is one dense max-plus matvec per frame.

Cross-word context expansion (triphone decode) is done by the caller
mapping word phones to context-dependent model names before expansion
(word-internal contexts); full cross-word triphone expansion is a later
round. [LC]
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io.dictionary import Vocab
from ..io.slf import Lattice, NULL_WORD
from ..models.hmmset import CompiledHMMSet
from ..utils.errors import HError
from .composite import build_composite

LZERO = -1.0e10
LSMALL = -0.5e10


@dataclass
class DecodeNetwork:
    """Dense decode structure consumed by algo/decode.py."""

    # states
    comp_state: np.ndarray  # (Ns,) physical state id per network state
    band: np.ndarray  # (K, Ns) banded within-chain log transitions
    a0: np.ndarray  # (Ns,) chain-entry log prob per state
    aE: np.ndarray  # (Ns,) chain-exit log prob per state
    chain_of: np.ndarray  # (Ns,) chain index
    # chains
    node_of_chain: np.ndarray  # (C,) word-node index
    chain_pron_prob: np.ndarray  # (C,) log pron prob
    # word nodes (non-NULL)
    node_words: List[str]  # (Nn,) word per node
    node_out: List[Optional[str]]  # output symbol (None = word; '' = silent)
    trans: np.ndarray  # (Nn, Nn) closed log LM transition matrix
    start_entry: np.ndarray  # (Nn,) log prob of entering node from start
    end_exit: np.ndarray  # (Nn,) log prob node -> lattice end
    n_states: int = 0
    n_chains: int = 0
    n_nodes: int = 0


def _maxplus_closure(null_arcs: np.ndarray) -> np.ndarray:
    """All-pairs max-plus closure over NULL nodes (tiny, host-side)."""
    n = null_arcs.shape[0]
    C = null_arcs.copy()
    for k in range(n):
        C = np.maximum(C, C[:, k : k + 1] + C[k : k + 1, :])
    return C


def word_internal_phone_map(model_names):
    """Pronunciation phones -> word-internal context-dependent names.

    The word-internal slice of HNet.c's context expansion: inside a word,
    p_i maps to p_{i-1}-p_i+p_{i+1} (biphones at word edges), falling back
    to less specific names (biphone, then monophone) when the model set
    lacks the full context — HNet's FindModel search order.
    """
    names = set(model_names)

    def best(left, p, right):
        cands = []
        if left and right:
            cands.append(f"{left}-{p}+{right}")
        if right:
            cands.append(f"{p}+{right}")
        if left:
            cands.append(f"{left}-{p}")
        cands.append(p)
        for c in cands:
            if c in names:
                return c
        return p

    def fn(phones):
        out = []
        n = len(phones)
        for i, p in enumerate(phones):
            left = phones[i - 1] if i > 0 else None
            right = phones[i + 1] if i < n - 1 else None
            out.append(best(left, p, right))
        return out

    return fn


def compile_network(
    lat: Lattice,
    vocab: Vocab,
    comp: CompiledHMMSet,
    phone_map=None,
) -> DecodeNetwork:
    """Expand a word lattice into the dense decode network.

    `phone_map(phones: List[str]) -> List[str]` optionally rewrites a
    pronunciation's phone names (e.g. to word-internal triphones).
    """
    id_of = {n.id: k for k, n in enumerate(lat.nodes)}
    words = []
    for n in lat.nodes:
        w = n.word
        words.append(None if (w is None or w == NULL_WORD) else w)
    n_all = len(lat.nodes)
    start = id_of[lat.start_node()]
    end = id_of[lat.end_node()]

    is_word = [w is not None for w in words]
    word_nodes = [k for k in range(n_all) if is_word[k]]
    widx = {k: i for i, k in enumerate(word_nodes)}
    Nn = len(word_nodes)
    if Nn == 0:
        HError(8620, "compile_network: lattice has no word nodes")

    # arc matrix over ALL nodes, then epsilon-close through non-word nodes
    A = np.full((n_all, n_all), LZERO)
    for a in lat.arcs:
        s, e = id_of[a.start], id_of[a.end]
        A[s, e] = max(A[s, e], a.lmlike)
    # closure: paths through non-word nodes only
    # C[i,j] = best score i->j using only null intermediates
    C = A.copy()
    for k in range(n_all):
        if is_word[k]:
            continue
        C = np.maximum(C, C[:, k : k + 1] + C[k : k + 1, :])

    trans = np.full((Nn, Nn), LZERO)
    for i in word_nodes:
        for j in word_nodes:
            if C[i, j] > LSMALL:
                trans[widx[i], widx[j]] = C[i, j]
    start_entry = np.full(Nn, LZERO)
    end_exit = np.full(Nn, LZERO)
    for j in word_nodes:
        if j == start:
            start_entry[widx[j]] = 0.0
        elif C[start, j] > LSMALL:
            start_entry[widx[j]] = C[start, j]
        if j == end:
            end_exit[widx[j]] = 0.0
        elif C[j, end] > LSMALL:
            end_exit[widx[j]] = C[j, end]

    # expand chains
    comp_state: List[np.ndarray] = []
    a0: List[np.ndarray] = []
    aE: List[np.ndarray] = []
    chain_of: List[np.ndarray] = []
    node_of_chain: List[int] = []
    chain_pron_prob: List[float] = []
    chain_logA: List[np.ndarray] = []
    node_words: List[str] = []
    node_out: List[Optional[str]] = []

    c_idx = 0
    for i in word_nodes:
        w = words[i]
        wd = vocab.get(w)
        if wd is None:
            HError(8621, "compile_network: word %s not in dictionary", w)
        node_words.append(w)
        node_out.append(wd.prons[0].out_sym)
        for p in wd.prons:
            phones = phone_map(p.phones) if phone_map else p.phones
            try:
                ids = [comp.model_id(ph) for ph in phones]
            except Exception:
                HError(8622, "compile_network: missing model for %s (%s)",
                       w, " ".join(phones))
            ch = build_composite(comp, ids)
            comp_state.append(ch.comp_state)
            a0.append(ch.a0)
            aE.append(ch.aE)
            chain_logA.append(ch.logA)
            chain_of.append(np.full(ch.n_states, c_idx, np.int32))
            node_of_chain.append(widx[i])
            chain_pron_prob.append(float(np.log(max(p.prob, 1e-30))))
            c_idx += 1

    Ns = int(sum(len(s) for s in comp_state))
    C_n = c_idx
    # band width
    K = 1
    for la in chain_logA:
        q = la.shape[0]
        for ii in range(q):
            for jj in range(q):
                if la[ii, jj] > LSMALL and jj >= ii:
                    K = max(K, jj - ii + 1)
                elif la[ii, jj] > LSMALL and jj < ii:
                    K = max(K, 1)  # backward transitions handled below

    # check for backward transitions (rare: ergodic models) — unsupported
    for la in chain_logA:
        q = la.shape[0]
        for ii in range(q):
            for jj in range(q):
                if jj < ii and la[ii, jj] > LSMALL:
                    HError(8623, "compile_network: backward within-word "
                                 "transitions not supported in decode")

    band = np.full((K, Ns), LZERO, np.float32)
    off = 0
    for la in chain_logA:
        q = la.shape[0]
        for jj in range(q):
            for k in range(K):
                ii = jj - k
                if 0 <= ii < q and la[ii, jj] > LSMALL:
                    band[k, off + jj] = la[ii, jj]
        off += q

    return DecodeNetwork(
        comp_state=np.concatenate(comp_state).astype(np.int32),
        band=band,
        a0=np.concatenate(a0).astype(np.float32),
        aE=np.concatenate(aE).astype(np.float32),
        chain_of=np.concatenate(chain_of).astype(np.int32),
        node_of_chain=np.asarray(node_of_chain, np.int32),
        chain_pron_prob=np.asarray(chain_pron_prob, np.float32),
        node_words=node_words,
        node_out=node_out,
        trans=trans.astype(np.float32),
        start_entry=start_entry.astype(np.float32),
        end_exit=end_exit.astype(np.float32),
        n_states=Ns,
        n_chains=C_n,
        n_nodes=Nn,
    )
