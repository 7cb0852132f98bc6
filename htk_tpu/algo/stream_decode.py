"""Streaming token-passing decode (HVite live mode / HRec frame API).

`HTKLib/HRec.c` is inherently streaming: StartRecognition() then one
ProcessObservation() per frame as HParm's live buffer produces it, then
CompleteRecognition(). The batch decoder in algo/decode.py runs the
same recursion as one lax.scan over the whole utterance; this module
re-cuts it for live input: the scan carry (score vector + word-link
record planes) persists across *chunks* of frames, so the device work
is still a compiled scan — just launched once per chunk instead of once
per utterance — and the per-frame word-end record planes stream back to
the host incrementally.

A chunk is F frames (default 32, ~0.3 s of audio): small enough for
sub-second latency, large enough that the scan amortises launch
overhead. Short final chunks are padded and masked (invalid frames pass
the carry through untouched), so ONE compiled program serves the whole
stream. Chunked output is bit-identical to the batch decoder on the
same frames (tested) because every frame executes the same update in
the same order.

partial_result() gives HTK's live-mode partial traceback: the best
word sequence ending at the latest processed frame.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hmmset import CompiledHMMSet
from ..utils.errors import HError
from ..utils.logmath import LZERO, LSMALL
from .decode import (DecodeResult, _final_records, _finalize, _net_dev,
                     _net_outp, _shift_down)
from .net import DecodeNetwork


def _chunk_step_fn(band, a0, aE, node_of_state, entry_bonus, trans,
                   start_entry, word_pen, n_nodes):
    """decode_scan's step, with a validity flag for padded frames."""
    K = band.shape[0]
    Nn = n_nodes
    node_mask = (node_of_state[None, :]
                 == jnp.arange(Nn, dtype=jnp.int32)[:, None])
    neg = jnp.asarray(LZERO, band.dtype)

    def step(carry, inp):
        v, wn, wt = carry
        outp_t, t, is_valid = inp

        e_state = v + aE
        masked = jnp.where(node_mask, e_state[None, :], neg)
        WE = jnp.max(masked, axis=1)
        best_sid = jnp.argmax(masked, axis=1)
        ok = WE > LSMALL
        pwn = jnp.where(ok, wn[best_sid], -1)
        pwt = jnp.where(ok, wt[best_sid], -1)

        cand = WE[:, None] + trans
        entry_n = jnp.max(cand, axis=0) + word_pen
        an = jnp.argmax(cand, axis=0).astype(jnp.int32)
        entry_n = jnp.where(t == 0, start_entry, entry_n)
        an = jnp.where(t == 0, -1, an)

        entry_s = entry_n[node_of_state] + a0 + entry_bonus

        cands = jnp.stack(
            [_shift_down(v, k, LZERO) + band[k] for k in range(K)], axis=0)
        within = jnp.max(cands, axis=0)
        argk = jnp.argmax(cands, axis=0).astype(jnp.int32)
        wwn = jnp.full_like(wn, -1)
        wwt = jnp.full_like(wt, -1)
        for k in range(K):
            sel = argk == k
            wwn = jnp.where(sel, _shift_down(wn, k, -1), wwn)
            wwt = jnp.where(sel, _shift_down(wt, k, -1), wwt)

        use_entry = entry_s > within
        new_v = jnp.maximum(within, entry_s) + outp_t
        new_wn = jnp.where(use_entry, an[node_of_state], wwn)
        new_wt = jnp.where(use_entry, t - 1, wwt)
        dead = new_v <= LSMALL
        new_wn = jnp.where(dead, -1, new_wn)
        new_wt = jnp.where(dead, -1, new_wt)

        # padded frames: carry passes through, outputs are empty records
        new_v = jnp.where(is_valid, new_v, v)
        new_wn = jnp.where(is_valid, new_wn, wn)
        new_wt = jnp.where(is_valid, new_wt, wt)
        WE = jnp.where(is_valid, WE, neg)
        pwn = jnp.where(is_valid, pwn, -1)
        pwt = jnp.where(is_valid, pwt, -1)
        return (new_v, new_wn, new_wt), (WE, pwn, pwt)

    return step


class StreamingDecoder:
    """Incremental Viterbi over a compiled word network.

    feed(feats) accepts any number of frames; flush() finalises and
    returns the DecodeResult (None if no complete path). The carry
    lives on device between chunks; only the (F, Nn) record planes
    come back per chunk.
    """

    def __init__(self, net: DecodeNetwork, comp: Optional[CompiledHMMSet],
                 lm_scale: float = 1.0, word_pen: float = 0.0,
                 chunk: int = 32, precision: str = "highest",
                 state_mode: bool = False):
        """state_mode: feed() receives per-frame PHYSICAL-state scores
        (e.g. streaming ANN log posterior/prior — the hybrid hook)
        instead of feature frames."""
        if net.uniform_width:
            HError(8521, "StreamingDecoder: live mode targets HVite "
                         "networks (HDecode's LV path is batch two-pass)")
        self.state_mode = bool(state_mode)
        self.net = net
        self.comp = comp
        self.lm_scale = float(lm_scale)
        self.word_pen = float(word_pen)
        self.chunk = int(chunk)
        self.precision = precision

        d = _net_dev(net)
        key = ("stream", self.chunk, self.lm_scale, self.word_pen)
        fn = d["jits"].get(key)
        if fn is None:
            step = _chunk_step_fn(
                d["band"], d["a0"], d["aE"], d["node_of_state"],
                d["entry_bonus"], d["trans"] * self.lm_scale,
                d["start"] * self.lm_scale, self.word_pen, net.n_nodes)

            @jax.jit
            def run_chunk(carry, outp_chunk, t0, n_valid):
                F = outp_chunk.shape[0]
                ts = t0 + jnp.arange(F)
                valid = jnp.arange(F) < n_valid
                return jax.lax.scan(step, carry,
                                    (outp_chunk, ts, valid))

            fn = run_chunk
            d["jits"][key] = fn
        self._run = fn

        Ns = len(net.comp_state)
        self._carry = (
            jnp.full((Ns,), LZERO, jnp.float32),
            jnp.full((Ns,), -1, jnp.int32),
            jnp.full((Ns,), -1, jnp.int32),
        )
        self._buf: Optional[np.ndarray] = None  # pending feature frames
        self._t = 0  # frames fully processed
        self._WEs: List[np.ndarray] = []
        self._pwns: List[np.ndarray] = []
        self._pwts: List[np.ndarray] = []
        self._done = False

    # -- internals -------------------------------------------------------

    def _outp(self, feats: np.ndarray) -> jnp.ndarray:
        if self.state_mode:
            d = _net_dev(self.net)
            return jnp.asarray(feats, jnp.float32)[:, d["comp_state"]]
        return _net_outp(self.net, self.comp, feats, self.precision)

    def _process(self, feats: np.ndarray, n_valid: int) -> None:
        outp = self._outp(feats)
        self._carry, (WE, pwn, pwt) = self._run(
            self._carry, outp, jnp.asarray(self._t),
            jnp.asarray(n_valid))
        self._WEs.append(np.asarray(WE[:n_valid]))
        self._pwns.append(np.asarray(pwn[:n_valid]))
        self._pwts.append(np.asarray(pwt[:n_valid]))
        self._t += n_valid

    # -- public API ------------------------------------------------------

    def feed(self, feats: np.ndarray) -> None:
        if self._done:
            HError(8522, "StreamingDecoder: feed() after flush()")
        feats = np.asarray(feats, np.float32)
        if feats.size == 0:
            return
        self._buf = feats if self._buf is None else \
            np.concatenate([self._buf, feats], axis=0)
        while self._buf.shape[0] >= self.chunk:
            self._process(self._buf[: self.chunk], self.chunk)
            self._buf = self._buf[self.chunk:]

    def _records(self):
        WEs = (np.concatenate(self._WEs, axis=0) if self._WEs
               else np.zeros((0, self.net.n_nodes), np.float32))
        pwns = (np.concatenate(self._pwns, axis=0) if self._pwns
                else np.zeros((0, self.net.n_nodes), np.int32))
        pwts = (np.concatenate(self._pwts, axis=0) if self._pwts
                else np.zeros((0, self.net.n_nodes), np.int32))
        return WEs, pwns, pwts

    def partial_result(self) -> Optional[DecodeResult]:
        """Best word sequence ending at the latest processed frame
        (HTK live mode's partial traceback). Pending buffered frames
        (< one chunk) are not included."""
        if self._t == 0:
            return None
        WE_fin, pwn_fin, pwt_fin = _final_records(self.net, *self._carry)
        WEs, pwns, pwts = self._records()
        return _finalize(self.net, WEs, pwns, pwts, WE_fin, pwn_fin,
                         pwt_fin, self._t, self.lm_scale)

    def flush(self) -> Optional[DecodeResult]:
        if self._done:
            HError(8522, "StreamingDecoder: flush() twice")
        self._done = True
        if self._buf is not None and self._buf.shape[0] > 0:
            n = self._buf.shape[0]
            pad = np.zeros((self.chunk, self._buf.shape[1]), np.float32)
            pad[:n] = self._buf
            self._process(pad, n)
            self._buf = None
        if self._t == 0:
            return None
        WE_fin, pwn_fin, pwt_fin = _final_records(self.net, *self._carry)
        WEs, pwns, pwts = self._records()
        return _finalize(self.net, WEs, pwns, pwts, WE_fin, pwn_fin,
                         pwt_fin, self._t, self.lm_scale)

    @property
    def frames_processed(self) -> int:
        return self._t
