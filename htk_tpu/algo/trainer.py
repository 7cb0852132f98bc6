"""Training orchestration: utterance prep, bucketing, jitted batch steps.

The glue between host data (features + transcriptions) and the device FB
scans — the role HERest.c's main loop plays, reshaped for SPMD: utterances
are bucketed to a small set of (T, Q) pad shapes (so jit traces stay
bounded), batched, and each batch runs one `fb_batch` call. Accumulator
pytrees sum across batches (and across devices via parallel/mesh.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hmmset import CompiledHMMSet
from ..utils.errors import HError, HRError
from ..utils.logmath import LZERO
from .composite import CompositeHMM, build_composite
from .fb import Accumulators, fb_batch, zero_accs


@dataclass
class UttData:
    """One prepared utterance (host arrays, unpadded)."""

    name: str
    feats: np.ndarray  # (T, D) f32
    hmm: CompositeHMM
    feats2: Optional[np.ndarray] = None  # (T, D2) HERest -r second channel


def prepare_utterance(
    comp: CompiledHMMSet, name: str, feats: np.ndarray,
    model_names: Sequence[str], feats2: Optional[np.ndarray] = None
) -> UttData:
    ids = [comp.model_id(m) for m in model_names]
    return UttData(name=name, feats=np.asarray(feats, np.float32),
                   hmm=build_composite(comp, ids),
                   feats2=(None if feats2 is None
                           else np.asarray(feats2, np.float32)))


def _bucket(n: int, base: int = 32) -> int:
    b = base
    while b < n:
        b = b * 2 if b < 512 else b + 256
    return b


def make_batches(
    utts: Sequence[UttData], batch_size: int = 8
) -> List[List[UttData]]:
    """Group utterances into batches of similar padded shape."""
    buckets: Dict[Tuple[int, int], List[UttData]] = {}
    for u in utts:
        key = (_bucket(u.feats.shape[0]), _bucket(u.hmm.n_states, 16))
        buckets.setdefault(key, []).append(u)
    batches = []
    for key in sorted(buckets):
        us = buckets[key]
        for i in range(0, len(us), batch_size):
            batches.append(us[i : i + batch_size])
    return batches


def pad_batch(batch: Sequence[UttData], n_states_phys: int,
              pad_to: Optional[int] = None):
    """Pad a batch to common (B, T, Q) arrays for fb_batch."""
    B = len(batch)
    Bp = pad_to or B
    T = _bucket(max(u.feats.shape[0] for u in batch))
    Q = _bucket(max(u.hmm.n_states for u in batch), 16)
    D = batch[0].feats.shape[1]

    feats = np.zeros((Bp, T, D), np.float32)
    t_real = np.zeros(Bp, np.int32)
    comp_state = np.full((Bp, Q), n_states_phys, np.int32)  # trash state id
    q_mask = np.zeros((Bp, Q), bool)
    logA = np.full((Bp, Q, Q), LZERO, np.float32)
    a0 = np.full((Bp, Q), LZERO, np.float32)
    aE = np.full((Bp, Q), LZERO, np.float32)
    tr_seg = np.full((Bp, Q, Q), -1, np.int32)
    entry_seg = np.full((Bp, Q), -1, np.int32)
    exit_seg = np.full((Bp, Q), -1, np.int32)

    feats2 = None
    if any(u.feats2 is not None for u in batch):
        D2 = next(u.feats2.shape[1] for u in batch if u.feats2 is not None)
        feats2 = np.zeros((Bp, T, D2), np.float32)

    for b, u in enumerate(batch):
        t = u.feats.shape[0]
        q = u.hmm.n_states
        feats[b, :t] = u.feats
        if feats2 is not None:
            feats2[b, :t] = u.feats2
        t_real[b] = t
        comp_state[b, :q] = np.minimum(u.hmm.comp_state, n_states_phys)
        q_mask[b, :q] = True
        logA[b, :q, :q] = u.hmm.logA
        a0[b, :q] = u.hmm.a0
        aE[b, :q] = u.hmm.aE
        tr_seg[b, :q, :q] = u.hmm.tr_seg
        entry_seg[b, :q] = u.hmm.entry_seg
        exit_seg[b, :q] = u.hmm.exit_seg
    out = dict(
        feats=feats, t_real=t_real, comp_state=comp_state, q_mask=q_mask,
        logA=logA, a0=a0, aE=aE, tr_seg=tr_seg, entry_seg=entry_seg,
        exit_seg=exit_seg,
    )
    if feats2 is not None:
        out["feats2"] = feats2
    return out


@dataclass
class UttIds:
    """Lightweight utterance for the device-composite path."""

    name: str
    feats: np.ndarray  # (T, D) f32
    ids: np.ndarray  # (K,) int32 model ids


def prepare_utterance_ids(comp, name, feats, model_names) -> UttIds:
    ids = np.asarray([comp.model_id(m) for m in model_names], np.int32)
    return UttIds(name=name, feats=np.asarray(feats, np.float32), ids=ids)


class Trainer:
    """Runs embedded-reestimation accumulation over a corpus."""

    def __init__(self, comp: CompiledHMMSet, precision: str = "highest",
                 retrain_dim: Optional[int] = None,
                 prune: Optional[Tuple[float, float, float]] = None):
        if getattr(comp, "full_cov", False):
            HError(7060, "Trainer: full-covariance sets are decode/align-"
                         "only — train with DIAGC models")
        self.comp = comp
        self.precision = precision
        # HERest -t f [i l]: beta-beam pruning with retry escalation —
        # an utterance whose pruned FB finds no path re-runs with the
        # beam widened by `inc` up to `lim` (HFB.c pruneSetting). The
        # beam rides the jitted step as a traced operand, so escalation
        # never recompiles.
        self.prune = prune
        # HERest -r: moment accumulators take the second channel's width
        self.acc_dim = retrain_dim if retrain_dim is not None else comp.dim
        self.tr_flat = int(np.prod(comp.log_transp.shape))
        # physical state table gets one trash row appended for padding
        self.state_mix_pad = np.concatenate(
            [comp.state_mix, np.full((1, comp.max_mix), -1, np.int32)], axis=0
        )
        self.state_logw_pad = np.concatenate(
            [comp.state_logw, np.full((1, comp.max_mix), LZERO, np.float32)],
            axis=0,
        )
        sw = (comp.state_sw if comp.state_sw is not None
              else np.ones_like(comp.state_logw))
        self.state_sw_pad = np.concatenate(
            [sw, np.ones((1, comp.max_mix), np.float32)], axis=0
        )
        self._step_cache = None

    def _step_fn(self):
        # cached: a fresh closure per call would defeat jax's jit cache and
        # recompile on every corpus pass
        if self._step_cache is not None:
            return self._step_cache
        self._step_cache = self._make_step_fn()
        return self._step_cache

    def _make_step_fn(self):
        import functools

        pruned = self.prune is not None

        @functools.partial(jax.jit, static_argnames=())
        def step(params, batch, beam=None):
            means, variances, gconsts, state_mix, state_logw, state_sw = params
            return fb_batch(
                batch["feats"], batch["t_real"], batch["comp_state"],
                batch["q_mask"], batch["logA"], batch["a0"], batch["aE"],
                batch["tr_seg"], batch["entry_seg"], batch["exit_seg"],
                feats2=batch.get("feats2"),
                means=means, variances=variances, gconsts=gconsts,
                state_mix=state_mix, state_logw=state_logw,
                state_sw=state_sw, slot_blocks=tuple(self.comp.slot_blocks)
                or None,
                n_states=self.comp.n_states, tr_flat=self.tr_flat,
                precision=self.precision,
                beam=beam if pruned else None,
            )

        return step

    def params(self):
        c = self.comp
        return (
            jnp.asarray(c.means), jnp.asarray(c.variances),
            jnp.asarray(c.gconsts), jnp.asarray(self.state_mix_pad),
            jnp.asarray(self.state_logw_pad), jnp.asarray(self.state_sw_pad),
        )

    def _run_pass(self, utts, batch_size, step, params, total, beam):
        """One pass over `utts`; returns (total, [(utt, logP)])."""
        c = self.comp
        pending = []
        for batch in make_batches(utts, batch_size):
            arrs = pad_batch(batch, c.n_states)
            jb = {k: jnp.asarray(v) for k, v in arrs.items()}
            if beam is None:
                logps, accs = step(params, jb)
            else:
                logps, accs = step(params, jb, jnp.float32(beam))
            total = jax.tree.map(lambda a, b: a + b, total, accs)
            pending.append((batch, logps))
        flat = []
        for batch, logps in pending:
            lp = np.asarray(logps)
            flat.extend(zip(batch, lp[: len(batch)]))
        return total, flat

    def accumulate(self, utts: Sequence[UttData], batch_size: int = 8,
                   trace: int = 0):
        """One full pass over the corpus; returns summed Accumulators.

        With pruning enabled, failed utterances (no surviving path)
        contribute zero accumulators on the first pass and re-run with
        the beam escalated by `inc` up to `lim` before being skipped —
        the HERest -t f i l retry ladder.
        """
        c = self.comp
        total = zero_accs(c.n_mix, self.acc_dim, c.n_states, c.max_mix,
                          self.tr_flat)
        step = self._step_fn()
        params = self.params()
        # keep dispatch asynchronous: collect per-batch logP device arrays
        # and only materialise them at the end, so host-side padding of the
        # next batch overlaps the device scans of the current one
        beam = self.prune[0] if self.prune else None
        total, results = self._run_pass(utts, batch_size, step, params,
                                        total, beam)
        failed = []
        for u, l in results:
            if l <= LZERO / 2:
                failed.append(u)
            elif trace >= 2:
                print(f"  {u.name}: logP={l:.2f} "
                      f"({l / u.feats.shape[0]:.3f}/frame)")
        if self.prune is not None and failed:
            _f, inc, lim = self.prune
            while failed and inc > 0 and beam + inc <= lim + 1e-6:
                beam += inc
                if trace:
                    print(f"accumulate: retrying {len(failed)} utterance(s)"
                          f" at beam {beam:.1f}")
                total, results = self._run_pass(failed, batch_size, step,
                                                params, total, beam)
                failed = [u for u, l in results if l <= LZERO / 2]
        for u in failed:
            HRError(7323, "accumulate: no path through utterance %s", u.name)
        if failed:
            HRError(7324, "accumulate: %d utterance(s) skipped", len(failed))
        return total


class DeviceCompositeTrainer(Trainer):
    """Trainer that assembles composite HMMs on device (composite_device).

    Per-utterance host work and transfer shrink to the feature matrix plus
    a model-id vector; at corpus scale this removes the transfer
    bottleneck of the padded (Q, Q) planes (~15x less data shipped).
    """

    def __init__(self, comp: CompiledHMMSet, precision: str = "highest",
                 prune: Optional[Tuple[float, float, float]] = None):
        super().__init__(comp, precision=precision, prune=prune)
        from .composite_device import make_assembler

        self._assembler = make_assembler(comp)

    def _make_step_fn(self):
        import functools

        assembler = self._assembler

        pruned = self.prune is not None

        @jax.jit
        def step(params, feats, t_real, ids, beam=None):
            means, variances, gconsts, state_mix, state_logw, state_sw = params
            arrs = assembler(ids)
            return fb_batch(
                feats, t_real, arrs["comp_state"], arrs["q_mask"],
                arrs["logA"], arrs["a0"], arrs["aE"], arrs["tr_seg"],
                arrs["entry_seg"], arrs["exit_seg"],
                means=means, variances=variances, gconsts=gconsts,
                state_mix=state_mix, state_logw=state_logw,
                state_sw=state_sw,
                slot_blocks=tuple(self.comp.slot_blocks) or None,
                n_states=self.comp.n_states, tr_flat=self.tr_flat,
                precision=self.precision,
                beam=beam if pruned else None,
            )

        return step

    def _run_pass(self, utts, batch_size, step, params, total, beam):
        c = self.comp
        # bucket by (T, K) pads
        buckets: Dict[Tuple[int, int], List[UttIds]] = {}
        for u in utts:
            key = (_bucket(u.feats.shape[0]), _bucket(len(u.ids), 8))
            buckets.setdefault(key, []).append(u)
        pending = []
        for (Tp, Kp) in sorted(buckets):
            us = buckets[(Tp, Kp)]
            for i in range(0, len(us), batch_size):
                batch = us[i : i + batch_size]
                B = len(batch)
                feats = np.zeros((B, Tp, c.dim), np.float32)
                t_real = np.zeros(B, np.int32)
                ids = np.full((B, Kp), -1, np.int32)
                for b, u in enumerate(batch):
                    feats[b, : u.feats.shape[0]] = u.feats
                    t_real[b] = u.feats.shape[0]
                    ids[b, : len(u.ids)] = u.ids
                sargs = (params, jnp.asarray(feats), jnp.asarray(t_real),
                         jnp.asarray(ids))
                if beam is None:
                    logps, accs = step(*sargs)
                else:
                    logps, accs = step(*sargs, jnp.float32(beam))
                total = jax.tree.map(lambda a, b: a + b, total, accs)
                pending.append((batch, logps))
        flat = []
        for batch, logps in pending:
            lp = np.asarray(logps)
            flat.extend(zip(batch, lp[: len(batch)]))
        return total, flat

    def accumulate(self, utts: Sequence[UttIds], batch_size: int = 8,
                   trace: int = 0):
        c = self.comp
        total = zero_accs(c.n_mix, self.acc_dim, c.n_states, c.max_mix,
                          self.tr_flat)
        step = self._step_fn()
        params = self.params()
        beam = self.prune[0] if self.prune else None
        total, results = self._run_pass(utts, batch_size, step, params,
                                        total, beam)
        failed = []
        for u, l in results:
            if l <= LZERO / 2:
                failed.append(u)
            elif trace >= 2:
                print(f"  {u.name}: logP={l:.2f}")
        if self.prune is not None and failed:
            _f, inc, lim = self.prune
            while failed and inc > 0 and beam + inc <= lim + 1e-6:
                beam += inc
                if trace:
                    print(f"accumulate: retrying {len(failed)} utterance(s)"
                          f" at beam {beam:.1f}")
                total, results = self._run_pass(failed, batch_size, step,
                                                params, total, beam)
                failed = [u for u, l in results if l <= LZERO / 2]
        for u in failed:
            HRError(7323, "accumulate: no path through %s", u.name)
        if failed:
            HRError(7324, "accumulate: %d utterance(s) skipped", len(failed))
        return total
