"""HMMIRest — MMI discriminative training (lattice-based EBW).

Mirrors `HTKTools/HMMIRest.c` (SURVEY.md §3.5): numerator (reference) and
denominator (recognition-lattice) occupancies accumulate separately, then
Extended Baum-Welch updates the Gaussians.

TPU-shaped lattice forward-backward (HArc/HFBLat role): every word arc of
the denominator lattice becomes a mini-utterance (its pronunciation's
phone chain over its time span); arcs batch through the same FB scans as
HERest, a host-side DAG forward-backward turns per-arc log-likelihoods
into arc posteriors, and a second weighted FB pass accumulates
gamma-scaled statistics. Exact for HVite-style time-marked lattices.

Deviation from HTK: lattices here are *word* lattices (HVite -z output)
plus a dictionary (-d), instead of HTK's phone-marked lattices; the
phone-level information HTK pre-marks is recovered by per-arc alignment
on the fly. [LC]

Usage: HMMIRest [options] hmmList trainFiles...

  -H mmf   load HMM macro file (repeatable)   -M dir  output directory
  -q dir   numerator lattice dir (else -I MLF transcriptions are used)
  -r dir   denominator lattice dir (required)
  -d dict  dictionary for word->phone expansion
  -I mlf   numerator transcriptions (phone level, as HERest)
  -s f     LM scale for lattice posteriors (default 1.0)
  -u tmvw  update flags (accepted; EBW updates m,v,w)
  Config (HMMIREST module): E (default 2.0), ISMOOTHTAU (default 0),
  MINVAR
  Standard: -A -C -D -S -T -V
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..algo.composite import build_composite
from ..algo.ebw import EBWConfig, ebw_update
from ..algo.fb import zero_accs
from ..algo.latops import arc_posteriors
from ..algo.trainer import Trainer, UttData, pad_batch, prepare_utterance
from ..io.dictionary import read_dict
from ..io.mlf import MLF, find_labels
from ..io.mmf import load_hmm_list, load_mmf, save_mmf
from ..io.slf import NULL_WORD, read_slf
from ..models.hmmset import compile_hmmset, write_back
from ..utils.cli import Option, parse_args, tool_main
from ..utils.errors import HError, HRError
from ._common import (force_platform_from_env, open_speech_file,
                      preload_corpus)

USAGE = "Usage: HMMIRest [options] hmmList trainFiles..."

OPTS = {
    "H": Option("H", 1, "load MMF", repeatable=True),
    "M": Option("M", 1, "output directory"),
    "q": Option("q", 1, "numerator lattice dir"),
    "r": Option("r", 1, "denominator lattice dir"),
    "d": Option("d", 1, "dictionary"),
    "I": Option("I", 1, "numerator MLF", repeatable=True),
    "L": Option("L", 1, "label dir"),
    "X": Option("X", 1, "label ext"),
    "s": Option("s", 1, "LM scale", typ=float),
    "u": Option("u", 1, "update flags"),
}


def lattice_arc_utts(lat, vocab, comp, feats, period, stem):
    """Word arcs -> (utterance list, arc ids) for batched FB."""
    words_of = {n.id: n.word for n in lat.nodes}
    times_of = {n.id: n.time for n in lat.nodes}
    utts = []
    arc_ids = []
    T = feats.shape[0]
    for a in lat.arcs:
        w = a.word if a.word is not None else words_of.get(a.end)
        if not w or w == NULL_WORD:
            continue
        t0 = int(round(times_of[a.start] * 1e7 / period))
        t1 = int(round(times_of[a.end] * 1e7 / period))
        t0 = max(0, min(t0, T - 1))
        t1 = max(t0 + 1, min(t1, T))
        wd = vocab.get(w)
        if wd is None:
            HRError(8621, "HMMIRest: word %s not in dictionary", w)
            continue
        phones = wd.prons[0].phones
        try:
            ids = [comp.model_id(p) for p in phones]
        except Exception:
            continue
        hmm = build_composite(comp, ids)
        if t1 - t0 < hmm.n_states // max(len(phones), 1):
            t1 = min(T, t0 + max(hmm.n_states, 1))
        utts.append(UttData(name=f"{stem}:{a.id}", feats=feats[t0:t1], hmm=hmm))
        arc_ids.append(a.id)
    return utts, arc_ids


def score_arc_utts(utts, comp, trainer):
    """Batched per-arc acoustic log-likelihoods: {utt name: ll}.

    Takes arc mini-utterances from ANY number of lattices (names are
    stem-qualified, so cross-lattice batching is safe) — one length-
    bucketed loglik_batch launch per 16 arcs instead of one per
    lattice-local group."""
    import jax.numpy as jnp
    from ..algo.fb import loglik_batch
    from ..algo.trainer import make_batches

    arc_ll = {}
    params = trainer.params()
    for batch in make_batches(utts, 16):
        # B padded to the full batch width: arc mini-batches are small
        # and ragged, and every distinct B is a fresh compile — padded
        # rows are all-masked and sliced off below
        arrs = pad_batch(batch, comp.n_states, pad_to=16)
        lls = loglik_batch(
            jnp.asarray(arrs["feats"]), jnp.asarray(arrs["t_real"]),
            jnp.asarray(arrs["comp_state"]), jnp.asarray(arrs["q_mask"]),
            jnp.asarray(arrs["logA"]), jnp.asarray(arrs["a0"]),
            jnp.asarray(arrs["aE"]),
            means=params[0], variances=params[1], gconsts=params[2],
            state_mix=params[3], state_logw=params[4],
            state_sw=params[5], slot_blocks=tuple(comp.slot_blocks) or None,
        )
        for u, ll in zip(batch, np.asarray(lls)[: len(batch)]):
            arc_ll[u.name] = float(ll)
    return arc_ll


def score_lattice_arcs(lat, vocab, comp, trainer, feats, period, stem):
    """Pass 1: expand word arcs, rescore acoustics with current models.

    Returns (utts, name_to_arc); arc aclike fields are updated in place.
    """
    utts, arc_ids = lattice_arc_utts(lat, vocab, comp, feats, period, stem)
    if not utts:
        return [], {}
    name_to_arc = dict(zip([u.name for u in utts], arc_ids))
    arc_ll = score_arc_utts(utts, comp, trainer)
    by_id = {name_to_arc[n]: v for n, v in arc_ll.items()}
    for a in lat.arcs:
        if a.id in by_id:
            a.aclike = by_id[a.id]
    return utts, name_to_arc


def accumulate_arcs(utts, name_to_arc, arc_weights, comp, trainer, total):
    """Pass 2: weight-scaled FB accumulation over arc mini-utterances."""
    import jax
    import jax.numpy as jnp
    from ..algo.fb import fb_batch
    from ..algo.trainer import make_batches

    params = trainer.params()
    for batch in make_batches(utts, 16):
        # B padded like score_lattice_arcs: padded rows carry weight 0
        arrs = pad_batch(batch, comp.n_states, pad_to=16)
        weights = np.zeros(arrs["feats"].shape[0], np.float32)
        any_w = False
        for i, u in enumerate(batch):
            w = float(arc_weights.get(name_to_arc[u.name], 0.0))
            weights[i] = w
            any_w = any_w or w > 0
        if not any_w:
            continue
        logps, accs = fb_batch(
            jnp.asarray(arrs["feats"]), jnp.asarray(arrs["t_real"]),
            jnp.asarray(arrs["comp_state"]), jnp.asarray(arrs["q_mask"]),
            jnp.asarray(arrs["logA"]), jnp.asarray(arrs["a0"]),
            jnp.asarray(arrs["aE"]), jnp.asarray(arrs["tr_seg"]),
            jnp.asarray(arrs["entry_seg"]), jnp.asarray(arrs["exit_seg"]),
            jnp.asarray(weights),
            means=params[0], variances=params[1], gconsts=params[2],
            state_mix=params[3], state_logw=params[4],
            state_sw=params[5], slot_blocks=tuple(comp.slot_blocks) or None,
            n_states=comp.n_states, tr_flat=trainer.tr_flat,
        )
        total = jax.tree.map(lambda a, b: a + b, total, accs)
    return total


def accumulate_lattice(lat, vocab, comp, trainer, feats, period, stem,
                       lm_scale, total):
    """MMI denominator: arc-posterior-weighted accumulation (HFBLat role)."""
    utts, name_to_arc = score_lattice_arcs(
        lat, vocab, comp, trainer, feats, period, stem
    )
    if not utts:
        return total, 0.0
    logp, post = arc_posteriors(lat, lmscale=lm_scale, wdpenalty=0.0)
    gammas = {aid: (float(np.exp(min(g, 0.0))) if g > -30 else 0.0)
              for aid, g in post.items()}
    total = accumulate_arcs(utts, name_to_arc, gammas, comp, trainer, total)
    return total, logp


def run(argv: List[str]) -> int:
    force_platform_from_env()
    ta = parse_args("HMMIRest", argv, OPTS, min_args=1, usage=USAGE)
    cfg = ta.config
    hmm_list_file = ta.args[0]
    files = ta.script + ta.args[1:]
    if not files:
        HError(1030, "HMMIRest: no training files\n%s", USAGE)
    mmfs = ta.get_all("H")
    if not mmfs:
        HError(1030, "HMMIRest: at least one -H mmf required")
    if not ta.has("r"):
        HError(1030, "HMMIRest: denominator lattice dir (-r) required")

    hset = load_mmf(mmfs, cfg=ta.config)
    load_hmm_list(hmm_list_file, ta.config)
    comp = compile_hmmset(hset)
    vocab = read_dict(ta.get("d"), ta.config) if ta.has("d") else None
    mlfs = [MLF.load(p, ta.config) for p in ta.get_all("I")]
    lm_scale = float(ta.get("s", 1.0) or 1.0)

    ecfg = EBWConfig(
        e=cfg.flt_("E", 2.0, module="HMMIREST"),
        tau_i=cfg.flt_("ISMOOTHTAU", 0.0, module="HMMIREST"),
        min_var=cfg.flt_("MINVAR", 1e-6, module="HMMIREST"),
    )

    trainer = Trainer(comp)
    num_total = zero_accs(comp.n_mix, comp.dim, comp.n_states, comp.max_mix,
                          trainer.tr_flat)
    den_total = zero_accs(comp.n_mix, comp.dim, comp.n_states, comp.max_mix,
                          trainer.tr_flat)

    import jax

    mode = (cfg.str_("DISCRMODE", "MMI", module="HMMIREST") or "MMI").upper()
    period = int(cfg.flt_("TARGETRATE", 100000.0, module="HPARM"))
    total_acc_exp = 0.0
    null_words = (set() if vocab is None else {
        w.name for w in vocab.words.values() if w.prons[0].out_sym == ""})

    # Utterances accumulate in BLOCKS (HMMIREST: ACCBLOCK, default 8):
    # arc mini-utterances from every lattice in the block share one
    # length-bucketed scoring pass and one accumulation pass, cutting
    # kernel-launch count ~ACCBLOCK-fold (each launch pays fixed
    # dispatch latency on an accelerator). Per-lattice posterior math
    # is unchanged — only the device batching crosses utterances.
    acc_block = int(cfg.int_("ACCBLOCK", 8, module="HMMIREST") or 8)
    pend: List[dict] = []

    def flush():
        nonlocal num_total, den_total, total_acc_exp
        if not pend:
            return
        from ..algo.latops import arc_mpe_weights

        # 1) expand every lattice in the block (host only); role tags
        # keep numerator/denominator arc names distinct per utterance
        jobs = []
        all_utts = []
        for it in pend:
            for role, tag in (("num_lat", "#n"), ("den_lat", "#d")):
                lat = it.get(role)
                if lat is None:
                    continue
                utts, arc_ids = lattice_arc_utts(
                    lat, vocab, comp, it["data"], period, it["stem"] + tag)
                if not utts:
                    continue
                jobs.append((role, lat, utts,
                             dict(zip([u.name for u in utts], arc_ids)),
                             it))
                all_utts.extend(utts)
        # 2) ONE blocked scoring pass for every arc in the block
        arc_ll = score_arc_utts(all_utts, comp, trainer) if all_utts else {}
        num_utts: List = []
        den_utts: List = []
        num_w: dict = {}
        den_w: dict = {}
        for role, lat, utts, n2a, it in jobs:
            by_id = {n2a[n]: arc_ll[n] for n in n2a if n in arc_ll}
            for a in lat.arcs:
                if a.id in by_id:
                    a.aclike = by_id[a.id]
            if it.get("mpe_ref") is not None:
                weights, c_avg = arc_mpe_weights(
                    lat, it["mpe_ref"], lmscale=lm_scale, wdpenalty=0.0,
                    null_words=null_words)
                num_utts.extend(utts)
                den_utts.extend(utts)
                for n in n2a:
                    w = weights.get(n2a[n], 0.0)
                    num_w[n] = w if w > 0 else 0.0
                    den_w[n] = -w if w < 0 else 0.0
                total_acc_exp += c_avg
                if ta.trace >= 2:
                    print(f"  {it['stem']}: expected accuracy {c_avg:.3f}")
                continue
            logp, post = arc_posteriors(lat, lmscale=lm_scale,
                                        wdpenalty=0.0)
            gam = {aid: (float(np.exp(min(g, 0.0))) if g > -30 else 0.0)
                   for aid, g in post.items()}
            t_utts, t_w = ((num_utts, num_w) if role == "num_lat"
                           else (den_utts, den_w))
            t_utts.extend(utts)
            for n in n2a:
                t_w[n] = gam.get(n2a[n], 0.0)
            if role == "den_lat" and ta.trace >= 2:
                print(f"  {it['stem']}: den logP {logp:.2f}")
        # 3) ONE blocked accumulation pass per side (weights keyed by
        # arc-utterance name — arc ids collide across lattices)
        if num_utts:
            num_total = accumulate_arcs(
                num_utts, {n: n for n in num_w}, num_w, comp, trainer,
                num_total)
        if den_utts:
            den_total = accumulate_arcs(
                den_utts, {n: n for n in den_w}, den_w, comp, trainer,
                den_total)
        # 4) transcript numerators: one batched composite-FB call
        tutts = [it["num_utt"] for it in pend if it.get("num_utt")]
        if tutts:
            accs = trainer.accumulate(tutts, batch_size=acc_block)
            num_total = jax.tree.map(lambda a, b: a + b, num_total, accs)
        pend.clear()

    pre = preload_corpus(files, cfg)
    for fn in files:
        data, _p, _k, e = pre.get(fn) or open_speech_file(fn, cfg)
        stem = os.path.splitext(os.path.basename(e.logical))[0]

        den_path = os.path.join(ta.get("r"), f"{stem}.lat")
        if not os.path.exists(den_path):
            HRError(12030, "HMMIRest: no denominator lattice for %s", stem)
            continue
        den_lat = read_slf(den_path, ta.config)
        if vocab is None:
            HError(1030, "HMMIRest: word lattices need a dictionary (-d)")
        item = {"stem": stem, "data": data, "den_lat": den_lat}

        if mode in ("MPE", "MWE"):
            # MPE/MWE: positive/negative accuracy-weighted arc
            # occupancies from the same lattice
            # (algo/latops.arc_mpe_weights); needs a *timed* word
            # reference (e.g. HVite -a output).
            tr = find_labels(e.logical, mlfs, ta.get("L"), ta.get("X", "lab"))
            ref = [
                (l.name, (l.start or 0) / 1e7, (l.end or 0) / 1e7)
                for l in tr.labels
            ]
            if not any(r[2] > r[1] for r in ref):
                HError(12040, "HMMIRest MPE: reference MLF for %s has no "
                              "times (align with HVite -a first)", stem)
            item["mpe_ref"] = ref
        elif ta.has("q"):
            item["num_lat"] = read_slf(
                os.path.join(ta.get("q"), f"{stem}.lat"), ta.config)
        else:
            tr = find_labels(e.logical, mlfs, ta.get("L"), ta.get("X", "lab"))
            names = [l.name for l in tr.labels]
            item["num_utt"] = prepare_utterance(comp, stem, data, names)
        pend.append(item)
        if len(pend) >= acc_block:
            flush()
    flush()

    num_lp = float(np.asarray(num_total.total_logp))
    den_occ = float(np.asarray(den_total.occ).sum())
    num_occ = float(np.asarray(num_total.occ).sum())
    if ta.trace:
        print(f"HMMIRest: num occ {num_occ:.1f}, den occ {den_occ:.1f}, "
              f"num logP {num_lp:.2f}")

    var_floor = hset.macros["v"].get("varFloor1")
    m, v, w = ebw_update(comp, num_total, den_total, ecfg, var_floor)
    write_back(comp, means=m, variances=v, weights=w)

    out_dir = ta.get("M", ".")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, os.path.basename(mmfs[0]))
    save_mmf(hset, out, binary=ta.binary)
    if ta.trace:
        print(f"HMMIRest: saved {out}")
    return 0


main = tool_main(run)

if __name__ == "__main__":
    raise SystemExit(main())
