"""HResults — recognition results analysis.

Mirrors `HTKTools/HResults.c`: DP string alignment of recognised vs
reference transcriptions with HTK's edit costs (ins=7, del=7, sub=10),
reporting sentence and word %Correct / Accuracy in HTK's table format,
optional confusion matrix (-p) and speaker-by-speaker breakdown (-k).

Usage: HResults [options] hmmList recFiles...

  -I mlf   reference MLF (repeatable)
  -L dir   reference label dir      -X ext  reference extension
  -e a b   make label a equivalent to b (repeatable; b may be ???
           meaning delete)          -p      print confusion matrix
  -t       output per-utterance alignments
  -s       strip triphone contexts before scoring
  -k mask  speaker mask (% captures): per-speaker breakdown table
  Standard: -A -C -D -S -T -V
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

from ..io.mlf import MLF, find_labels, load_label_file
from ..utils.cli import Option, parse_args, tool_main
from ..utils.errors import HError, HRError

USAGE = "Usage: HResults [options] hmmList recFiles..."

OPTS = {
    "I": Option("I", 1, "reference MLF", repeatable=True),
    "L": Option("L", 1, "reference label dir"),
    "X": Option("X", 1, "reference label ext"),
    "e": Option("e", 2, "label equivalence", repeatable=True),
    "p": Option("p", 0, "confusion matrix"),
    "t": Option("t", 0, "print alignments"),
    "s": Option("s", 0, "strip triphone contexts"),
    "f": Option("f", 0, "full results"),
    "k": Option("k", 1, "speaker mask (per-speaker breakdown)"),
}

SUB_COST, INS_COST, DEL_COST = 10, 7, 7


def dp_align(ref: List[str], hyp: List[str]):
    """HTK DP alignment; returns (hits, subs, dels, ins, pairs)."""
    n, m = len(ref), len(hyp)
    cost = [[0] * (m + 1) for _ in range(n + 1)]
    back = [[0] * (m + 1) for _ in range(n + 1)]  # 1=diag 2=del(ref) 3=ins(hyp)
    for i in range(1, n + 1):
        cost[i][0] = cost[i - 1][0] + DEL_COST
        back[i][0] = 2
    for j in range(1, m + 1):
        cost[0][j] = cost[0][j - 1] + INS_COST
        back[0][j] = 3
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d = cost[i - 1][j - 1] + (0 if ref[i - 1] == hyp[j - 1] else SUB_COST)
            dl = cost[i - 1][j] + DEL_COST
            ins = cost[i][j - 1] + INS_COST
            best = min(d, dl, ins)
            cost[i][j] = best
            back[i][j] = 1 if best == d else (2 if best == dl else 3)
    # trace
    i, j = n, m
    pairs: List[Tuple[Optional[str], Optional[str]]] = []
    while i > 0 or j > 0:
        b = back[i][j]
        if b == 1:
            pairs.append((ref[i - 1], hyp[j - 1]))
            i, j = i - 1, j - 1
        elif b == 2:
            pairs.append((ref[i - 1], None))
            i -= 1
        else:
            pairs.append((None, hyp[j - 1]))
            j -= 1
    pairs.reverse()
    hits = sum(1 for r, h in pairs if r is not None and r == h)
    subs = sum(1 for r, h in pairs if r is not None and h is not None and r != h)
    dels = sum(1 for r, h in pairs if h is None)
    ins = sum(1 for r, h in pairs if r is None)
    return hits, subs, dels, ins, pairs


_TRI_RE = re.compile(r"^(?:[^-]+-)?([^+]+?)(?:\+.+)?$")


def strip_context(name: str) -> str:
    m = _TRI_RE.match(name)
    return m.group(1) if m else name


def run(argv: List[str]) -> int:
    ta = parse_args("HResults", argv, OPTS, min_args=1, usage=USAGE)
    rec_files = ta.script + ta.args[1:]
    if not rec_files:
        HError(1030, "HResults: no recognition files\n%s", USAGE)
    mlfs = [MLF.load(p, ta.config) for p in ta.get_all("I")]
    ref_dir = ta.get("L")
    ref_ext = ta.get("X", "lab")

    equiv: Dict[str, str] = {}
    for a, b in [v if isinstance(v, tuple) else (v,) for v in ta.get_all("e")]:
        equiv[b] = a  # map b -> a (HTK: -e a b makes b equivalent to a)

    def norm(names: List[str]) -> List[str]:
        out = []
        for n in names:
            if ta.has("s"):
                n = strip_context(n)
            n = equiv.get(n, n)
            if n == "???":
                continue
            out.append(n)
        return out

    tot_h = tot_s = tot_d = tot_i = tot_n = 0
    sent_ok = sent_n = 0
    confusion: Dict[Tuple[str, str], int] = {}
    # -k mask: per-speaker tallies [h, d, s, i, n, snt, snt_ok]
    spk_mask = ta.get("k")
    by_spk: Dict[str, List[int]] = {}

    # rec files may be label files or MLFs
    rec_entries: List[Tuple[str, List[str]]] = []
    for rf in rec_files:
        try:
            first = open(rf).readline().strip()
        except OSError as e:
            HError(3310, "HResults: cannot open %s (%s)", rf, e)
        if first == "#!MLF!#":
            m = MLF.load(rf, ta.config)
            for pattern, tr in m.entries:
                rec_entries.append((pattern, [l.name for l in tr.labels]))
        else:
            tr = load_label_file(rf)
            rec_entries.append((rf, [l.name for l in tr.labels]))

    for key, hyp_names in rec_entries:
        stem = os.path.splitext(os.path.basename(key))[0]
        try:
            ref_tr = find_labels(stem, mlfs, ref_dir, ref_ext)
        except Exception:
            HRError(3331, "HResults: no reference for %s", key)
            continue
        ref = norm([l.name for l in ref_tr.labels])
        hyp = norm(hyp_names)
        h, s, d, i, pairs = dp_align(ref, hyp)
        tot_h += h
        tot_s += s
        tot_d += d
        tot_i += i
        tot_n += len(ref)
        sent_n += 1
        if s == 0 and d == 0 and i == 0:
            sent_ok += 1
        if spk_mask:
            from ..algo.adapt import speaker_from_mask

            t = by_spk.setdefault(speaker_from_mask(spk_mask, key),
                                  [0, 0, 0, 0, 0, 0, 0])
            t[0] += h
            t[1] += d
            t[2] += s
            t[3] += i
            t[4] += len(ref)
            t[5] += 1
            t[6] += int(s == 0 and d == 0 and i == 0)
        for r, hh in pairs:
            if r is not None and hh is not None and r != hh:
                confusion[(r, hh)] = confusion.get((r, hh), 0) + 1
        if ta.has("t"):
            print(f"Aligned transcription: {stem}")
            print(" REF: " + " ".join(r if r else "*" for r, _ in pairs))
            print(" HYP: " + " ".join(h if h else "*" for _, h in pairs))

    if sent_n == 0:
        HError(3332, "HResults: nothing scored")
    corr = 100.0 * tot_h / max(tot_n, 1)
    acc = 100.0 * (tot_h - tot_i) / max(tot_n, 1)
    scorr = 100.0 * sent_ok / sent_n
    print("====================== HTK Results Analysis =======================")
    print(f"  Date: (htk_tpu)")
    print(f"  Ref : {' '.join(ta.get_all('I')) or ref_dir or '.'}")
    print(f"  Rec : {rec_files[0]}{' ...' if len(rec_files) > 1 else ''}")
    print("------------------------ Overall Results --------------------------")
    print(f"SENT: %Correct={scorr:.2f} [H={sent_ok}, S={sent_n - sent_ok}, "
          f"N={sent_n}]")
    print(f"WORD: %Corr={corr:.2f}, Acc={acc:.2f} [H={tot_h}, D={tot_d}, "
          f"S={tot_s}, I={tot_i}, N={tot_n}]")
    from ..utils.metrics import emit_metric

    emit_metric(ta.config, "HResults", corr=round(corr, 4),
                acc=round(acc, 4), sent_correct=round(scorr, 4),
                h=tot_h, d=tot_d, s=tot_s, i=tot_i, n=tot_n)
    if spk_mask and by_spk:
        # HResults.c speaker-by-speaker breakdown table
        print(",-------------------------------------------------------------------.")
        print("| SPKR   | # Snt |  Corr     Sub     Del     Ins     Err    S. Err  |")
        print("|--------+-------+--------------------------------------------------|")
        for spk in sorted(by_spk):
            h, d, su, i, n, snt, sok = by_spk[spk]
            n = max(n, 1)
            print(f"| {spk:<6} | {snt:5d} | {100.0 * h / n:6.2f} "
                  f"{100.0 * su / n:7.2f} {100.0 * d / n:7.2f} "
                  f"{100.0 * i / n:7.2f} {100.0 * (su + d + i) / n:7.2f} "
                  f"{100.0 * (snt - sok) / max(snt, 1):8.2f}  |")
        print("`-------------------------------------------------------------------'")
    if ta.has("p") and confusion:
        print("------------------------ Confusion Matrix -------------------------")
        for (r, hh), c in sorted(confusion.items(), key=lambda kv: -kv[1]):
            print(f"  {r:>12} -> {hh:<12} {c}")
    print("===================================================================")
    return 0


main = tool_main(run)

if __name__ == "__main__":
    raise SystemExit(main())
