"""n-gram language models (ARPA format).

Mirrors `HTKLib/HLM.c : ReadLModel()/GetLMProb()` for the decode-side LM:
ARPA back-off files up to trigram. Log probs in the file are base-10
(ARPA convention); accessors return natural logs (HTK works in ln).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..utils.errors import HError

LN10 = math.log(10.0)


@dataclass
class NGramLM:
    order: int = 2
    # unigrams: word -> (ln prob, ln backoff)
    unigrams: Dict[str, Tuple[float, float]] = field(default_factory=dict)
    # bigrams: (w1, w2) -> (ln prob, ln backoff)
    bigrams: Dict[Tuple[str, str], Tuple[float, float]] = field(default_factory=dict)
    trigrams: Dict[Tuple[str, str, str], float] = field(default_factory=dict)
    # trigram back-off weights (for 4-gram models)
    tri_bo: Dict[Tuple[str, str, str], float] = field(default_factory=dict)
    fourgrams: Dict[Tuple[str, str, str, str], float] = field(
        default_factory=dict)

    @property
    def vocab(self) -> List[str]:
        return list(self.unigrams)

    def logp_uni(self, w: str) -> float:
        e = self.unigrams.get(w)
        return e[0] if e else -99.0 * LN10

    def logp_bi(self, w1: str, w2: str) -> float:
        """ln P(w2 | w1) with back-off."""
        e = self.bigrams.get((w1, w2))
        if e is not None:
            return e[0]
        u1 = self.unigrams.get(w1)
        bo = u1[1] if u1 else 0.0
        return bo + self.logp_uni(w2)

    def logp_tri(self, w1: str, w2: str, w3: str) -> float:
        e = self.trigrams.get((w1, w2, w3))
        if e is not None:
            return e
        b12 = self.bigrams.get((w1, w2))
        bo = b12[1] if b12 else 0.0
        return bo + self.logp_bi(w2, w3)

    def logp_4(self, w1: str, w2: str, w3: str, w4: str) -> float:
        e = self.fourgrams.get((w1, w2, w3, w4))
        if e is not None:
            return e
        bo = self.tri_bo.get((w1, w2, w3), 0.0)
        return bo + self.logp_tri(w2, w3, w4)


def read_arpa(path: str, cfg=None) -> NGramLM:
    from ..utils.filters import filtered

    try:
        with filtered(path, "HLANGMODFILTER", cfg) as p:
            lines = open(p, "r", errors="replace").read().splitlines()
    except OSError as e:
        HError(8110, "ReadLModel: cannot open LM %s (%s)", path, e)
    lm = NGramLM()
    section = 0
    for raw in lines:
        line = raw.strip()
        if not line:
            continue
        if line.startswith("\\data\\"):
            section = -1
            continue
        if line.startswith("\\1-grams"):
            section = 1
            continue
        if line.startswith("\\2-grams"):
            section = 2
            lm.order = max(lm.order, 2)
            continue
        if line.startswith("\\3-grams"):
            section = 3
            lm.order = max(lm.order, 3)
            continue
        if line.startswith("\\4-grams"):
            section = 4
            lm.order = 4
            continue
        if line.startswith("\\end\\"):
            break
        if section == -1:
            continue
        parts = line.split()
        if section == 1 and len(parts) >= 2:
            p = float(parts[0]) * LN10
            w = parts[1]
            bo = float(parts[2]) * LN10 if len(parts) > 2 else 0.0
            lm.unigrams[w] = (p, bo)
        elif section == 2 and len(parts) >= 3:
            p = float(parts[0]) * LN10
            bo = float(parts[3]) * LN10 if len(parts) > 3 else 0.0
            lm.bigrams[(parts[1], parts[2])] = (p, bo)
        elif section == 3 and len(parts) >= 4:
            lm.trigrams[(parts[1], parts[2], parts[3])] = float(parts[0]) * LN10
            if len(parts) > 4:
                lm.tri_bo[(parts[1], parts[2], parts[3])] = float(parts[4]) * LN10
        elif section == 4 and len(parts) >= 5:
            lm.fourgrams[(parts[1], parts[2], parts[3], parts[4])] = (
                float(parts[0]) * LN10)
    if not lm.unigrams:
        HError(8150, "ReadLModel: no unigrams found in %s", path)
    return lm


def write_matrix_bigram(lm: NGramLM, words: List[str], path: str) -> None:
    """Matrix bigram file (HLM.c MatBigram; HLStats' default -b output).

    One row per word in `words` order: the row word followed by
    P(col | row) for every column word in the same order, wrapped 8
    numbers per line with continuation lines indented. [LC layout vs
    reference: HTKBook documents the matrix-vs-backoff distinction; the
    exact wrap width is unverifiable until the mount appears.]
    """
    with open(path, "w") as f:
        for w1 in words:
            probs = [math.exp(lm.logp_bi(w1, w2)) for w2 in words]
            # renormalise rows (counts floored/discounted upstream)
            tot = sum(probs)
            if tot > 0:
                probs = [p / tot for p in probs]
            f.write(f"{w1:<12s}")
            for k, p in enumerate(probs):
                if k and k % 8 == 0:
                    f.write("\n" + " " * 12)
                f.write(f" {p:.4e}")
            f.write("\n")


def read_matrix_bigram(path: str, words: Optional[List[str]] = None) -> NGramLM:
    """Read a matrix bigram file back into an NGramLM (explicit bigrams
    only; no back-off weights — the matrix is dense by construction)."""
    rows: List[Tuple[str, List[float]]] = []
    cur: Optional[Tuple[str, List[float]]] = None
    for raw in open(path):
        if not raw.strip():
            continue
        if raw[0] not in (" ", "\t"):
            if cur is not None:
                rows.append(cur)
            parts = raw.split()
            cur = (parts[0], [float(x) for x in parts[1:]])
        else:
            assert cur is not None
            cur[1].extend(float(x) for x in raw.split())
    if cur is not None:
        rows.append(cur)
    order = words if words is not None else [w for w, _ in rows]
    if any(len(ps) != len(order) for _w, ps in rows):
        HError(8151, "read_matrix_bigram: row width != vocabulary size "
                     "in %s", path)
    lm = NGramLM(order=2)
    n = max(len(order), 1)
    for w, _ps in rows:
        lm.unigrams[w] = (math.log(1.0 / n), 0.0)
    for w, ps in rows:
        for w2, p in zip(order, ps):
            if p > 0.0:
                lm.bigrams[(w, w2)] = (math.log(p), 0.0)
    return lm


def write_arpa(lm: NGramLM, path: str) -> None:
    with open(path, "w") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(lm.unigrams)}\n")
        if lm.bigrams:
            f.write(f"ngram 2={len(lm.bigrams)}\n")
        if lm.trigrams:
            f.write(f"ngram 3={len(lm.trigrams)}\n")
        if lm.fourgrams:
            f.write(f"ngram 4={len(lm.fourgrams)}\n")
        f.write("\n\\1-grams:\n")
        for w, (p, bo) in sorted(lm.unigrams.items()):
            if bo != 0.0:
                f.write(f"{p / LN10:.4f} {w} {bo / LN10:.4f}\n")
            else:
                f.write(f"{p / LN10:.4f} {w}\n")
        if lm.bigrams:
            f.write("\n\\2-grams:\n")
            for (w1, w2), (p, bo) in sorted(lm.bigrams.items()):
                if bo != 0.0:
                    f.write(f"{p / LN10:.4f} {w1} {w2} {bo / LN10:.4f}\n")
                else:
                    f.write(f"{p / LN10:.4f} {w1} {w2}\n")
        if lm.trigrams:
            f.write("\n\\3-grams:\n")
            for (w1, w2, w3), p in sorted(lm.trigrams.items()):
                bo = lm.tri_bo.get((w1, w2, w3))
                if bo:
                    f.write(f"{p / LN10:.4f} {w1} {w2} {w3} {bo / LN10:.4f}\n")
                else:
                    f.write(f"{p / LN10:.4f} {w1} {w2} {w3}\n")
        if lm.fourgrams:
            f.write("\n\\4-grams:\n")
            for (w1, w2, w3, w4), p in sorted(lm.fourgrams.items()):
                f.write(f"{p / LN10:.4f} {w1} {w2} {w3} {w4}\n")
        f.write("\n\\end\\\n")
