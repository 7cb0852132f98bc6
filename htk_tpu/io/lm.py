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


BINLM_MAGIC = b"!BINLM\n"
BINLM_VERSION = 1


def write_binary_lm(lm: NGramLM, path: str) -> None:
    """HTK binary n-gram LM (`HTKLib/HLM.c : WriteLModel` binary form,
    SURVEY.md §2.1 HLM row).

    [LC: reconstructed — the reference mount is empty, so the byte
    layout is this framework's own, marked by an explicit magic so a
    real HTK binary LM is rejected with a numbered error rather than
    misparsed.] Layout: `!BINLM\\n` magic, one text header line
    `version order n1 [n2 [n3 [n4]]]\\n`, the vocabulary as
    newline-terminated UTF-8 words, then big-endian binary sections per
    order: uint32 word ids (header order) and f32 natural-log prob
    (+ f32 back-off weight for orders < max). Write->read->write is
    byte-identical (tested)."""
    import struct

    words = sorted(lm.unigrams)
    wid = {w: i for i, w in enumerate(words)}
    counts = [len(lm.unigrams), len(lm.bigrams), len(lm.trigrams),
              len(lm.fourgrams)]
    order = max(k + 1 for k, c in enumerate(counts) if c or k == 0)
    with open(path, "wb") as f:
        f.write(BINLM_MAGIC)
        hdr = " ".join(
            [str(BINLM_VERSION), str(order)]
            + [str(c) for c in counts[:order]])
        f.write(hdr.encode() + b"\n")
        for w in words:
            f.write(w.encode() + b"\n")
        for w in words:
            p, bo = lm.unigrams[w]
            f.write(struct.pack(">ff", p, bo))
        for (w1, w2), (p, bo) in sorted(lm.bigrams.items()):
            f.write(struct.pack(">IIff", wid[w1], wid[w2], p, bo))
        for (w1, w2, w3), p in sorted(lm.trigrams.items()):
            bo = lm.tri_bo.get((w1, w2, w3), 0.0)
            if order > 3:
                f.write(struct.pack(">IIIff", wid[w1], wid[w2], wid[w3],
                                    p, bo))
            else:
                f.write(struct.pack(">IIIf", wid[w1], wid[w2], wid[w3], p))
        for (w1, w2, w3, w4), p in sorted(lm.fourgrams.items()):
            f.write(struct.pack(">IIIIf", wid[w1], wid[w2], wid[w3],
                                wid[w4], p))


def read_binary_lm(path: str, cfg=None) -> NGramLM:
    """Read the binary n-gram LM written by write_binary_lm.

    Raises a numbered error on a bad magic or an unsupported version —
    `HTKLib/HLM.c : ReadLModel` rejects incompatible binary headers the
    same way."""
    import struct

    from ..utils.filters import filtered

    with filtered(path, "HLANGMODFILTER", cfg) as p:
        data = open(p, "rb").read()
    if not data.startswith(BINLM_MAGIC):
        HError(8150, "ReadLModel: %s is not a binary n-gram LM", path)
    pos = len(BINLM_MAGIC)
    nl = data.index(b"\n", pos)
    hdr = data[pos:nl].decode().split()
    pos = nl + 1
    version = int(hdr[0])
    if version != BINLM_VERSION:
        HError(8152, "ReadLModel: binary LM version %d unsupported "
                     "(expected %d)", version, BINLM_VERSION)
    order = int(hdr[1])
    counts = [int(x) for x in hdr[2:2 + order]] + [0] * (4 - order)
    words = []
    for _ in range(counts[0]):
        nl = data.index(b"\n", pos)
        words.append(data[pos:nl].decode())
        pos = nl + 1
    lm = NGramLM(order=max(order, 2) if counts[1] else order)
    lm.order = order
    for w in words:
        p, bo = struct.unpack_from(">ff", data, pos)
        pos += 8
        lm.unigrams[w] = (p, bo)
    for _ in range(counts[1]):
        i1, i2, p, bo = struct.unpack_from(">IIff", data, pos)
        pos += 16
        lm.bigrams[(words[i1], words[i2])] = (p, bo)
    for _ in range(counts[2]):
        if order > 3:
            i1, i2, i3, p, bo = struct.unpack_from(">IIIff", data, pos)
            pos += 20
            if bo != 0.0:
                lm.tri_bo[(words[i1], words[i2], words[i3])] = bo
        else:
            i1, i2, i3, p = struct.unpack_from(">IIIf", data, pos)
            pos += 16
        lm.trigrams[(words[i1], words[i2], words[i3])] = p
    for _ in range(counts[3]):
        i1, i2, i3, i4, p = struct.unpack_from(">IIIIf", data, pos)
        pos += 20
        lm.fourgrams[(words[i1], words[i2], words[i3], words[i4])] = p
    if pos != len(data):
        HError(8151, "ReadLModel: %d trailing bytes in binary LM %s",
               len(data) - pos, path)
    return lm


def read_lm(path: str, cfg=None,
            words: Optional[List[str]] = None) -> NGramLM:
    """Open an n-gram LM of any supported container: binary
    (write_binary_lm magic), ARPA back-off, or matrix bigram — sniffed
    from the leading bytes like HLM.c/HBuild do."""
    from ..utils.filters import filtered

    with filtered(path, "HLANGMODFILTER", cfg) as p:
        head = open(p, "rb").read(4096)
    if head.startswith(BINLM_MAGIC):
        return read_binary_lm(path, cfg)
    if b"\\data\\" in head:
        return read_arpa(path, cfg)
    return read_matrix_bigram(path, words=words)


def save_lm(lm: NGramLM, path: str, cfg=None) -> None:
    """Write an LM in the configured container: `HLM: SAVEBINARY = T`
    selects the binary form (the HLMTools binary-output switch), ARPA
    otherwise."""
    if cfg is not None and cfg.bool_("SAVEBINARY", False, module="HLM"):
        write_binary_lm(lm, path)
    else:
        write_arpa(lm, path)


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
