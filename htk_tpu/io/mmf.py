"""MMF (Master Macro File) reader/writer — HTK HMM definitions.

Mirrors `HTKLib/HModel.c : LoadHMMSet()/SaveHMMSet()` text format:

  ~o <STREAMINFO> 1 39 <VECSIZE> 39 <MFCC_E_D_A> <DIAGC>
  ~v "varFloor1"  <VARIANCE> 39  ...
  ~h "ax" <BEGINHMM> <NUMSTATES> 5
    <STATE> 2 <NUMMIXES> 6 <MIXTURE> 1 0.5 <MEAN> 39 ... <VARIANCE> 39 ...
    <TRANSP> 5 ... <ENDHMM>

Parameter tying is expressed by macros: a definition site (`~s "name"`
followed by a body) registers the object; a use site (`~s "name"` where a
body is expected) references it. Sharing is represented here by Python
object identity — the same StateInfo/MixPDF/etc. object appears in every
HMM that ties it, exactly like HTK's pointer sharing.

Macro types supported: ~o options, ~h hmm, ~s state, ~m mixpdf, ~u mean,
~v variance, ~i invcovar, ~t transP, ~w stream weights, ~d duration.
(Adaptation macros ~r/~a/~b/~j and ANN macros ~L/~N/~F are handled by
their own modules.)

Binary MMFs (HTK's -B flag writes keyword codes after a ':' marker) are
handled by this framework's own binary form (see load_mmf); text MMFs
remain the recipe interchange surface (SURVEY.md §5.4). [LC]
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, TextIO, Tuple

import numpy as np

from ..utils.errors import HError
from . import parmkind as pk

LZERO = -1.0e10
MINMIX = 1e-5  # HTK MINMIX: mixture weights below this are defunct

COV_KINDS = ("DIAGC", "INVDIAGC", "FULLC", "LLTC", "XFORMC")
DUR_KINDS = ("NULLD", "POISSOND", "GAMMAD", "GEND")


@dataclass
class MixPDF:
    """A single Gaussian component (HModel.c MixPDF)."""

    mean: np.ndarray  # (D,)
    var: np.ndarray  # (D,) diagonal variance (or inverse-cov matrix for FULLC)
    gconst: Optional[float] = None
    cov_kind: str = "DIAGC"

    def fix_gconst(self) -> float:
        """gConst = D*log(2pi) + sum(log var) (HModel.c : FixGConsts)."""
        d = len(self.mean)
        if self.cov_kind == "DIAGC":
            self.gconst = float(d * math.log(2 * math.pi) + np.sum(np.log(self.var)))
        elif self.cov_kind == "FULLC":
            # var holds the inverse covariance (upper-tri stored full here)
            sign, logdet = np.linalg.slogdet(self.var)
            self.gconst = float(d * math.log(2 * math.pi) - logdet)
        elif self.cov_kind == "LLTC":
            # var holds the LLT factor of the precision: log|P| =
            # 2 sum log diag(L) [LC]
            diag = np.maximum(np.abs(np.diag(self.var)), 1e-38)
            self.gconst = float(d * math.log(2 * math.pi)
                                - 2.0 * np.sum(np.log(diag)))
        else:
            HError(7032, "fix_gconst: covariance kind %s unsupported", self.cov_kind)
        return self.gconst


@dataclass
class StreamElem:
    """Mixture list for one stream (HModel.c StreamElem).

    Discrete streams store a DProb codeword table instead of Gaussians:
    dprobs[k] is HTK's short-coded -2371.8*ln(p) value for codeword k+1
    (32767 = floored zero).
    """

    weights: List[float] = field(default_factory=list)
    mixes: List[Optional[MixPDF]] = field(default_factory=list)
    dprobs: Optional[np.ndarray] = None  # (K,) int16-coded probs

DPROB_SCALE = -2371.8


def dprob_to_logp(d: np.ndarray) -> np.ndarray:
    """Short-coded DProb -> natural log prob (HModel.c DProb2Short inv)."""
    lp = np.asarray(d, np.float64) / DPROB_SCALE
    return np.where(np.asarray(d) >= 32767, LZERO, lp).astype(np.float32)


def logp_to_dprob(lp: np.ndarray) -> np.ndarray:
    """Natural log prob -> short-coded DProb."""
    d = np.round(np.asarray(lp, np.float64) * DPROB_SCALE)
    return np.clip(np.where(np.asarray(lp) <= LZERO / 2, 32767, d),
                   0, 32767).astype(np.int32)


@dataclass
class StateInfo:
    """Emitting-state definition (HModel.c StateInfo)."""

    streams: List[StreamElem] = field(default_factory=list)
    stream_weights: Optional[np.ndarray] = None
    dur: Optional[np.ndarray] = None


@dataclass
class HMMDef:
    """One HMM (HModel.c HMMDef): states 2..N-1 emit, transP is (N, N)."""

    name: str
    nstates: int = 0
    states: List[StateInfo] = field(default_factory=list)  # len N-2
    transp: Optional[np.ndarray] = None  # (N, N) probs (not logs) in file
    dur: Optional[np.ndarray] = None  # model-level <DURATION> vector


@dataclass
class HMMSet:
    """A set of HMM definitions + macro tables (HModel.c HMMSet)."""

    vec_size: int = 0
    parm_kind: int = 0
    cov_kind: str = "DIAGC"
    dur_kind: str = "NULLD"
    stream_widths: List[int] = field(default_factory=list)
    hmms: Dict[str, HMMDef] = field(default_factory=dict)
    # macro tables: name -> object (definition sites)
    macros: Dict[str, Dict[str, object]] = field(
        default_factory=lambda: {k: {} for k in "hsmuvitwd"}
    )
    hmm_set_id: Optional[str] = None

    @property
    def parm_kind_str(self) -> str:
        return pk.parmkind2str(self.parm_kind)

    @property
    def swidth(self) -> List[int]:
        return self.stream_widths or [self.vec_size]

    def phys_hmm(self, name: str) -> HMMDef:
        h = self.hmms.get(name)
        if h is None:
            HError(7035, "HMMSet: no HMM named %s", name)
        return h


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

# atoms must stop at '<', '~' and '"' — HTK writes keywords without
# surrounding whitespace (e.g. `<VECSIZE> 4<NULLD><MFCC_E><DIAGC>`).
_TOKEN_RE = re.compile(
    r"""<(?P<kw>[^>]+)>|~(?P<mac>[a-zA-Z])|"(?P<qstr>[^"]*)"|(?P<atom>[^\s<~"]+)""",
    re.VERBOSE,
)


class _Tok:
    KW = "kw"
    MACRO = "macro"
    STR = "str"
    ATOM = "atom"

    def __init__(self, kind: str, val: str):
        self.kind = kind
        self.val = val

    def __repr__(self):
        return f"{self.kind}:{self.val}"


def _tokenize(text: str):
    for m in _TOKEN_RE.finditer(text):
        if m.group("kw") is not None:
            yield _Tok(_Tok.KW, m.group("kw").strip().upper())
        elif m.group("mac") is not None:
            yield _Tok(_Tok.MACRO, m.group("mac"))
        elif m.group("qstr") is not None:
            yield _Tok(_Tok.STR, m.group("qstr"))
        else:
            yield _Tok(_Tok.ATOM, m.group("atom"))


class _Parser:
    def __init__(self, text: str, hset: HMMSet):
        self.toks = list(_tokenize(text))
        self.pos = 0
        self.hset = hset

    def peek(self) -> Optional[_Tok]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            HError(7050, "MMF parse: unexpected end of file")
        self.pos += 1
        return t

    def expect_kw(self, kw: str) -> None:
        t = self.next()
        if t.kind != _Tok.KW or t.val != kw:
            HError(7050, "MMF parse: expected <%s>, got %r", kw, t)

    def next_int(self) -> int:
        t = self.next()
        try:
            return int(t.val)
        except ValueError:
            HError(7050, "MMF parse: expected integer, got %r", t)

    def next_float(self) -> float:
        t = self.next()
        try:
            return float(t.val)
        except ValueError:
            HError(7050, "MMF parse: expected float, got %r", t)

    def next_string(self) -> str:
        t = self.next()
        if t.kind not in (_Tok.STR, _Tok.ATOM):
            HError(7050, "MMF parse: expected string, got %r", t)
        return t.val

    def read_vector(self, n: int) -> np.ndarray:
        return np.array([self.next_float() for _ in range(n)], dtype=np.float32)

    def read_matrix(self, r: int, c: int) -> np.ndarray:
        return self.read_vector(r * c).reshape(r, c)

    def read_trimat(self, n: int) -> np.ndarray:
        """Upper-triangular (row i has n-i entries) -> full symmetric."""
        M = np.zeros((n, n), dtype=np.float32)
        for i in range(n):
            for j in range(i, n):
                M[i, j] = self.next_float()
                M[j, i] = M[i, j]
        return M

    # -- global options (~o) --------------------------------------------

    def parse_options(self):
        hs = self.hset
        while True:
            t = self.peek()
            if t is None or t.kind == _Tok.MACRO:
                return
            if t.kind != _Tok.KW:
                return
            kw = t.val
            if kw == "STREAMINFO":
                self.next()
                s = self.next_int()
                hs.stream_widths = [self.next_int() for _ in range(s)]
            elif kw == "VECSIZE":
                self.next()
                hs.vec_size = self.next_int()
            elif kw == "HMMSETID":
                self.next()
                hs.hmm_set_id = self.next_string()
            elif kw == "MSDINFO":
                self.next()
                s = self.next_int()
                for _ in range(s):
                    self.next_int()
            elif kw in COV_KINDS:
                self.next()
                hs.cov_kind = kw
            elif kw in DUR_KINDS:
                self.next()
                hs.dur_kind = kw
            elif kw == "PARMKIND":
                self.next()
                hs.parm_kind = pk.str2parmkind(self.next_string())
            else:
                # a parameter-kind flag like <MFCC_E_D_A>
                try:
                    hs.parm_kind = pk.str2parmkind(kw)
                    self.next()
                except Exception:
                    return

    # -- shared-structure bodies ----------------------------------------

    def parse_mean(self) -> np.ndarray:
        self.expect_kw("MEAN")
        n = self.next_int()
        return self.read_vector(n)

    def parse_variance_body(self, kw_tok: _Tok) -> Tuple[str, np.ndarray]:
        kw = kw_tok.val
        if kw == "VARIANCE":
            n = self.next_int()
            return "DIAGC", self.read_vector(n)
        if kw == "INVCOVAR":
            n = self.next_int()
            return "FULLC", self.read_trimat(n)
        if kw == "LLTCOVAR":
            n = self.next_int()
            return "LLTC", self.read_trimat(n)
        HError(7050, "MMF parse: expected variance kind, got <%s>", kw)

    def parse_mixpdf(self) -> MixPDF:
        """<MEAN>.. <VARIANCE>.. [<GCONST> g] — or ~u/~v/~i macro refs."""
        mean = None
        var = None
        cov_kind = "DIAGC"
        gconst = None
        t = self.peek()
        # mean
        if t.kind == _Tok.MACRO and t.val == "u":
            self.next()
            mean = self._macro_ref("u")
        else:
            mean = self.parse_mean()
        # variance
        t = self.peek()
        if t.kind == _Tok.MACRO and t.val in ("v", "i"):
            mac = self.next().val
            obj = self._macro_ref(mac)
            var = obj
            cov_kind = "DIAGC" if mac == "v" else "FULLC"
        else:
            kw = self.next()
            cov_kind, var = self.parse_variance_body(kw)
        t = self.peek()
        if t is not None and t.kind == _Tok.KW and t.val == "GCONST":
            self.next()
            gconst = self.next_float()
        mp = MixPDF(mean=mean, var=var, gconst=gconst, cov_kind=cov_kind)
        if gconst is None:
            mp.fix_gconst()
        return mp

    def _macro_ref(self, mac: str):
        name = self.next_string()
        table = self.hset.macros.get(mac, {})
        if name not in table:
            HError(7035, "MMF parse: undefined macro ~%s \"%s\"", mac, name)
        return table[name]

    def parse_state(self) -> StateInfo:
        hs = self.hset
        nstreams = len(hs.swidth)
        si = StateInfo()
        nmix = [1] * nstreams
        t = self.peek()
        if t.kind == _Tok.KW and t.val == "NUMMIXES":
            self.next()
            nmix = [self.next_int() for _ in range(nstreams)]
        t = self.peek()
        if t.kind == _Tok.KW and t.val == "SWEIGHTS":
            self.next()
            n = self.next_int()
            si.stream_weights = self.read_vector(n)
        elif t.kind == _Tok.MACRO and t.val == "w":
            self.next()
            si.stream_weights = self._macro_ref("w")

        for s in range(nstreams):
            t = self.peek()
            if t is not None and t.kind == _Tok.KW and t.val == "STREAM":
                self.next()
                self.next_int()
            se = StreamElem()
            m = nmix[s]
            t = self.peek()
            if t is not None and t.kind == _Tok.KW and t.val == "DPROB":
                # discrete stream: m short-coded codeword probs with
                # HTK's value*repeat run-length syntax
                self.next()
                vals: List[int] = []
                while len(vals) < m:
                    tok = self.next()
                    if "*" in tok.val:
                        v, r = tok.val.split("*")
                        vals.extend([int(v)] * int(r))
                    else:
                        vals.append(int(tok.val))
                se.dprobs = np.asarray(vals[:m], np.int32)
                si.streams.append(se)
                continue
            if m == 1:
                t = self.peek()
                if t.kind == _Tok.MACRO and t.val == "m":
                    self.next()
                    mp = self._macro_ref("m")
                else:
                    mp = self.parse_mixpdf()
                se.weights = [1.0]
                se.mixes = [mp]
            else:
                se.weights = [0.0] * m
                se.mixes = [None] * m
                while True:
                    t = self.peek()
                    if t is None or t.kind != _Tok.KW or t.val != "MIXTURE":
                        break
                    self.next()
                    mi = self.next_int()
                    w = self.next_float()
                    t = self.peek()
                    if t.kind == _Tok.MACRO and t.val == "m":
                        self.next()
                        mp = self._macro_ref("m")
                    else:
                        mp = self.parse_mixpdf()
                    se.weights[mi - 1] = w
                    se.mixes[mi - 1] = mp
            si.streams.append(se)

        t = self.peek()
        if t is not None:
            if t.kind == _Tok.KW and t.val == "DURATION":
                self.next()
                n = self.next_int()
                si.dur = self.read_vector(n)
            elif t.kind == _Tok.MACRO and t.val == "d":
                self.next()
                si.dur = self._macro_ref("d")
        return si

    def parse_transp(self) -> np.ndarray:
        self.expect_kw("TRANSP")
        n = self.next_int()
        return self.read_matrix(n, n)

    def parse_hmm(self, name: str) -> HMMDef:
        h = HMMDef(name=name)
        self.expect_kw("BEGINHMM")
        self.expect_kw("NUMSTATES")
        h.nstates = self.next_int()
        for i in range(2, h.nstates):
            self.expect_kw("STATE")
            si_idx = self.next_int()
            if si_idx != i:
                HError(7050, "MMF parse: state index %d, expected %d", si_idx, i)
            t = self.peek()
            if t.kind == _Tok.MACRO and t.val == "s":
                self.next()
                h.states.append(self._macro_ref("s"))
            else:
                h.states.append(self.parse_state())
        t = self.peek()
        if t.kind == _Tok.MACRO and t.val == "t":
            self.next()
            h.transp = self._macro_ref("t")
        else:
            h.transp = self.parse_transp()
        t = self.peek()
        if t is not None and t.kind == _Tok.KW and t.val == "DURATION":
            self.next()
            n = self.next_int()
            h.dur = self.read_vector(n)
        elif t is not None and t.kind == _Tok.MACRO and t.val == "d":
            self.next()
            h.dur = self._macro_ref("d")
        self.expect_kw("ENDHMM")
        return h

    # -- top level -------------------------------------------------------

    def parse(self):
        hs = self.hset
        while True:
            t = self.peek()
            if t is None:
                return
            if t.kind != _Tok.MACRO:
                HError(7050, "MMF parse: expected macro, got %r", t)
            mac = self.next().val
            if mac == "o":
                self.parse_options()
            elif mac == "h":
                name = self.next_string()
                h = self.parse_hmm(name)
                hs.hmms[name] = h
                hs.macros["h"][name] = h
            elif mac == "s":
                name = self.next_string()
                hs.macros["s"][name] = self.parse_state()
            elif mac == "m":
                name = self.next_string()
                hs.macros["m"][name] = self.parse_mixpdf()
            elif mac == "u":
                name = self.next_string()
                hs.macros["u"][name] = self.parse_mean()
            elif mac == "v":
                name = self.next_string()
                kw = self.next()
                _, v = self.parse_variance_body(kw)
                hs.macros["v"][name] = v
            elif mac == "i":
                name = self.next_string()
                kw = self.next()
                _, v = self.parse_variance_body(kw)
                hs.macros["i"][name] = v
            elif mac == "t":
                name = self.next_string()
                hs.macros["t"][name] = self.parse_transp()
            elif mac == "w":
                name = self.next_string()
                self.expect_kw("SWEIGHTS")
                n = self.next_int()
                hs.macros["w"][name] = self.read_vector(n)
            elif mac == "d":
                name = self.next_string()
                self.expect_kw("DURATION")
                n = self.next_int()
                hs.macros["d"][name] = self.read_vector(n)
            else:
                HError(7050, "MMF parse: unsupported macro type ~%s", mac)


_BMMF_MAGIC = b"#!HTK-TPU-BMMF!#"


def load_mmf(paths, hset: Optional[HMMSet] = None) -> HMMSet:
    """Load one or more MMF files into an HMMSet (HModel.c : LoadHMMSet).

    Binary MMFs (written with -B) are auto-detected by magic. [LC] The
    binary layout is this framework's own (pickled structure preserving
    macro sharing), not HTK's ':'-code binary — flagged in the header so
    a mismatch fails loudly rather than misparsing.
    """
    if isinstance(paths, str):
        paths = [paths]
    hset = hset or HMMSet()
    for p in paths:
        try:
            head = open(p, "rb").read(len(_BMMF_MAGIC))
        except OSError as e:
            HError(7010, "load_mmf: cannot open %s (%s)", p, e)
        if head == _BMMF_MAGIC:
            import pickle

            with open(p, "rb") as f:
                f.read(len(_BMMF_MAGIC))
                other: HMMSet = pickle.load(f)
            hset.vec_size = hset.vec_size or other.vec_size
            hset.parm_kind = hset.parm_kind or other.parm_kind
            hset.cov_kind = other.cov_kind
            hset.dur_kind = other.dur_kind
            hset.stream_widths = hset.stream_widths or other.stream_widths
            hset.hmms.update(other.hmms)
            for mac, table in other.macros.items():
                hset.macros.setdefault(mac, {}).update(table)
            continue
        try:
            text = open(p, "r").read()
        except OSError as e:
            HError(7010, "load_mmf: cannot open %s (%s)", p, e)
        _Parser(text, hset).parse()
    return hset


def load_hmm_list(path: str) -> List[Tuple[str, Optional[str]]]:
    """HMM list file: 'logical [physical]' per line (HModel.c LoadHMMList)."""
    out = []
    for ln in open(path):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split()
        out.append((parts[0], parts[1] if len(parts) > 1 else None))
    return out


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _fmt_vec(v: np.ndarray) -> str:
    return " " + " ".join("%.6e" % x for x in np.asarray(v).reshape(-1))


class _Writer:
    def __init__(self, hset: HMMSet, f: TextIO):
        self.hset = hset
        self.f = f
        # object id -> (macro type, name), for emitting refs at use sites
        self.shared: Dict[int, Tuple[str, str]] = {}
        for mac, table in hset.macros.items():
            if mac == "h":
                continue
            for name, obj in table.items():
                self.shared[id(obj)] = (mac, name)

    def w(self, s: str):
        self.f.write(s)

    def write_options(self):
        hs = self.hset
        self.w("~o\n")
        sw = hs.swidth
        self.w(f"<STREAMINFO> {len(sw)} " + " ".join(str(x) for x in sw) + "\n")
        self.w(
            f"<VECSIZE> {hs.vec_size}<{hs.dur_kind}><{hs.parm_kind_str}><{hs.cov_kind}>\n"
        )

    def write_mean(self, mean, indent=""):
        ref = self.shared.get(id(mean))
        if ref and ref[0] == "u":
            self.w(f'{indent}~u "{ref[1]}"\n')
        else:
            self.w(f"{indent}<MEAN> {len(mean)}\n{_fmt_vec(mean)}\n")

    def write_var(self, var, cov_kind, indent=""):
        ref = self.shared.get(id(var))
        if ref and ref[0] in ("v", "i"):
            self.w(f'{indent}~{ref[0]} "{ref[1]}"\n')
            return
        if cov_kind == "DIAGC":
            self.w(f"{indent}<VARIANCE> {len(var)}\n{_fmt_vec(var)}\n")
        elif cov_kind in ("FULLC", "LLTC"):
            kw = "INVCOVAR" if cov_kind == "FULLC" else "LLTCOVAR"
            n = var.shape[0]
            self.w(f"{indent}<{kw}> {n}\n")
            for i in range(n):
                self.w(_fmt_vec(var[i, i:]) + "\n")
        else:
            HError(7032, "write_var: unsupported cov kind %s", cov_kind)

    def write_mixpdf(self, mp: MixPDF, indent=""):
        ref = self.shared.get(id(mp))
        if ref and ref[0] == "m":
            self.w(f'{indent}~m "{ref[1]}"\n')
            return
        self._write_mixpdf_body(mp, indent)

    def _write_mixpdf_body(self, mp: MixPDF, indent=""):
        self.write_mean(mp.mean, indent)
        self.write_var(mp.var, mp.cov_kind, indent)
        if mp.gconst is not None:
            self.w(f"{indent}<GCONST> %.6e\n" % mp.gconst)

    def _write_state_body(self, si: StateInfo):
        hs = self.hset
        nstreams = len(hs.swidth)
        nmix = [
            (len(se.dprobs) if se.dprobs is not None else len(se.mixes))
            for se in si.streams
        ]
        if any(m > 1 for m in nmix):
            self.w("<NUMMIXES> " + " ".join(str(m) for m in nmix) + "\n")
        if si.stream_weights is not None:
            ref = self.shared.get(id(si.stream_weights))
            if ref and ref[0] == "w":
                self.w(f'~w "{ref[1]}"\n')
            else:
                self.w(f"<SWEIGHTS> {len(si.stream_weights)}\n{_fmt_vec(si.stream_weights)}\n")
        for s, se in enumerate(si.streams):
            if nstreams > 1:
                self.w(f"<STREAM> {s + 1}\n")
            if se.dprobs is not None:
                # run-length encode consecutive repeats (HTK x*n form)
                out = []
                vals = [int(v) for v in se.dprobs]
                i = 0
                while i < len(vals):
                    j = i
                    while j + 1 < len(vals) and vals[j + 1] == vals[i]:
                        j += 1
                    out.append(f"{vals[i]}*{j - i + 1}" if j > i
                               else str(vals[i]))
                    i = j + 1
                self.w("<DPROB> " + " ".join(out) + "\n")
                continue
            if len(se.mixes) == 1:
                self.write_mixpdf(se.mixes[0])
            else:
                for mi, (wt, mp) in enumerate(zip(se.weights, se.mixes)):
                    if mp is None or wt < MINMIX:
                        continue
                    self.w(f"<MIXTURE> {mi + 1} %.6e\n" % wt)
                    self.write_mixpdf(mp)
        if si.dur is not None:
            self.w(f"<DURATION> {len(si.dur)}\n{_fmt_vec(si.dur)}\n")

    def write_state(self, si: StateInfo):
        ref = self.shared.get(id(si))
        if ref and ref[0] == "s":
            self.w(f'~s "{ref[1]}"\n')
            return
        self._write_state_body(si)

    def _write_transp_body(self, tp: np.ndarray):
        n = tp.shape[0]
        self.w(f"<TRANSP> {n}\n")
        for i in range(n):
            self.w(_fmt_vec(tp[i]) + "\n")

    def write_transp(self, tp: np.ndarray):
        ref = self.shared.get(id(tp))
        if ref and ref[0] == "t":
            self.w(f'~t "{ref[1]}"\n')
            return
        self._write_transp_body(tp)

    def write_hmm(self, h: HMMDef):
        self.w("<BEGINHMM>\n")
        self.w(f"<NUMSTATES> {h.nstates}\n")
        for i, si in enumerate(h.states):
            self.w(f"<STATE> {i + 2}\n")
            self.write_state(si)
        self.write_transp(h.transp)
        if h.dur is not None:
            ref = self.shared.get(id(h.dur))
            if ref and ref[0] == "d":
                self.w(f'~d "{ref[1]}"\n')
            else:
                self.w(f"<DURATION> {len(h.dur)}\n{_fmt_vec(h.dur)}\n")
        self.w("<ENDHMM>\n")

    def write_all(self):
        hs = self.hset
        self.write_options()
        # shared macro definitions first, in HTK's conventional order
        for mac in ("u", "v", "i", "w", "d", "m", "t", "s"):
            for name, obj in hs.macros.get(mac, {}).items():
                self.w(f'~{mac} "{name}"\n')
                if mac == "m":
                    self._write_mixpdf_body(obj)
                elif mac == "s":
                    self._write_state_body(obj)
                elif mac == "t":
                    self._write_transp_body(obj)
                elif mac == "u":
                    self.w(f"<MEAN> {len(obj)}\n{_fmt_vec(obj)}\n")
                elif mac in ("v",):
                    self.w(f"<VARIANCE> {len(obj)}\n{_fmt_vec(obj)}\n")
                elif mac == "i":
                    n = obj.shape[0]
                    self.w(f"<INVCOVAR> {n}\n")
                    for i in range(n):
                        self.w(_fmt_vec(obj[i, i:]) + "\n")
                elif mac == "w":
                    self.w(f"<SWEIGHTS> {len(obj)}\n{_fmt_vec(obj)}\n")
                elif mac == "d":
                    self.w(f"<DURATION> {len(obj)}\n{_fmt_vec(obj)}\n")
        for name, h in hs.hmms.items():
            self.w(f'~h "{name}"\n')
            self.write_hmm(h)


def save_mmf(hset: HMMSet, path: str, binary: bool = False) -> None:
    """Write the complete HMMSet as one MMF (HModel.c : SaveHMMSet).

    binary=True (the tools' -B flag) writes the fast binary form — see
    load_mmf for the format caveat.
    """
    if binary:
        import pickle

        with open(path, "wb") as f:
            f.write(_BMMF_MAGIC)
            pickle.dump(hset, f, protocol=4)
        return
    with open(path, "w") as f:
        _Writer(hset, f).write_all()
