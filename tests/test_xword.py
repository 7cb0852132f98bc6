"""Cross-word triphone network expansion (HNet cross-word case)."""

import numpy as np
import pytest

from htk_tpu.algo.decode import decode
from htk_tpu.algo.net import (_edge_phones, _xword_phones, compile_network,
                              make_context_lookup)
from htk_tpu.io.dictionary import Vocab
from htk_tpu.models.hmmset import compile_hmmset
from htk_tpu.models.proto import clone_proto, make_proto
from htk_tpu.tools.hbuild import word_loop_lattice

from test_decode import emit_frames, separable_set

CF = frozenset({"sp"})


def loop_vocab():
    v = Vocab()
    v.add_pron("A", ["aa"])
    v.add_pron("I", ["iy"])
    v.add_pron("S", ["sil"], out_sym="")
    return v


class TestContextMapping:
    def test_edge_phones_skip_cf(self):
        assert _edge_phones(["aa", "sp"], CF) == ("aa", "aa")
        assert _edge_phones(["sp"], CF) == ("sp", "sp")
        assert _edge_phones(["k", "ae", "t"], CF) == ("k", "t")

    def test_xword_phone_names(self):
        names = ["sil-aa+iy", "aa+iy", "k-ae+t", "k", "ae", "t", "aa", "sp"]
        best = make_context_lookup(names)
        # single-phone word takes both contexts from the neighbours
        assert _xword_phones(["aa"], "sil", "iy", CF, best) == ["sil-aa+iy"]
        # missing triphone falls back down the FindModel chain
        assert _xword_phones(["aa"], "k", "iy", CF, best) == ["aa+iy"]
        # interior phones stay word-internal; edges take cross contexts
        assert _xword_phones(["k", "ae", "t"], None, None, CF, best) == [
            "k", "k-ae+t", "t"]
        # cf phones stay monophone and are skipped for context
        assert _xword_phones(["aa", "sp"], "sil", "iy", CF, best) == [
            "sil-aa+iy", "sp"]


class TestCrossWordNetwork:
    def test_monophone_fallback_parity(self):
        """With a monophone-only set, the cross-word expansion falls back
        to the same models — variant nodes change the structure but not
        the decode result."""
        comp = separable_set()
        lat = word_loop_lattice(["A", "I", "S"])
        v = loop_vocab()
        net_i = compile_network(lat, v, comp)
        net_x = compile_network(lat, v, comp, cross_word=True)
        # with a monophone set every (l, r) variant resolves to the SAME
        # model chain, so the exact variant-dedup collapses the network
        # back to the word-internal size — no interior blow-up
        assert net_x.n_nodes == net_i.n_nodes
        feats = emit_frames(["sil", "aa", "iy", "aa", "sil"], seed=3)
        res_i = decode(net_i, comp, feats)
        res_x = decode(net_x, comp, feats)
        assert res_x is not None
        assert res_x.words == res_i.words == ["A", "I", "A"]
        assert res_x.score == pytest.approx(res_i.score, rel=1e-6)

    def _triphone_set(self, dim=3):
        """Monophones + all l-p+r clones; the correct-context triphones
        are moved onto distinct centers so only cross-word expansion can
        score the matched data well."""
        phones = ["aa", "iy", "sil"]
        tri = [f"{l}-{p}+{r}" for p in ("aa", "iy")
               for l in phones for r in phones]
        hs = make_proto(nstates=4, dim=dim, parm_kind="USER")
        cl = clone_proto(hs, "proto", phones + tri)
        base = {"aa": 5.0, "iy": -5.0, "sil": 0.0}
        for nm, h in cl.hmms.items():
            p = nm.split("-")[-1].split("+")[0]
            c = base[p] + (1.5 if "-" in nm or "+" in nm else 0.0)
            for k, si in enumerate(h.states):
                mp = si.streams[0].mixes[0]
                mp.mean = np.full(dim, c, np.float32) + 0.3 * k
                mp.var = np.full(dim, 0.6, np.float32)
                mp.fix_gconst()
        return compile_hmmset(cl)

    def test_triphones_score_better(self):
        comp = self._triphone_set()
        lat = word_loop_lattice(["A", "I", "S"])
        v = loop_vocab()
        net_i = compile_network(lat, v, comp)
        net_x = compile_network(lat, v, comp, cross_word=True)

        # emit at the *triphone* centers (base + 1.5) for aa/iy, base for sil
        rng = np.random.default_rng(7)
        centers = {"aa": 6.5, "iy": -3.5, "sil": 0.0}
        seq = ["sil", "aa", "iy", "aa", "sil"]
        feats = np.concatenate([
            centers[p] + 0.3 * rng.normal(size=(8, 3)) for p in seq
        ]).astype(np.float32)

        res_i = decode(net_i, comp, feats)
        res_x = decode(net_x, comp, feats)
        assert res_x is not None and res_i is not None
        assert res_x.words == ["A", "I", "A"]
        # word-internal single-phone words only reach monophones: the
        # cross-word net must beat it on triphone-matched data
        assert res_x.score > res_i.score + 10.0
