"""Tests for HInit/HRest/HLStats/HDMan/HParse/HSGen/HLEd."""

import numpy as np
import pytest

from htk_tpu.io.dictionary import Vocab, read_dict
from htk_tpu.io.lm import read_arpa
from htk_tpu.io.mlf import Label, Transcription
from htk_tpu.io.slf import read_slf
from htk_tpu.tools.hdman import apply_script
from htk_tpu.tools.hled import LabelEditor
from htk_tpu.tools.hlstats import estimate_backoff_bigram
from htk_tpu.tools.hparse import parse_grammar
from htk_tpu.algo.kmeans import kmeans, segment_kmeans_gmm


class TestKMeans:
    def test_two_clusters(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(50, 2)) + [10, 0]
        b = rng.normal(size=(50, 2)) - [10, 0]
        x = np.concatenate([a, b])
        assign, means = kmeans(x, 2)
        assert len(set(assign[:50])) == 1
        assert len(set(assign[50:])) == 1
        assert assign[0] != assign[50]

    def test_gmm_from_segment(self):
        rng = np.random.default_rng(1)
        x = np.concatenate(
            [rng.normal(size=(60, 3)) + 5, rng.normal(size=(40, 3)) - 5]
        )
        w, m, v = segment_kmeans_gmm(x, 2)
        assert w.sum() == pytest.approx(1.0)
        assert sorted(np.round(m[:, 0] / 5).astype(int).tolist()) == [-1, 1]


class TestHLStats:
    def test_bigram_estimation(self, tmp_path):
        sents = [["a", "b"], ["a", "b"], ["a", "c"], ["b", "a"]]
        lm = estimate_backoff_bigram(sents)
        # P(b|a) should dominate P(c|a)
        assert lm.logp_bi("a", "b") > lm.logp_bi("a", "c")
        # backoff path returns a finite prob for unseen pairs
        assert lm.logp_bi("c", "b") > -50
        # ARPA roundtrip
        from htk_tpu.io.lm import write_arpa

        p = str(tmp_path / "lm.arpa")
        write_arpa(lm, p)
        lm2 = read_arpa(p)
        assert lm2.logp_bi("a", "b") == pytest.approx(lm.logp_bi("a", "b"), abs=1e-3)


class TestHDMan:
    def test_script_commands(self):
        v = Vocab()
        v.add_pron("HELLO", ["hh", "ax", "l", "ow1"])
        v.add_pron("WORLD", ["w", "er1", "l", "d"])
        apply_script(v, "RS cmu\nAS sp\nRP ax aa\n")
        assert v.words["HELLO"].prons[0].phones == ["hh", "ax", "l", "ow", "sp"]
        assert v.words["WORLD"].prons[0].phones == ["w", "er", "l", "d", "sp"]
        apply_script(v, "MP axl ax l\n")
        assert v.words["HELLO"].prons[0].phones == ["hh", "axl", "ow", "sp"]
        apply_script(v, "DP sp\n")
        assert v.words["HELLO"].prons[0].phones[-1] == "ow"


class TestHParse:
    def test_digit_loop(self, tmp_path):
        g = """
        $digit = one | two | three;
        ( sent-start < $digit > sent-end )
        """
        lat = parse_grammar(g)
        words = {n.word for n in lat.nodes}
        assert {"one", "two", "three", "sent-start", "sent-end"} <= words
        assert lat.start_node() is not None
        # network admits repeated digits: check a back arc exists
        # (plus-loop: exit null -> entry null)
        from htk_tpu.io.slf import write_slf

        p = str(tmp_path / "g.slf")
        write_slf(lat, p)
        l2 = read_slf(p)
        assert len(l2.arcs) == len(lat.arcs)

    def test_optional_and_star(self):
        lat = parse_grammar("( [a] {b} c )")
        words = [n.word for n in lat.nodes]
        assert "a" in words and "b" in words and "c" in words

    def test_undefined_var(self):
        from htk_tpu.utils.errors import HTKError

        with pytest.raises(HTKError):
            parse_grammar("( $nope )")


class TestHLEd:
    def test_ex_tc_pipeline(self):
        v = Vocab()
        v.add_pron("ONE", ["w", "ah", "n"])
        v.add_pron("TWO", ["t", "uw"])
        ed = LabelEditor(v)
        ed.parse_script("EX\nIS sil sil\nWB sil\nTC\n")
        tr = Transcription(alternatives=[[Label("ONE"), Label("TWO")]])
        out = ed.apply(tr)
        names = [l.name for l in out.labels]
        assert names == [
            "sil", "w+ah", "w-ah+n", "ah-n+t", "n-t+uw", "t-uw", "sil",
        ]

    def test_wb_blocks_context(self):
        v = Vocab()
        v.add_pron("ONE", ["w", "ah", "n"])
        ed = LabelEditor(v)
        ed.parse_script("EX\nIS sil sil\nWB sil\nTC\n")
        tr = Transcription(alternatives=[[Label("ONE")]])
        out = ed.apply(tr)
        # sil gives no context: w has no left context
        assert out.labels[1].name == "w+ah"
        assert out.labels[3].name == "ah-n"

    def test_merge_replace_delete(self):
        ed = LabelEditor()
        ed.parse_script("RE x y z\nME q a b\nDE junk\n")
        tr = Transcription(
            alternatives=[[Label("y"), Label("a"), Label("b"), Label("junk")]]
        )
        out = ed.apply(tr)
        assert [l.name for l in out.labels] == ["x", "q"]
