"""Native codec tests (skipped when no C++ toolchain is available)."""

import numpy as np
import pytest

from htk_tpu.io import parmkind as pk
from htk_tpu.io.htkfeat import _crc16, read_htk_file, write_htk_file
from htk_tpu.native import get_htkio, load_corpus_batch

needs_native = pytest.mark.skipif(get_htkio() is None,
                                  reason="no C++ toolchain")


@needs_native
class TestNative:
    def test_crc_matches_python(self):
        lib = get_htkio()
        for blob in (b"", b"x", b"hello world", bytes(range(256))):
            assert lib.htkio_crc16(blob, len(blob)) == _crc16(blob)

    def test_batch_load_uncompressed(self, tmp_path):
        rng = np.random.default_rng(0)
        paths = []
        refs = []
        for i in range(4):
            x = rng.normal(size=(30 + i, 7)).astype(np.float32)
            p = str(tmp_path / f"u{i}.mfc")
            write_htk_file(p, x, 100000, pk.str2parmkind("USER_E"))
            paths.append(p)
            refs.append(x)
        arena, frames, periods, kinds = load_corpus_batch(paths, 40, 7)
        for i in range(4):
            assert frames[i] == 30 + i
            assert periods[i] == 100000
            np.testing.assert_array_equal(arena[i, : 30 + i], refs[i])

    def test_batch_load_compressed(self, tmp_path):
        rng = np.random.default_rng(1)
        x = (rng.normal(size=(50, 13)) * 8).astype(np.float32)
        p = str(tmp_path / "c.mfc")
        write_htk_file(p, x, 100000, pk.str2parmkind("MFCC_E_C"))
        arena, frames, _periods, kinds = load_corpus_batch([p], 64, 13)
        assert frames[0] == 50
        ref = read_htk_file(p)
        np.testing.assert_allclose(arena[0, :50], ref.data, atol=1e-5)

    def test_missing_file_reports_error(self, tmp_path):
        arena, frames, _p, _k = load_corpus_batch(
            [str(tmp_path / "nothere.mfc")], 10, 4
        )
        assert frames[0] < 0


class TestMLFMarks:
    def test_native_mlf_equals_pure(self, tmp_path):
        """The C MLF scanner fast path produces identical entries to the
        pure-Python reader (which it silently replaces when available)."""
        import htk_tpu.native as N
        from htk_tpu.io.mlf import MLF

        p = tmp_path / "big.mlf"
        with open(p, "w") as f:
            f.write("#!MLF!#\n")
            for i in range(200):
                f.write(f'"*/u{i}.lab"\n')
                f.write("0 1000000 aa -12.5\n///\nsil\n.\n")
        m1 = MLF.load(str(p))
        saved = N.get_htkio
        try:
            N.get_htkio = lambda: None
            m2 = MLF.load(str(p))
        finally:
            N.get_htkio = saved
        assert len(m1.entries) == len(m2.entries) == 200
        for (pa, ta), (pb, tb) in zip(m1.entries, m2.entries):
            assert pa == pb
            assert len(ta.alternatives) == len(tb.alternatives) == 2
            la = [(l.name, l.start, l.end, l.score) for l in ta.labels]
            lb = [(l.name, l.start, l.end, l.score) for l in tb.labels]
            assert la == lb
