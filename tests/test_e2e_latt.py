"""In-process e2e for the lattice-era tools: HVite -z, HLRescore, HMMIRest."""

import os

import numpy as np
import pytest

from htk_tpu.tools import hlrescore, hmmirest, hresults, hvite

from test_e2e import corpus  # fixture: tiny trained-ready corpus workdir
from test_e2e import synth, write_wav  # noqa: F401


@pytest.fixture
def trained(corpus):
    """Train 2 quick iterations so decode/lattices are meaningful."""
    from htk_tpu.io.mmf import load_mmf, save_mmf
    from htk_tpu.models.proto import clone_proto
    from htk_tpu.tools import hbuild, hcompv, hcopy, herest

    assert hcopy.run(["-C", "cfg_wav", "-S", "copy.scp"]) == 0
    assert hcompv.run(["-C", "cfg", "-f", "0.01", "-m", "-M", "hmm0",
                       "-S", "train.scp", "proto"]) == 0
    hs = load_mmf("hmm0/proto")
    cl = clone_proto(hs, "proto", ["aa", "iy", "sil"])
    cl.macros["v"]["varFloor1"] = load_mmf("hmm0/vFloors").macros["v"][
        "varFloor1"]
    save_mmf(cl, "hmm0/hmmdefs")
    for it in (1, 2):
        os.makedirs(f"hmm{it}", exist_ok=True)
        assert herest.run(["-C", "cfg", "-I", "phones.mlf",
                           "-H", f"hmm{it - 1}/hmmdefs", "-M", f"hmm{it}",
                           "-S", "train.scp", "monophones"]) == 0
    assert hbuild.run(["wlist", "wdnet.slf"]) == 0
    return corpus


def test_lattice_rescore_mmi_chain(trained, capsys):
    os.makedirs("lats", exist_ok=True)
    assert hvite.run(
        ["-w", "wdnet.slf", "-p", "-8", "-z", "lat", "-l", "lats",
         "-i", "rec.mlf", "-H", "hmm2/hmmdefs", "-S", "train.scp",
         "dict", "monophones"]
    ) == 0
    lats = sorted(os.listdir("lats"))
    assert len(lats) == 6 and lats[0].endswith(".lat")

    # HLRescore best path must agree with 1-best decode
    assert hlrescore.run(
        ["-f", "-i", "resc.mlf", "dict"] + [f"lats/{l}" for l in lats]
    ) == 0
    assert hresults.run(["-I", "words.mlf", "monophones", "resc.mlf"]) == 0
    out = capsys.readouterr().out
    assert "WORD: %Corr=100.00" in out

    # MMI iteration keeps the model decodable at 100%
    os.makedirs("mmi", exist_ok=True)
    assert hmmirest.run(
        ["-I", "phones.mlf", "-r", "lats", "-d", "dict",
         "-H", "hmm2/hmmdefs", "-M", "mmi", "-S", "train.scp",
         "monophones"]
    ) == 0
    assert hvite.run(
        ["-w", "wdnet.slf", "-p", "-8", "-i", "recmmi.mlf",
         "-H", "mmi/hmmdefs", "-S", "train.scp", "dict", "monophones"]
    ) == 0
    assert hresults.run(["-I", "words.mlf", "monophones", "recmmi.mlf"]) == 0
    out = capsys.readouterr().out
    assert "WORD: %Corr=100.00" in out


def test_nbest_to_hresults_d(trained, capsys):
    """HVite -n N-best MLF (/// alternatives) -> HResults -d oracle
    scoring consumes it; oracle %Corr >= 1-best %Corr."""
    assert hvite.run(
        ["-w", "wdnet.slf", "-p", "-8", "-n", "2", "4",
         "-i", "recn.mlf", "-H", "hmm2/hmmdefs", "-S", "train.scp",
         "dict", "monophones"]) == 0
    text = open("recn.mlf").read()
    assert "///" in text  # multiple alternatives written

    def corr(args):
        assert hresults.run(args) == 0
        out = capsys.readouterr().out
        for tok in out.split():
            if tok.startswith("%Corr="):
                return float(tok.split("=")[1].rstrip(","))
        return -1.0

    c1 = corr(["-I", "words.mlf", "monophones", "recn.mlf"])
    cd = corr(["-I", "words.mlf", "-d", "4", "monophones", "recn.mlf"])
    assert cd >= c1
    assert cd == 100.0
