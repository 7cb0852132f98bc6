"""Condensed end-to-end pipeline test through the tool entry points.

A fast (in-process) version of recipes/demo/run_demo.sh: synthesize a
tiny corpus, run HCopy -> HCompV -> HERest x2 -> HBuild -> HVite ->
HResults via each tool's run() and assert perfect recognition. Guards
the whole tool surface against wiring regressions on every pytest run.
"""

import math
import os
import struct

import numpy as np
import pytest

from htk_tpu.tools import hbuild, hcompv, hcopy, herest, hresults, hvite

FREQS = {"aa": 500.0, "iy": 1500.0, "sil": 0.0}


def synth(phs, rng):
    out = []
    for p in phs:
        f = FREQS[p]
        n = 1200 if p != "sil" else 640
        t = np.arange(n) / 16000.0
        if f:
            x = 2800 * np.sin(2 * math.pi * f * t) + 140 * rng.normal(size=n)
        else:
            x = 180 * rng.normal(size=n)
        out.append(x)
    return np.concatenate(out).astype(np.int16)


def write_wav(path, x):
    data = x.astype("<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    open(path, "wb").write(hdr + data)


@pytest.fixture
def corpus(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(5)
    words = {"A": ["aa"], "I": ["iy"]}
    word_seqs = []
    for i in range(6):
        ws = [["A", "I"][int(x)] for x in rng.integers(0, 2, size=2)]
        phs = ["sil"]
        for w in ws:
            phs += words[w] + ["sil"]
        word_seqs.append(ws)
        write_wav(f"u{i}.wav", synth(phs, rng))
        with open("phones.mlf", "a") as f:
            if i == 0:
                f.write("#!MLF!#\n")
            f.write(f'"*/u{i}.lab"\n' + "\n".join(phs) + "\n.\n")
    with open("words.mlf", "w") as f:
        f.write("#!MLF!#\n")
        for i, ws in enumerate(word_seqs):
            f.write(f'"*/u{i}.lab"\n' + "\n".join(ws) + "\n.\n")
    open("copy.scp", "w").write(
        "\n".join(f"u{i}.wav u{i}.mfc" for i in range(6))
    )
    open("train.scp", "w").write("\n".join(f"u{i}.mfc" for i in range(6)))
    open("monophones", "w").write("aa\niy\nsil\n")
    open("dict", "w").write("A  aa\nI  iy\nSIL [] sil\n")
    open("wlist", "w").write("A\nI\nSIL\n")
    open("cfg_wav", "w").write("SOURCEFORMAT = WAV\nTARGETKIND = MFCC_E_D_A\n")
    open("cfg", "w").write("TARGETKIND = MFCC_E_D_A\n")

    from htk_tpu.io.mmf import save_mmf
    from htk_tpu.models.proto import make_proto

    save_mmf(make_proto(nstates=5, dim=39, parm_kind="MFCC_E_D_A"), "proto")
    return tmp_path


def test_full_pipeline(corpus, capsys):
    assert hcopy.run(["-C", "cfg_wav", "-S", "copy.scp"]) == 0
    assert hcompv.run(
        ["-C", "cfg", "-f", "0.01", "-m", "-M", "hmm0", "-S", "train.scp",
         "proto"]
    ) == 0
    from htk_tpu.io.mmf import load_mmf, save_mmf
    from htk_tpu.models.proto import clone_proto

    hs = load_mmf("hmm0/proto")
    cl = clone_proto(hs, "proto", ["aa", "iy", "sil"])
    cl.macros["v"]["varFloor1"] = load_mmf("hmm0/vFloors").macros["v"][
        "varFloor1"
    ]
    save_mmf(cl, "hmm0/hmmdefs")

    for it in (1, 2):
        os.makedirs(f"hmm{it}", exist_ok=True)
        assert herest.run(
            ["-C", "cfg", "-I", "phones.mlf", "-H", f"hmm{it - 1}/hmmdefs",
             "-M", f"hmm{it}", "-S", "train.scp", "monophones"]
        ) == 0

    assert hbuild.run(["wlist", "wdnet.slf"]) == 0
    assert hvite.run(
        ["-w", "wdnet.slf", "-p", "-10", "-i", "rec.mlf", "-H",
         "hmm2/hmmdefs", "-S", "train.scp", "dict", "monophones"]
    ) == 0
    assert hresults.run(["-I", "words.mlf", "monophones", "rec.mlf"]) == 0
    out = capsys.readouterr().out
    assert "WORD: %Corr=100.00, Acc=100.00" in out
