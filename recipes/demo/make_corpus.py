"""Synthesize the demo corpus: 3-word vocabulary over 3 synthetic vowels.

The HTKDemo role (SURVEY.md L7): a tiny self-contained corpus so the full
pipeline can run and be scored without external data. Words are built
from distinct-formant "phones" so a correctly working pipeline reaches
100% accuracy — the recipe asserts that, which makes it an end-to-end
regression test.
"""

import math
import struct
import sys

import numpy as np

FREQS = {"aa": 500.0, "iy": 1500.0, "uw": 2500.0, "sil": 0.0}
WORDS = {"ONE": ["aa", "iy"], "TWO": ["iy", "uw"], "THREE": ["uw", "aa", "iy"]}


def synth(phs, rng):
    out = []
    for p in phs:
        f = FREQS[p]
        n = 1600 if p != "sil" else 800
        t = np.arange(n) / 16000.0
        if f:
            x = 3000 * np.sin(2 * math.pi * f * t) + 150 * rng.normal(size=n)
        else:
            x = 200 * rng.normal(size=n)
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


def main(n_train=10, seed=21):
    rng = np.random.default_rng(seed)
    wnames = list(WORDS)
    word_seqs, phone_seqs = [], []
    for i in range(n_train):
        ws = [wnames[int(x)] for x in rng.integers(0, 3, size=3)]
        phs = ["sil"]
        for w in ws:
            phs += WORDS[w] + ["sil"]
        word_seqs.append(ws)
        phone_seqs.append(phs)
        write_wav(f"u{i}.wav", synth(phs, rng))
    with open("phones.mlf", "w") as f:
        f.write("#!MLF!#\n")
        for i, phs in enumerate(phone_seqs):
            f.write(f'"*/u{i}.lab"\n' + "\n".join(phs) + "\n.\n")
    with open("words.mlf", "w") as f:
        f.write("#!MLF!#\n")
        for i, ws in enumerate(word_seqs):
            f.write(f'"*/u{i}.lab"\n' + "\n".join(ws) + "\n.\n")
    open("copy.scp", "w").write(
        "\n".join(f"u{i}.wav u{i}.mfc" for i in range(n_train)) + "\n"
    )
    open("train.scp", "w").write(
        "\n".join(f"u{i}.mfc" for i in range(n_train)) + "\n"
    )
    open("monophones", "w").write("aa\niy\nuw\nsil\n")
    open("dict", "w").write(
        "ONE  aa iy\nTWO  iy uw\nTHREE  uw aa iy\nSIL [] sil\n"
    )
    open("wlist", "w").write("ONE\nTWO\nTHREE\nSIL\n")

    from htk_tpu.io.mmf import save_mmf
    from htk_tpu.models.proto import make_proto

    save_mmf(make_proto(nstates=5, dim=39, parm_kind="MFCC_E_D_A"), "proto")
    print(f"demo corpus: {n_train} utterances")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
