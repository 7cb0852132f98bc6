"""HDecode — large-vocabulary cross-word decoder.

Mirrors `HTKLVRec/HDecode.c`'s role (SURVEY.md §2.4) with a TPU-shaped
two-pass architecture instead of HLVRec's token-level LM states:

  pass 1: the dense word-network scan (algo/decode) over a full-vocabulary
          loop weighted by the LM's bigram component, generating a word
          lattice per utterance;
  pass 2: exact trigram best-path over that lattice
          (algo/latops.best_path_trigram).

This mirrors how LVCSR systems actually deploy (bigram/lookahead search +
n-gram rescoring); HLVRec's single-pass trigram tokens are an
implementation detail of scalar CPUs, not a capability difference. The
lattice beam bounds the approximation and is configurable.

Usage: HDecode [options] dictFile hmmList testFiles...

  -w lm     ARPA LM file (bigram drives the search, trigram the rescore)
  -H mmf    load HMM macro file (repeatable)
  -s f      LM scale      -p f  word insertion penalty
  -i mlf    output MLF    -l dir  output/lattice dir
  -z ext    also write the pass-1 lattices
  -t f      lattice beam (default 250)
  -o flags  output label format (accepted)
  Standard: -A -C -D -S -T -V
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..algo.decode import generate_lattice
from ..algo.latops import best_path_trigram
from ..algo.net import compile_network, word_internal_phone_map
from ..io.dictionary import read_dict
from ..io.lm import read_arpa
from ..io.mlf import MLF, Label, Transcription
from ..io.mmf import load_hmm_list, load_mmf
from ..io.slf import write_slf
from ..models.hmmset import compile_hmmset
from ..tools.hbuild import bigram_lattice
from ..utils.cli import Option, parse_args, tool_main
from ..utils.errors import HError, HRError
from ._common import force_platform_from_env, open_speech_file

USAGE = "Usage: HDecode [options] dictFile hmmList testFiles..."

OPTS = {
    "w": Option("w", 1, "ARPA LM file"),
    "H": Option("H", 1, "load MMF", repeatable=True),
    "s": Option("s", 1, "LM scale", typ=float),
    "p": Option("p", 1, "word penalty", typ=float),
    "i": Option("i", 1, "output MLF"),
    "l": Option("l", 1, "output dir"),
    "z": Option("z", 1, "lattice extension"),
    "t": Option("t", 1, "lattice beam", typ=float),
    "o": Option("o", 1, "output format flags"),
}


def run(argv: List[str]) -> int:
    force_platform_from_env()
    ta = parse_args("HDecode", argv, OPTS, min_args=2, usage=USAGE)
    cfg = ta.config
    dict_file, hmm_list_file = ta.args[0], ta.args[1]
    files = ta.script + ta.args[2:]
    if not files:
        HError(1030, "HDecode: no test files\n%s", USAGE)
    if not ta.has("w"):
        HError(1030, "HDecode: ARPA LM (-w) required")
    mmfs = ta.get_all("H")
    if not mmfs:
        HError(1030, "HDecode: at least one -H mmf required")

    hset = load_mmf(mmfs)
    comp = compile_hmmset(hset)
    vocab = read_dict(dict_file)
    load_hmm_list(hmm_list_file)
    lm = read_arpa(ta.get("w"))

    # pass-1 network: back-off bigram loop over the LM's vocabulary
    # intersected with the dictionary
    words = [w for w in lm.vocab if w in vocab.words]
    if not words:
        HError(8621, "HDecode: no LM words found in dictionary")
    lat_net = bigram_lattice(words, lm, "!ENTER", "!EXIT")
    # HTK's HDecode assumes a cross-word-trained set; forcing cross-word
    # expansion on a word-internal set silently swaps word-edge models
    # for ones trained in other positions (FindModel fallback), so here
    # cross-word is opt-in: HNET: FORCECXTEXP = T. CFPHONES lists
    # transparent phones [LC].
    want_x = cfg.bool_("FORCECXTEXP", False, module="HNET") or False
    if want_x:
        cfp = (cfg.str_("CFPHONES", "sp", module="HNET") or "sp").split()
        net = compile_network(lat_net, vocab, comp, cross_word=True,
                              cf_phones=cfp)
    else:
        pmap = word_internal_phone_map(comp.names)
        net = compile_network(lat_net, vocab, comp, phone_map=pmap)
    if ta.trace:
        print(f"HDecode: vocab {len(words)}, network {net.n_states} states, "
              f"{net.n_chains} chains")

    lm_scale = float(ta.get("s", 1.0) or 1.0)
    word_pen = float(ta.get("p", 0.0) or 0.0)
    beam = float(ta.get("t", 250.0) or 250.0)
    period = int(cfg.flt_("TARGETRATE", 100000.0, module="HPARM"))
    out_dir = ta.get("l")
    out_mlf_path = ta.get("i")
    out_mlf = MLF() if out_mlf_path else None

    for fn in files:
        data, _p, _k, e = open_speech_file(fn, cfg)
        lat = generate_lattice(
            net, comp, data, lm_scale, word_pen, lattice_beam=beam,
            frame_period_s=period / 1e7,
        )
        stem = os.path.splitext(os.path.basename(e.logical))[0]
        tr = Transcription(alternatives=[[]])
        if lat is None:
            HRError(8522, "HDecode: no paths for %s", e.logical)
        else:
            if ta.has("z"):
                lat.utterance = stem
                write_slf(lat, os.path.join(out_dir or ".",
                                            f"{stem}.{ta.get('z')}"))
            score, path = best_path_trigram(lat, lm, lm_scale, word_pen)
            for w, t in path:
                tr.alternatives[0].append(Label(name=w, end=int(t * 1e7)))
            if ta.trace:
                print(f"{e.logical}: {' '.join(w for w, _t in path)} "
                      f"[{score:.2f}]")
        if out_mlf is not None:
            out_mlf.add(f"*/{stem}.rec", tr)
    if out_mlf is not None:
        out_mlf.save(out_mlf_path, with_times=False)
    return 0


main = tool_main(run)

if __name__ == "__main__":
    raise SystemExit(main())
