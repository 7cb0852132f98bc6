"""HSGen — generate random sentences from a word network.

Mirrors `HTKTools/HSGen.c`: random walks over an SLF lattice (useful for
checking grammars and estimating perplexity).

Usage: HSGen [options] latFile dictFile

  -n N   number of sentences (default 100)
  -l     include line numbers
  -s     seed [htk_tpu extension for reproducibility]
  Standard: -A -C -D -S -T -V
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from ..io.dictionary import read_dict
from ..io.slf import NULL_WORD, read_slf
from ..utils.cli import Option, parse_args, tool_main
from ..utils.errors import HError

USAGE = "Usage: HSGen [options] latFile dictFile"

OPTS = {
    "n": Option("n", 1, "number of sentences", typ=int),
    "l": Option("l", 0, "line numbers"),
    "s": Option("s", 1, "random seed", typ=int),
}

MAX_LEN = 200


def run(argv: List[str]) -> int:
    ta = parse_args("HSGen", argv, OPTS, min_args=2, usage=USAGE)
    lat = read_slf(ta.args[0])
    read_dict(ta.args[1])  # validated for parity with HTK's arg order
    n = int(ta.get("n", 100) or 100)
    rng = np.random.default_rng(int(ta.get("s", 0) or 0))

    out_arcs = {}
    for a in lat.arcs:
        out_arcs.setdefault(a.start, []).append(a)
    start = lat.start_node()
    end = lat.end_node()
    words_of = {nd.id: nd.word for nd in lat.nodes}

    for i in range(n):
        sent: List[str] = []
        node = start
        steps = 0
        while node != end and steps < MAX_LEN:
            arcs = out_arcs.get(node)
            if not arcs:
                break
            probs = np.array([math.exp(min(a.lmlike, 0.0)) for a in arcs])
            if probs.sum() <= 0:
                probs = np.ones(len(arcs))
            probs = probs / probs.sum()
            a = arcs[int(rng.choice(len(arcs), p=probs))]
            node = a.end
            w = a.word if a.word is not None else words_of.get(node)
            if w and w != NULL_WORD:
                sent.append(w)
            steps += 1
        line = " ".join(sent)
        if ta.has("l"):
            print(f"{i + 1}. {line}")
        else:
            print(line)
    return 0


main = tool_main(run)

if __name__ == "__main__":
    raise SystemExit(main())
