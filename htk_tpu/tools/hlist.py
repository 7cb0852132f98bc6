"""HList — list the contents of speech files.

Mirrors `HTKTools/HList.c`: prints the source header (-h) and observation
values (-o style listing). Options:

  -h      print header info only
  -i N    items per line (default 10)
  -s f    start frame   -e f  end frame
  Standard: -A -C -D -S -T -V
"""

from __future__ import annotations

from typing import List

from ..io import parmkind as pk
from ..utils.cli import Option, parse_args, tool_main
from ._common import force_platform_from_env, open_speech_file

USAGE = "Usage: HList [options] file ..."

OPTS = {
    "h": Option("h", 0, "print header only"),
    "i": Option("i", 1, "items per line", typ=int),
    "s": Option("s", 1, "start frame", typ=int),
    "e": Option("e", 1, "end frame", typ=int),
}


def run(argv: List[str]) -> int:
    force_platform_from_env()
    ta = parse_args("HList", argv, OPTS, usage=USAGE)
    files = ta.script + ta.args
    per_line = int(ta.get("i", 10) or 10)
    for fn in files:
        data, period, kind, e = open_speech_file(fn, ta.config)
        n, w = data.shape
        print("-" * 72)
        print(f"Source: {e.logical}")
        print(
            f"  Num Samples: {n:>10}   File Format: HTK\n"
            f"  Sample Bytes: {w * 4:>9}   Sample Kind: {pk.parmkind2str(kind)}\n"
            f"  Sample Period: {period / 10.0:>8.1f} us"
        )
        if not ta.has("h"):
            s = int(ta.get("s", 0) or 0)
            last = int(ta.get("e", n - 1) if ta.has("e") else n - 1)
            for t in range(s, min(last + 1, n)):
                row = data[t]
                print(f"{t:5d}: ", end="")
                for j in range(0, w, per_line):
                    if j:
                        print(" " * 8, end="")
                    print(" ".join(f"{v:8.3f}" for v in row[j : j + per_line]))
    print("-" * 72)
    return 0


main = tool_main(run)

if __name__ == "__main__":
    raise SystemExit(main())
