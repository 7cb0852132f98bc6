"""HCopy — copy/convert speech files (feature extraction CLI).

Mirrors `HTKTools/HCopy.c`: each (src, tgt) pair is read via the HParm
buffer (waveform -> TARGETKIND conversion happens here) and written as an
HTK feature file. Multiple sources can be concatenated with `+`. The scp
form lists `src tgt` pairs per line.

Usage: HCopy [options] src [ + src2 ...] tgt  or  -S scp (src tgt pairs)

Supported options (HCopy.c):
  -t      (trace)  via -T
  Standard: -A -C -D -S -T -V
Config: TARGETKIND, SOURCEFORMAT, SOURCERATE, SAVECOMPRESSED (_C),
SAVEWITHCRC (_K), plus all HPARM frontend keys.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..io import parmkind as pk
from ..io.htkfeat import write_htk_file
from ..utils.cli import Option, parse_args, tool_main
from ..utils.errors import HError
from ._common import force_platform_from_env, open_speech_file

USAGE = "Usage: HCopy [options] src [ + src2 ...] tgt\n       HCopy [options] -S scp"


def run(argv: List[str]) -> int:
    force_platform_from_env()
    ta = parse_args("HCopy", argv, {}, usage=USAGE)
    cfg = ta.config

    pairs = []
    if ta.script:
        toks = ta.script
        if len(toks) % 2:
            HError(1030, "HCopy: -S script must hold src tgt pairs")
        pairs = [(toks[i], toks[i + 1]) for i in range(0, len(toks), 2)]
    args = ta.args
    if args:
        # src [+ src2 ...] tgt
        srcs, tgt = args[:-1], args[-1]
        srcs = [s for s in srcs if s != "+"]
        if not srcs:
            HError(1030, "HCopy: no source files\n%s", USAGE)
        pairs.append((tuple(srcs), tgt))
    if not pairs:
        HError(1030, "HCopy: no files to process\n%s", USAGE)

    save_comp = cfg.bool_("SAVECOMPRESSED", False, module="HPARM")
    save_crc = cfg.bool_("SAVEWITHCRC", False, module="HPARM")

    for src, tgt in pairs:
        srcs = src if isinstance(src, tuple) else (src,)
        chunks = []
        period = None
        kind = None
        for s in srcs:
            feats, period, kind, e = open_speech_file(s, cfg)
            chunks.append(feats)
        data = np.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
        out_kind = kind
        if save_comp:
            out_kind |= pk.HASCOMPX
        if save_crc:
            out_kind |= pk.HASCRCC
        write_htk_file(tgt, data, period, out_kind)
        if ta.trace:
            print(
                f"{' + '.join(srcs)} -> {tgt} "
                f"[{data.shape[0]} frames, {data.shape[1]} dim, "
                f"{pk.parmkind2str(out_kind)}]"
            )
    return 0


main = tool_main(run)

if __name__ == "__main__":
    raise SystemExit(main())
