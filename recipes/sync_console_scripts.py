"""Sync console scripts in the active venv with pyproject entry points.

The image's venv was provisioned once; tools added later (Cluster,
LGPrep, ...) have pyproject [project.scripts] entries but no launcher in
$VENV/bin until the package is reinstalled. This writes the missing
launchers directly (no pip needed). Idempotent.

Usage: python recipes/sync_console_scripts.py [--venv /opt/venv]
"""

import os
import re
import sys


def main() -> int:
    venv = sys.prefix
    if "--venv" in sys.argv:
        venv = sys.argv[sys.argv.index("--venv") + 1]
    root = os.path.join(os.path.dirname(__file__), "..")
    txt = open(os.path.join(root, "pyproject.toml")).read()
    want = dict(re.findall(r'^(\w+) = "([\w\.]+:[\w\.]+)"', txt, re.M))
    bin_dir = os.path.join(venv, "bin")
    made = 0
    for name, target in want.items():
        path = os.path.join(bin_dir, name)
        if os.path.exists(path):
            continue
        mod, fn = target.split(":")
        with open(path, "w") as f:
            f.write(
                f"#!{os.path.join(bin_dir, 'python3')}\n"
                f"import sys\n"
                f"from {mod} import {fn}\n"
                f"if __name__ == '__main__':\n"
                f"    sys.argv[0] = sys.argv[0].removesuffix('.exe')\n"
                f"    sys.exit({fn}())\n"
            )
        os.chmod(path, 0o755)
        made += 1
    print(f"sync_console_scripts: {made} launcher(s) written to {bin_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
