"""Load a module's round-12-start (= r11-shape) source from git.

The r12 optimization round started at commit 9108d09; the five driver-
suspected regressions (VERDICT r12 item 1) compare HEAD against the
shapes that commit held.  ``load(path)`` executes
``git show 9108d09:<path>`` as a fresh module — its absolute
``adhesive_spark.*`` imports resolve against the CURRENT package, which
is what makes the comparison isolate exactly the changed operator.
"""

from __future__ import annotations

import subprocess
import sys
import types

from pathlib import Path

ROOT = str(Path(__file__).resolve().parents[2])
BASE = "9108d09"


def load(relpath: str) -> types.ModuleType:
    src = subprocess.check_output(
        ["git", "-C", ROOT, "show", f"{BASE}:{relpath}"], text=True
    )
    name = "r11_" + relpath.replace("/", "_").removesuffix(".py")
    mod = types.ModuleType(name)
    mod.__file__ = f"<git:{BASE}:{relpath}>"
    sys.modules[name] = mod
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod
