"""Shared helper for the experiment scripts: load repo-root bench.py as
a module (probe policy, chip lock, history fingerprints) from ONE place
so the loader can't drift between the runner and the probes."""

from __future__ import annotations

import importlib.util
import os


def load_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "am_bench", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
