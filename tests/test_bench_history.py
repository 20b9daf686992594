"""bench.py history tracking: the regression gate must compare against a
rolling best so successive sub-threshold drops can't compound undetected
and a regressed run never becomes the new baseline (criterion's tracked-
history role, reference benches/my_benchmark.rs)."""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _bench_module():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _entries(path):
    return [json.loads(line) for line in Path(path).read_text().splitlines()]


def _run(mod, path, value):
    mod.record_history(
        {"device_resident_value": value}, {"cfg": 1}, path=str(path)
    )


def test_compounding_drops_are_flagged(tmp_path):
    mod = _bench_module()
    hist = tmp_path / "history.jsonl"
    _run(mod, hist, 10.0)
    _run(mod, hist, 8.6)  # -14% vs best: below threshold, no flag
    assert "regression" not in _entries(hist)[-1]
    _run(mod, hist, 7.4)  # -14% vs previous but -26% vs rolling best
    assert _entries(hist)[-1].get("regression") is True


def test_regressed_run_does_not_become_baseline(tmp_path):
    mod = _bench_module()
    hist = tmp_path / "history.jsonl"
    _run(mod, hist, 10.0)
    _run(mod, hist, 7.0)  # -30%: flagged
    assert _entries(hist)[-1].get("regression") is True
    # a "recovery" to 8.0 is still -20% vs the 10.0 baseline — flagged,
    # because the regressed 7.0 entry is skipped when picking the best
    _run(mod, hist, 8.0)
    assert _entries(hist)[-1].get("regression") is True
    _run(mod, hist, 9.8)  # genuine recovery within threshold
    assert "regression" not in _entries(hist)[-1]


def test_sustained_regression_never_rebaselines(tmp_path):
    """Even after the 5-entry window holds only flagged runs, the gate
    reaches back to the newest clean entry — a 33% sustained drop keeps
    flagging forever instead of quietly becoming the baseline."""
    mod = _bench_module()
    hist = tmp_path / "history.jsonl"
    _run(mod, hist, 30.0)
    for _ in range(7):
        _run(mod, hist, 20.0)
        assert _entries(hist)[-1].get("regression") is True
    _run(mod, hist, 29.0)  # genuine recovery vs the 30.0 baseline
    assert "regression" not in _entries(hist)[-1]


def test_distinct_fingerprints_do_not_interact(tmp_path):
    mod = _bench_module()
    hist = tmp_path / "history.jsonl"
    _run(mod, hist, 10.0)
    mod.record_history(
        {"device_resident_value": 1.0}, {"cfg": 2}, path=str(hist)
    )
    assert "regression" not in _entries(hist)[-1]
