"""Experiment-runner stage lifecycle: relay-death vs stage-over-budget
discrimination (VERDICT r4 #4 — pieces-128 was permanently discarded
after 2 rc=124s that a degraded-but-alive relay can legitimately cause),
done-file marker semantics, and the byte-scaled retry budget."""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _runner_module():
    spec = importlib.util.spec_from_file_location(
        "run_staging_experiments",
        REPO / "benches" / "run_staging_experiments.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_classify_stage_timeout():
    mod = _runner_module()
    # rc=124 with a live relay: the stage was slower than its budget
    assert mod.classify_stage_timeout(124, True) == "over-budget"
    # rc=124 and the probe fails: relay death
    assert mod.classify_stage_timeout(124, False) == "relay-dead"
    # rc=3 means bench.py's own bounded probes already failed — dead by
    # construction regardless of what a later probe says
    assert mod.classify_stage_timeout(3, True) == "relay-dead"
    assert mod.classify_stage_timeout(3, False) == "relay-dead"


def test_overbudget_timeout_scales_with_bytes():
    mod = _runner_module()
    # 3392 MB at the 4 MB/s worst degraded rate = 848 s on top of base
    assert mod.overbudget_timeout(3392, 2400) == 2400 + 3392 / 4.0
    # small stages keep essentially their base budget
    assert mod.overbudget_timeout(0, 600) == 600


def test_done_file_markers_are_disjoint(tmp_path, monkeypatch):
    mod = _runner_module()
    monkeypatch.setattr(mod, "DONE", str(tmp_path / ".done"))
    mod._mark_done("a")
    mod._mark_failed("b")
    mod._mark_errored("c")
    mod._mark_slow("d")
    mod._mark_slow("d")
    assert mod._done_stages() == {"a"}
    assert mod._fail_counts() == {"b": 1}
    assert mod._errored_stages() == {"c"}
    assert mod._slow_counts() == {"d": 2}


def _silence_log(mod, monkeypatch, lines):
    monkeypatch.setattr(mod, "log", lambda msg: lines.append(msg))


def test_overbudget_stage_retries_then_reports(tmp_path, monkeypatch):
    """A stage that times out twice with a LIVE relay must be retried
    once with a byte-scaled timeout, then reported as over-budget (rc
    string, runner exits 1) — never as a relay death (exit 3)."""
    mod = _runner_module()
    monkeypatch.setattr(mod, "DONE", str(tmp_path / ".done"))
    lines = []
    _silence_log(mod, monkeypatch, lines)
    monkeypatch.setattr(mod, "wait_for_relay", lambda *a, **k: True)
    monkeypatch.setattr(mod, "probe_backend_once", lambda t: True)
    monkeypatch.setattr(
        mod, "stages",
        lambda: [("pieces-128", ["x"], {"VARIANT_BUDGET": "900"},
                  2400, 3392)],
    )
    calls = []

    def fake_run(cmd, env_extra=None, timeout_s=None):
        calls.append((env_extra, timeout_s))
        return 124

    monkeypatch.setattr(mod, "run", fake_run)
    assert mod.main() == 1
    # attempt 1: base budget; attempt 2: doubled inner variant budget
    # with the outer timeout raised to dominate the variants' combined
    # inner allowance (5 default variants × 1800 s + setup slack beats
    # the byte-scaled 2400 + 3392/4 estimate)
    assert calls[0][1] == 2400
    assert calls[1][1] == 5 * 1800 + mod.PROBE_SETUP_S
    assert calls[1][0]["VARIANT_BUDGET"] == "1800"
    assert len(calls) == 2
    # reported reason is over-budget, not attempts-exhausted/relay-death
    done = (tmp_path / ".done").read_text().splitlines()
    assert done.count("pieces-128!slow") == 2
    assert "pieces-128!err" in done
    assert "pieces-128!fail" not in done


def test_dead_relay_timeout_still_exits_3(tmp_path, monkeypatch):
    """rc=124 with a post-timeout probe that FAILS is a relay death:
    mark !fail and exit 3 for the supervisor."""
    mod = _runner_module()
    monkeypatch.setattr(mod, "DONE", str(tmp_path / ".done"))
    _silence_log(mod, monkeypatch, [])
    monkeypatch.setattr(mod, "wait_for_relay", lambda *a, **k: True)
    monkeypatch.setattr(mod, "probe_backend_once", lambda t: False)
    monkeypatch.setattr(
        mod, "stages", lambda: [("s", ["x"], None, 600, 100)]
    )
    monkeypatch.setattr(
        mod, "run", lambda cmd, env_extra=None, timeout_s=None: 124
    )
    assert mod.main() == 3
    assert (tmp_path / ".done").read_text().splitlines() == ["s!fail"]


def test_slow_marker_resumes_with_scaled_budget(tmp_path, monkeypatch):
    """A !slow marker from a run that died before its retry must make
    the restart use the byte-scaled budget immediately."""
    mod = _runner_module()
    done = tmp_path / ".done"
    done.write_text("s!slow\n")
    monkeypatch.setattr(mod, "DONE", str(done))
    _silence_log(mod, monkeypatch, [])
    monkeypatch.setattr(mod, "wait_for_relay", lambda *a, **k: True)
    monkeypatch.setattr(
        mod, "stages", lambda: [("s", ["x"], None, 600, 400)]
    )
    calls = []

    def fake_run(cmd, env_extra=None, timeout_s=None):
        calls.append(timeout_s)
        return 0

    monkeypatch.setattr(mod, "run", fake_run)
    assert mod.main() == 0
    assert calls == [600 + 400 / 4.0]
    assert "s" in mod._done_stages()


def test_exhausted_slow_attempts_skip_stage(tmp_path, monkeypatch):
    """Two burned over-budget attempts (crash before !err landed) must
    skip the stage instead of retrying forever."""
    mod = _runner_module()
    done = tmp_path / ".done"
    done.write_text("s!slow\ns!slow\n")
    monkeypatch.setattr(mod, "DONE", str(done))
    _silence_log(mod, monkeypatch, [])
    monkeypatch.setattr(mod, "wait_for_relay", lambda *a, **k: True)
    monkeypatch.setattr(
        mod, "stages", lambda: [("s", ["x"], None, 600, 400)]
    )
    ran = []
    monkeypatch.setattr(
        mod, "run",
        lambda cmd, env_extra=None, timeout_s=None: ran.append(1) or 0,
    )
    assert mod.main() == 1
    assert not ran


def test_stage_order_puts_evidence_before_sweeps():
    """VERDICT r4 #1: the cheap high-value stages (spectrogram first
    fingerprint, config-#2 latency, mulaw8 legs) must run BEFORE the
    multi-GB fence/piece sweeps that starved them in round 4."""
    mod = _runner_module()
    names = [s[0] for s in mod.stages()]
    assert names[0] == "canonical-int16"  # headline can't be hostage
    assert names.index("spectrogram") < names.index("fence-ab")
    assert names.index("latency-mulaw8") < names.index("fence-ab")
    assert names.index("literal3-mulaw8") < names.index("fence-ab")
    assert names.index("canonical-mulaw8") < names.index("fence-ab")
    assert names.index("fence-ab") < names.index("pieces-128")
    # serial A/B stages exist with 3 interleaved rounds per variant
    (s3392,) = [s for s in mod.stages() if s[0] == "serial-ab-3392"]
    assert s3392[2]["VARIANTS"].split(",") == ["serial", "bench"] * 3
    # every stage carries a positive byte-volume hint
    assert all(s[4] > 0 for s in mod.stages())


def test_canonical_int16_stage_pins_the_wire():
    """bench.py's default wire is mulaw8 (PERF.md wire recommendation) —
    the canonical-int16 stage must pin int16 explicitly or it silently
    duplicates canonical-mulaw8 and the int16 lineage's regression gate
    never gets a new entry."""
    mod = _runner_module()
    (stage,) = [s for s in mod.stages() if s[0] == "canonical-int16"]
    assert (stage[2] or {}).get("BENCH_TRANSFER_DTYPE") == "int16"
    # every other wire-named bench stage pins its wire too
    for name, _, env, _, _ in mod.stages():
        for wire in ("int16", "mulaw8"):
            if name.endswith(wire) or f"-{wire}-" in name:
                assert (env or {}).get("BENCH_TRANSFER_DTYPE") == wire, name


def test_overbudget_retry_scales_probe_variant_budget(tmp_path, monkeypatch):
    """A stage that declares VARIANT_BUDGET must have it doubled on its
    over-budget retry — otherwise the retry re-runs into the same inner
    per-variant budget and hits the identical rc=124 — and the OUTER
    timeout must dominate the variants' combined inner allowance, or the
    retry promises the variants more time than the outer timeout permits
    and gets SIGKILLed mid-variant despite never violating its own
    budget (burning the stage's second over-budget attempt)."""
    mod = _runner_module()
    done = tmp_path / ".done"
    done.write_text("f!slow\n")
    monkeypatch.setattr(mod, "DONE", str(done))
    _silence_log(mod, monkeypatch, [])
    monkeypatch.setattr(mod, "wait_for_relay", lambda *a, **k: True)
    monkeypatch.setattr(
        mod, "stages",
        lambda: [("f", ["py", "benches/probe_staging_fence.py"],
                  {"VARIANT_BUDGET": "900"}, 600, 400)],
    )
    envs, timeouts = [], []

    def fake_run(cmd, env_extra=None, timeout_s=None):
        envs.append(env_extra)
        timeouts.append(timeout_s)
        return 0

    monkeypatch.setattr(mod, "run", fake_run)
    assert mod.main() == 0
    assert envs[0]["VARIANT_BUDGET"] == str(int(900 * 2))
    # 5 default variants each allowed 1800 s inner: the outer timeout
    # must cover all of them plus setup slack, not just the byte-scaled
    # estimate (600 + 400/4 = 700 s here)
    assert timeouts[0] >= 5 * 1800 + mod.PROBE_SETUP_S


def test_scaled_probe_budgets_coherence():
    """Inner × variant-count + setup slack never exceeds the returned
    outer timeout, for explicit VARIANTS lists and the probe default."""
    mod = _runner_module()
    # explicit 6-variant list at slow_n=1: inner 1200→2400
    env, outer = mod.scaled_probe_budgets(
        {"VARIANT_BUDGET": "1200", "VARIANTS": ",".join(["a", "b"] * 3)},
        1, 5223,
    )
    assert env["VARIANT_BUDGET"] == "2400"
    assert outer >= 6 * 2400 + mod.PROBE_SETUP_S
    # no VARIANTS env: the probe's own default set runs
    env, outer = mod.scaled_probe_budgets({"VARIANT_BUDGET": "900"}, 1, 700)
    assert env["VARIANT_BUDGET"] == "1800"
    assert outer >= mod.N_DEFAULT_PROBE_VARIANTS * 1800 + mod.PROBE_SETUP_S
    # an already-generous outer timeout is kept verbatim
    env, outer = mod.scaled_probe_budgets(
        {"VARIANT_BUDGET": "10", "VARIANTS": "a"}, 1, 99999,
    )
    assert outer == 99999
    # every REAL stage's retry stays coherent at both over-budget depths
    for name, _, env, timeout_s, bytes_mb in mod.stages():
        if not env or "VARIANT_BUDGET" not in env:
            continue
        for slow_n in (1, 2):
            base = mod.overbudget_timeout(bytes_mb, timeout_s)
            scaled_env, outer = mod.scaled_probe_budgets(env, slow_n, base)
            inner = float(scaled_env["VARIANT_BUDGET"])
            n_var = (
                len(env["VARIANTS"].split(","))
                if env.get("VARIANTS")
                else mod.N_DEFAULT_PROBE_VARIANTS
            )
            assert outer >= n_var * inner + mod.PROBE_SETUP_S, name


def test_probe_stages_declare_variant_budget():
    """The over-budget retry path detects probe stages by their
    VARIANT_BUDGET declaration (no argv sniffing): every stage whose
    argv targets a probe script must declare one, and the hardcoded
    default-variant count must match the probe module's VARIANTS."""
    mod = _runner_module()
    for name, cmd, env, _, _ in mod.stages():
        if any("probe_" in c for c in cmd):
            assert env and "VARIANT_BUDGET" in env, name

    spec = importlib.util.spec_from_file_location(
        "probe_staging_fence",
        REPO / "benches" / "probe_staging_fence.py",
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    assert mod.N_DEFAULT_PROBE_VARIANTS == len(probe.VARIANTS)
