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


def test_no_backend_failure_carries_last_good(tmp_path, monkeypatch, capsys):
    """A relay outage must not erase the round's number: the failure JSON
    carries the newest same-fingerprint, non-regressed history entry
    (VERDICT r3 #2 — BENCH_r03 recorded parsed=null while a fresh
    25.4/32.0 run sat in history)."""
    import pytest

    mod = _bench_module()
    hist = tmp_path / "history.jsonl"
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(hist))
    fp = mod.expected_fingerprint(mod.make_config())
    good = {
        "tag": "bench",
        "when": "2026-08-17T19:00:00+00:00",
        "fingerprint": fp,
        "result": {"device_resident_value": 32.0, "value": 25.4},
    }
    newer_good = dict(good, when="2026-08-17T22:00:00+00:00",
                      result={"device_resident_value": 32.5, "value": 25.9})
    flagged = dict(good, when="2026-08-17T23:00:00+00:00",
                   result={"device_resident_value": 9.0}, regression=True)
    other = dict(good, fingerprint={**fp, "queries": fp["queries"] + 1},
                 result={"device_resident_value": 99.0})
    hist.write_text(
        "\n".join(json.dumps(r) for r in (good, newer_good, flagged, other))
        + "\n"
    )
    with pytest.raises(SystemExit) as exc:
        mod._fail_no_backend(600.0)
    assert exc.value.code == 3
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is False
    assert out["fingerprint"] == fp
    # newest same-fingerprint entry wins; flagged and foreign ones don't
    assert out["last_good"]["result"]["device_resident_value"] == 32.5


def test_no_backend_failure_with_empty_history(tmp_path, monkeypatch, capsys):
    import pytest

    mod = _bench_module()
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(tmp_path / "none.jsonl"))
    with pytest.raises(SystemExit) as exc:
        mod._fail_no_backend(600.0)
    assert exc.value.code == 3
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is False and out["last_good"] is None


def test_spectrogram_fingerprint_is_disjoint_and_mode_dispatched(
    monkeypatch,
):
    """BENCH_MODE=spectrogram entries must never share a fingerprint with
    pcm entries (the regression gate compares same-fingerprint runs), and
    the no-backend failure path must look up the RIGHT mode's history."""
    mod = _bench_module()
    pcm = mod.expected_fingerprint(mod.make_config())
    spec = mod.expected_fingerprint_spec(mod.make_spec_config())
    assert spec["mode"] == "spectrogram" and "mode" not in pcm
    assert spec != pcm
    assert mod.current_fingerprint() == pcm
    monkeypatch.setenv("BENCH_MODE", "spectrogram")
    assert mod.current_fingerprint() == spec


def test_bench_spectrogram_mode_end_to_end(tmp_path, monkeypatch, capsys):
    """BENCH_MODE=spectrogram runs the full bench body on the CPU backend
    at a tiny shape: plants found, JSON emitted, fingerprinted history
    entry appended (VERDICT r3 #5 — config #4 now sits under the same
    regression gate as the pcm path)."""
    monkeypatch.setenv("BENCH_MODE", "spectrogram")
    monkeypatch.setenv("BENCH_EPISODE_SECS", "60")
    monkeypatch.setenv("BENCH_EPISODES", "2")
    monkeypatch.setenv("BENCH_QUERIES", "2")
    hist = tmp_path / "history.jsonl"
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(hist))
    mod = _bench_module()  # re-exec so EPISODE_SECS picks up the env
    assert mod.main_spectrogram() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True and out["value"] > 0
    assert "spectrogram" in out["metric"]
    (entry,) = _entries(hist)
    assert entry["fingerprint"]["mode"] == "spectrogram"
    assert entry["result"]["device_resident_value"] > 0


def test_bench_pcm_mode_end_to_end(tmp_path, monkeypatch, capsys):
    """The default (pcm) bench body runs end-to-end on the CPU backend at
    a tiny shape — guards the shared _measure_staged_scan/check_plants
    scaffold both gated modes now go through."""
    monkeypatch.setenv("BENCH_EPISODE_SECS", "60")
    monkeypatch.setenv("BENCH_EPISODES", "2")
    monkeypatch.setenv("BENCH_QUERIES", "2")
    # compiled-on-CPU impls (the production vpu+pallas pair would run the
    # pallas interpreter here — minutes instead of seconds)
    monkeypatch.setenv("BENCH_FFT_IMPL", "xla_packed")
    monkeypatch.setenv("BENCH_PEAKS_IMPL", "jnp")
    hist = tmp_path / "history.jsonl"
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(hist))
    mod = _bench_module()
    # skip backend acquisition (separately tested): its probe SUBPROCESS
    # inherits PALLAS_AXON_POOL_IPS and would retry the axon relay for
    # the whole BENCH_BACKEND_BUDGET — the in-process backend is already
    # the conftest CPU mesh
    monkeypatch.setattr(mod, "acquire_backend", lambda *a, **k: None)
    assert mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True and out["value"] > 0
    (entry,) = _entries(hist)
    assert entry["fingerprint"]["fft_impl"] == "xla_packed"
    assert "mode" not in entry["fingerprint"]
    # staging-weather annotation (VERDICT r4 #6): every history entry
    # must be able to self-explain an e2e outlier
    res = entry["result"]
    assert res["stage_secs"] > 0 and res["staged_mb"] > 0
    assert res["stage_mb_s"] > 0 and res["scan_secs"] > 0
    # every entry (clamped or not) records its exact denominator so
    # future clamps read it back instead of reconstructing from rounded
    # value/vs ratios; unclamped entries omit the *_measured twin
    assert res["cpu_baseline"] > 0
    assert "cpu_baseline_measured" not in res


class _FakeStageScanner:
    """Minimal scanner for _measure_staged_scan: real CPU jax arrays (so
    block_until_ready/delete are exercised), counts stage calls, and
    fails the scan if the kept buffer was deleted."""

    def __init__(self):
        self.stage_calls = 0
        self.live_at_stage = []  # live prior buffers when each stage starts
        self._devs = []

    def stage_resident(self, episodes):
        import jax
        import numpy as np

        self.stage_calls += 1
        self.live_at_stage.append(
            sum(1 for d in self._devs if not d.is_deleted())
        )
        dev = jax.device_put(
            np.full(1024, self.stage_calls, np.int16)
        )
        self._devs.append(dev)
        return dev, np.array([1024] * len(episodes)), len(episodes)

    def scan_staged(self, staged, scale=True):
        import numpy as np

        dev, ns, n_real = staged
        # a deleted buffer raises here — proves the WINNING attempt
        # survived the losers' cleanup
        np.asarray(dev)
        return [[[]] for _ in range(n_real)]


def test_stage_weather_retry_keeps_best_attempt(monkeypatch):
    """An attempt below BENCH_STAGE_RETRY_MBS re-stages (pre-execution)
    up to BENCH_STAGE_ATTEMPTS times; the extras carry every attempt's
    rate and the scan runs on a live (non-deleted) buffer."""
    # an impossibly high floor: every attempt counts as weather
    monkeypatch.setenv("BENCH_STAGE_RETRY_MBS", "1e12")
    monkeypatch.setenv("BENCH_STAGE_ATTEMPTS", "3")
    monkeypatch.setenv("BENCH_REPEATS", "1")
    mod = _bench_module()
    scanner = _FakeStageScanner()
    (_, _), extras, peaks = mod._measure_staged_scan(
        scanner, None, "float32", 2, 1, ""
    )
    assert scanner.stage_calls == 3
    assert len(extras["stage_attempts_mb_s"]) == 3
    assert extras["stage_mb_s"] > 0
    assert len(peaks) == 2
    # no double-residency: each retry frees the previous attempt's
    # buffers BEFORE re-staging (a batch near half of HBM would
    # otherwise OOM on retry — attempts stage byte-identical data, so
    # only the best TIME needs keeping, not the earliest buffer)
    assert scanner.live_at_stage == [0, 0, 0]


def test_stage_weather_retry_disabled_by_floor_zero(monkeypatch):
    """BENCH_STAGE_RETRY_MBS<=0 restores single-attempt staging and the
    annotation field stays absent (pre-retry history schema)."""
    monkeypatch.setenv("BENCH_STAGE_RETRY_MBS", "0")
    monkeypatch.setenv("BENCH_REPEATS", "1")
    mod = _bench_module()
    scanner = _FakeStageScanner()
    (_, _), extras, _ = mod._measure_staged_scan(
        scanner, None, "float32", 1, 1, ""
    )
    assert scanner.stage_calls == 1
    assert "stage_attempts_mb_s" not in extras


def test_bench_latency_ab_config_end_to_end(tmp_path, monkeypatch, capsys):
    """The experiment runner's single-pair latency stage (VERDICT r3 #4)
    runs bench.py with EPISODES=1 QUERIES=1, a mulaw8 wire, BENCH_REPEATS
    medians, and a put-byte cap that splits the upload — exercise that
    exact knob combination at a tiny shape so the unattended hardware
    window can't be the first time it runs."""
    monkeypatch.setenv("BENCH_EPISODE_SECS", "60")
    monkeypatch.setenv("BENCH_EPISODES", "1")
    monkeypatch.setenv("BENCH_QUERIES", "1")
    monkeypatch.setenv("BENCH_TRANSFER_DTYPE", "mulaw8")
    monkeypatch.setenv("BENCH_REPEATS", "3")
    # tiny cap: the 60 s * 44.1 kHz uint8 wire (~2.6 MB) splits into
    # several pieces, covering the piece-split staging path too
    monkeypatch.setenv("AUDIO_MATCHER_PUT_BYTES", str(1 * 2**20))
    monkeypatch.setenv("BENCH_FFT_IMPL", "xla_packed")
    monkeypatch.setenv("BENCH_PEAKS_IMPL", "jnp")
    hist = tmp_path / "history.jsonl"
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(hist))
    mod = _bench_module()
    monkeypatch.setattr(mod, "acquire_backend", lambda *a, **k: None)
    assert mod.main() == 0
    captured = capsys.readouterr()
    out = json.loads(captured.out.strip().splitlines()[-1])
    assert out["ok"] is True and out["value"] > 0
    # the median-of-N methodology line must report, and repeats must not
    # leak into the history fingerprint
    assert "median of 3" in captured.err
    (entry,) = _entries(hist)
    assert entry["fingerprint"]["transfer_dtype"] == "mulaw8"
    assert "repeats" not in entry["fingerprint"]


def test_cpu_spectrogram_baseline_matches_device_semantics():
    """The scipy baseline pipeline must compute the SAME scores as the
    device path (ops.stft log_mel + fingerprint_scores) — otherwise
    vs_baseline compares against a different algorithm."""
    import numpy as np

    from audio_matcher_tpu.models.spectrogram import SpectrogramConfig
    from audio_matcher_tpu.ops.stft import fingerprint_scores, log_mel

    mod = _bench_module()
    sr = 8000
    rng = np.random.default_rng(11)
    t = np.arange(2 * sr) / sr
    snippet = (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    episode = (rng.standard_normal(20 * sr) * 0.05).astype(np.float32)
    episode[5 * sr : 5 * sr + len(snippet)] += snippet

    cfg = SpectrogramConfig(n_fft=256, hop=64, n_mels=32)
    got = mod.cpu_spectrogram_scores(episode, snippet, cfg, sr=sr)
    want = np.asarray(
        fingerprint_scores(
            log_mel(episode, sr, cfg.n_fft, cfg.hop, cfg.n_mels),
            log_mel(snippet, sr, cfg.n_fft, cfg.hop, cfg.n_mels),
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # and both see the plant where it was planted (additive sine over
    # noise: the score ridge is a couple of frames wide)
    assert abs(int(got.argmax()) * cfg.hop - 5 * sr) <= 2 * cfg.hop


def test_acquire_backend_retries_until_probe_succeeds(monkeypatch):
    """Dead-relay probes must retry with backoff inside the budget (round
    3 lost its capture to a single 600 s window in a multi-hour outage)."""
    import subprocess

    mod = _bench_module()
    attempts = []

    class R:
        def __init__(self, rc):
            self.returncode = rc

    def fake_run(cmd, timeout=None, **kw):
        attempts.append(timeout)
        return R(1 if len(attempts) < 3 else 0)

    slept = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(mod.time, "sleep", lambda s: slept.append(s))
    mod.acquire_backend(30.0, 10_000.0)
    assert len(attempts) == 3 and len(slept) == 2


def test_acquire_backend_fails_with_evidence_after_budget(
    tmp_path, monkeypatch, capsys
):
    import subprocess

    import pytest

    mod = _bench_module()
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(tmp_path / "none.jsonl"))

    def fake_run(cmd, timeout=None, **kw):
        raise subprocess.TimeoutExpired(cmd, timeout)

    clock = iter(range(0, 100_000, 50))
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(mod.time, "monotonic", lambda: float(next(clock)))
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as exc:
        mod.acquire_backend(30.0, 120.0)
    assert exc.value.code == 3
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is False and "last_good" in out


def test_run_watchdog_emits_evidence_on_hung_run(tmp_path):
    """A relay that answers the acquisition probe but dies MID-RUN leaves
    the bench blocked in a device op; the run watchdog must emit the
    evidence-carrying failure JSON and exit 3 before any outer timeout
    KILL erases it (the r3 MULTICHIP artifact died rc=124 to exactly this
    hang class). Simulated in a subprocess: arm the watchdog with a tiny
    budget, then hang — the watchdog never touches a JAX backend."""
    import os
    import subprocess

    hist = tmp_path / "history.jsonl"
    hist.write_text(
        json.dumps(
            {
                "tag": "bench",
                "fingerprint": {"probe": 1},
                "device_resident_value": 32.0,
            }
        )
        + "\n"
    )
    code = (
        "import importlib.util, time;"
        "spec = importlib.util.spec_from_file_location('bench', 'bench.py');"
        "m = importlib.util.module_from_spec(spec);"
        "spec.loader.exec_module(m);"
        "m.current_fingerprint = lambda *a, **k: {'probe': 1};"
        "m.arm_run_watchdog();"
        "time.sleep(120);"
        "print('WATCHDOG DID NOT FIRE')"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the watchdog is CPU-exempt
    env["BENCH_RUN_BUDGET"] = "2"
    env["BENCH_HISTORY_PATH"] = str(hist)
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=90,
    )
    assert r.returncode == 3, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["ok"] is False
    assert "run phase exceeded" in out["error"]
    assert out["last_good"]["device_resident_value"] == 32.0


def test_run_watchdog_disabled_on_cpu(monkeypatch):
    """Tests call main() in-process on the CPU backend; an armed watchdog
    there would os._exit the whole pytest run minutes later."""
    mod = _bench_module()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("BENCH_RUN_BUDGET", "1")
    import threading

    before = threading.active_count()
    mod.arm_run_watchdog()
    assert threading.active_count() == before


def _digest_module():
    spec = importlib.util.spec_from_file_location(
        "summarize_experiments", REPO / "benches" / "summarize_experiments.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_experiment_digest_parses_mirrored_log_and_history(
    tmp_path, capsys
):
    """The post-outage analysis reads results through
    benches/summarize_experiments.py — its recovery of JSON from the
    runner's '[HH:MM:SS]   | {...}' mirror prefix and its fingerprint
    selectors (tpu-only, put_cap rendering) must not drift from the
    runner/bench formats they parse."""
    mod = _digest_module()

    # exactly what run_staging_experiments.run() writes: chatter + a
    # mirrored fence-probe JSON line + a bare JSON line + junk JSON
    probe = {
        "variant": "nofence", "size_mb": 3392, "pieces": 5,
        "warmup_s": 0.1, "put_s": 4.9, "fence_s": 50.0, "mbps": 61.8,
        "dispatch_mbps": 692.2, "integrity_ok": True,
    }
    log_lines = [
        "[12:00:00] RUN python -u benches/probe_staging_fence.py env=None",
        "[12:00:05]   | " + json.dumps(probe),
        json.dumps({"variant": "bench", "size_mb": 3392, "pieces": 5,
                    "put_s": 55.0, "fence_s": 0.2, "mbps": 61.0,
                    "dispatch_mbps": 61.7, "integrity_ok": False}),
        "[12:00:06]   | not json {",
        "[12:00:07] rc=0",
    ]
    log_path = tmp_path / "staging_experiments.log"
    log_path.write_text("\n".join(log_lines) + "\n")
    recs = mod._json_lines(str(log_path))
    assert [r.get("variant") for r in recs] == ["nofence", "bench"]

    mod.fence_rows(recs)
    out = capsys.readouterr().out
    assert "nofence" in out and "692.2" in out
    assert " Y" in out and " N" in out  # integrity column both ways

    # history selectors: cpu rows skipped, put_cap renders in MB, the
    # latency selector must not pick up the literal-#3 shape
    hist = [
        {"when": "2026-08-18T10:00", "tag": "bench",
         "fingerprint": {"backend": "cpu", "episodes": 1, "queries": 1,
                         "transfer_dtype": "int16"},
         "result": {"value": 0.001}},
        {"when": "2026-08-18T11:00", "tag": "bench",
         "fingerprint": {"backend": "tpu", "episodes": 1, "queries": 1,
                         "transfer_dtype": "mulaw8",
                         "put_cap": 64 * 2**20},
         "result": {"value": 2.1, "vs_baseline": 20.0,
                    "device_resident_value": 5.0,
                    "device_resident_vs_baseline": 47.0,
                    "stage_secs": 17.4, "stage_mb_s": 39.2}},
        {"when": "2026-08-18T12:00", "tag": "bench",
         "fingerprint": {"backend": "tpu", "episodes": 64, "queries": 4,
                         "transfer_dtype": "int16"},
         "result": {"value": 0.9, "vs_baseline": 9.0,
                    "device_resident_value": 17.9,
                    "device_resident_vs_baseline": 180.0}},
    ]
    mod.bench_rows(hist, "single-pair latency (config #2)",
                   {"episodes": 1, "queries": 1})
    out = capsys.readouterr().out
    assert "mulaw8" in out and "64MB" in out
    assert "cpu" not in out and "17.9" not in out
    # staging-weather columns render, and pre-r5 entries without the
    # fields render as '-'
    assert "17.4" in out and "39.2" in out
    mod.bench_rows(hist, "literal config #3 (64x10min x 4q)",
                   {"episodes": 64, "queries": 4})
    assert " - " in capsys.readouterr().out


def test_default_wire_contract(monkeypatch):
    """The bench defaults to the recommended relay-class production wire
    (mulaw8 — PERF.md "Wire recommendation"), while the user-facing
    surfaces keep the LOSSLESS contract: sweep CLI defaults int16,
    matcher CLI float32, MatchConfig float32. Guards an accidental flip
    of the lossy wire into a default that promises losslessness."""
    for var in ("BENCH_TRANSFER_DTYPE", "BENCH_SLAB"):
        monkeypatch.delenv(var, raising=False)
    mod = _bench_module()
    assert mod.make_config().transfer_dtype == "mulaw8"
    # spectrogram mode keeps int16 so its single-fingerprint history
    # (and the gate comparing against it) stays continuous
    assert mod.make_spec_config().transfer_dtype == "int16"

    from audio_matcher_tpu.cli import matcher_cli, sweep_cli
    from audio_matcher_tpu.models.matcher import MatchConfig

    assert MatchConfig().transfer_dtype == "float32"
    m = matcher_cli.build_parser().parse_args(["ep.mp3", "--snippet", "s.mp3"])
    assert m.transfer == "float32"
    s = sweep_cli.build_parser().parse_args(["*.mp3", "--snippet", "s.mp3"])
    assert s.transfer == "int16"


def test_digest_bench_rows_tolerate_null_stage_rate(capsys):
    """bench.py writes stage_mb_s: null when t_stage rounds to 0 — the
    digest must render '-' instead of crashing on None.__format__."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "summarize_experiments",
        REPO / "benches" / "summarize_experiments.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    hist = [
        {"when": "2026-08-19T20:00", "tag": "bench",
         "fingerprint": {"backend": "tpu", "episodes": 1, "queries": 1,
                         "transfer_dtype": "mulaw8"},
         "result": {"value": 2.1, "vs_baseline": 20.0,
                    "device_resident_value": 5.0,
                    "device_resident_vs_baseline": 47.0,
                    "stage_secs": 0.0, "stage_mb_s": None}},
    ]
    mod.bench_rows(hist, "null stage rate", {"episodes": 1, "queries": 1})
    out = capsys.readouterr().out
    assert "2.1" in out and " - " in out


def test_baseline_clamp_uses_least_starved_history(tmp_path, capsys):
    """vs_baseline's denominator is a CPU measurement on a 1-vCPU host
    the relay also runs on: a starved run inflates the multiplier
    (history held 272x and 614x for near-identical absolute values).
    historical_best_baseline must recover the fastest implied baseline
    for the SAME fingerprint only, and clamped_baseline must prefer it
    over a starved measurement while leaving a faster measurement
    untouched."""
    mod = _bench_module()
    hist = tmp_path / "history.jsonl"
    fp = {"backend": "tpu", "episodes": 4, "queries": 64}
    other = {"backend": "tpu", "episodes": 1, "queries": 1}
    rows = [
        # implied baselines: 32.5/302.07 ≈ 0.1076 and 32.22/722.29 ≈ 0.0446
        {"tag": "bench", "fingerprint": fp,
         "result": {"device_resident_value": 32.5036,
                    "device_resident_vs_baseline": 302.07}},
        {"tag": "bench", "fingerprint": fp,
         "result": {"device_resident_value": 32.2228,
                    "device_resident_vs_baseline": 722.29}},
        # different fingerprint implying a much faster baseline: ignored
        {"tag": "bench", "fingerprint": other,
         "result": {"device_resident_value": 10.0,
                    "device_resident_vs_baseline": 10.0}},
        # degenerate rows must not crash or contribute
        {"tag": "bench", "fingerprint": fp,
         "result": {"device_resident_value": 1.0,
                    "device_resident_vs_baseline": 0}},
        {"tag": "other", "fingerprint": fp},
    ]
    hist.write_text(
        "\n".join(json.dumps(r) for r in rows) + "\nnot json\n"
    )
    best = mod.historical_best_baseline(fp, path=str(hist))
    assert abs(best - 32.5036 / 302.07) < 1e-9

    # entries that carry the exact denominator (cpu_baseline, written by
    # baseline_provenance since r5) are read verbatim — the rounded
    # value/vs ratio would reconstruct it with ~2e-5 relative error that
    # max() only ever ratchets upward
    exact = {"tag": "bench", "fingerprint": fp,
             "result": {"cpu_baseline": 0.114919,
                        "device_resident_value": 32.2646,
                        "device_resident_vs_baseline": 280.76}}
    hist.write_text(
        hist.read_text() + json.dumps(exact) + "\n"
    )
    best = mod.historical_best_baseline(fp, path=str(hist))
    assert best == 0.114919

    import os

    os.environ["BENCH_HISTORY_PATH"] = str(hist)
    try:
        # starved measurement (0.05 < 0.1076): clamp engages and says so
        assert mod.clamped_baseline(0.05, fp) == best
        assert "least-starved" in capsys.readouterr().err
        # least-starved-yet measurement: kept verbatim (and would become
        # the new historical best once its entry lands)
        assert mod.clamped_baseline(0.2, fp) == 0.2
        # unseen fingerprint: no history, measurement kept
        assert mod.clamped_baseline(0.05, {"backend": "tpu"}) == 0.05
    finally:
        del os.environ["BENCH_HISTORY_PATH"]


def test_baseline_clamp_reaches_emitted_vs_baseline(tmp_path, monkeypatch, capsys):
    """End-to-end: seeding history with a faster implied baseline for the
    exact fingerprint of a tiny pcm run must lower the emitted
    vs_baseline (the clamp is wired into the result, not just defined)."""
    monkeypatch.setenv("BENCH_EPISODE_SECS", "60")
    monkeypatch.setenv("BENCH_EPISODES", "2")
    monkeypatch.setenv("BENCH_QUERIES", "2")
    monkeypatch.setenv("BENCH_FFT_IMPL", "xla_packed")
    monkeypatch.setenv("BENCH_PEAKS_IMPL", "jnp")
    hist = tmp_path / "history.jsonl"
    monkeypatch.setenv("BENCH_HISTORY_PATH", str(hist))
    mod = _bench_module()
    monkeypatch.setattr(mod, "acquire_backend", lambda *a, **k: None)
    fp = mod.expected_fingerprint(mod.make_config(), backend="cpu")
    # implied baseline 1e6 pair-h/s — absurdly fast, so the clamp must
    # force vs_baseline ≈ value/1e6 ≈ 0 regardless of the measured CPU
    hist.write_text(json.dumps({
        "tag": "bench", "when": "2026-08-19T00:00:00+00:00",
        "fingerprint": fp,
        "result": {"device_resident_value": 1e6,
                   "device_resident_vs_baseline": 1.0},
    }) + "\n")
    assert mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True
    assert out["vs_baseline"] < 0.01
    assert out["device_resident_vs_baseline"] < 0.01
    # clamp provenance self-documents in the result (and thus history):
    # the used denominator and the starved measurement it replaced
    assert out["cpu_baseline"] == 1e6
    assert 0 < out["cpu_baseline_measured"] < 1e6
    entry = _entries(hist)[-1]
    assert entry["result"]["cpu_baseline"] == 1e6
