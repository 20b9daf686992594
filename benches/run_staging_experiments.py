"""Driver for the hardware staging experiments (VERDICT r3 #3/#4, r4 #1-#4).

Waits for the axon relay (bounded probes, shared with bench.py's
``probe_backend_once`` so the probe policy can't drift), then runs the
named stages below in order — headline first, then the cheap
high-evidence stages (the two below-100x BASELINE regimes + the first
spectrogram fingerprint), then the multi-GB probe sweeps that eat the
most wall-clock (VERDICT r4 #1 reorder: round 4's outages starved the
high-value stages behind a 17 GB fence sweep):

  canonical-int16      the canonical bench — the round's headline capture
                       comes FIRST so hours of experiments can't hold it
                       hostage
  spectrogram          spectrogram mode's first fingerprinted hardware
                       history entry
  latency-*            single-pair latency (BASELINE config #2):
                       EPISODE_SECS=3600 EPISODES=1 QUERIES=1, int16 vs
                       mulaw8 wire, plus 64/128 MB piece caps on int16
  canonical-mulaw8     the canonical batch shape on the mulaw8 wire
  literal3-*           the literal config-#3 shape (EPISODES=64 QUERIES=4
                       EPISODE_SECS=600), mulaw8 then int16
  fence-ab             probe_staging_fence.py — the fence/warmup A/B at
                       the literal config-#3 byte volume (asked "what
                       ends the pre-execution fast path?"; answered:
                       nothing — rate is weather, see the probe's
                       docstring)
  serial-ab-{3392,682} the serial-fence question (VERDICT r4 #2): 3
                       interleaved serial/bench rounds per byte volume —
                       round 4's single-sample 134.6 vs 50.7 MB/s spread
                       can't be told from the relay's claimed 2x weather
  pieces-{128,256,512} piece-size sweep on the nofence variant
                       (AUDIO_MATCHER_PUT_BYTES; 768 MB default cap is
                       covered by fence-ab)

Return-code policy (the supervisor restarts us only on rc=3):

  - a stage rc of 3 (bench backend budget exhausted) means the relay
    DIED mid-run: the remainder is skipped and the runner exits 3 so
    benches/exp_supervisor.sh restarts it. Every COMPLETED stage's name
    is recorded in benches/.exp_stages_done and skipped on the rerun, so
    the loop converges instead of re-paying finished stages. A stage
    that dies this way MAX_STAGE_ATTEMPTS times is permanently skipped —
    a DEGRADED relay (probes answer, transfers hang) must not ping-pong
    restarts on one stage forever.
  - a stage rc of 124 (stage timeout) is AMBIGUOUS: at degraded relay
    rates (~4-20 MB/s measured) a multi-GB stage can legitimately
    exceed its budget with a live relay (VERDICT r4 #4 — pieces-128 was
    discarded this way). The runner immediately probes the relay: if it
    answers, the stage is classified OVER-BUDGET and retried once with
    a timeout scaled to its byte volume at the worst degraded rate
    (``!slow`` marker in the done-file; a second overrun marks it
    ``!err`` with a reported reason). If the probe fails, it is a relay
    death as above.
  - any other nonzero stage rc is a real experiment failure: logged,
    remaining stages still run, and the runner exits 1 at the end (the
    supervisor does NOT retry — rerunning a deterministic failure loops
    forever; a session reads the log and fixes it).

Appends everything to benches/staging_experiments.log (stdout lines are
also mirrored) so a later session can read the results even if this one
dies. Run with python -u. Delete benches/.exp_stages_done to force a
full rerun.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_common import load_bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "benches", "staging_experiments.log")
DONE = os.path.join(REPO, "benches", ".exp_stages_done")

probe_backend_once = load_bench().probe_backend_once


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def run(cmd, env_extra=None, timeout_s=3600) -> int:
    env = dict(os.environ)
    env.update(env_extra or {})
    log(f"RUN {' '.join(cmd)} env={env_extra}")
    # own session + killpg on timeout: a stage that spawns helpers (the
    # fence probe's per-variant subprocesses, bench.py's backend probes)
    # must not leave a grandchild blocked in device_put pinning GBs of
    # host RAM after the stage is killed
    p = subprocess.Popen(
        cmd, cwd=REPO, env=env, start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        out, _ = p.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        import signal

        try:
            os.killpg(p.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        out, _ = p.communicate()
        for ln in (out or "").splitlines()[-10:]:
            log(f"  | {ln}")
        log("TIMEOUT (process group killed)")
        return 124
    for ln in (out or "").splitlines()[-30:]:
        log(f"  | {ln}")
    log(f"rc={p.returncode}")
    return p.returncode


def wait_for_relay(budget_s: float = 14400.0) -> bool:
    t_end = time.monotonic() + budget_s
    attempt = 0
    while time.monotonic() < t_end:
        attempt += 1
        if probe_backend_once(180.0):
            log(f"relay UP after {attempt} probe(s)")
            return True
        log(f"relay probe {attempt} failed")
        time.sleep(240)
    log("relay never answered within budget")
    return False


def stages():
    """(name, argv, env_extra, timeout_s, bytes_mb) in execution order.

    ``bytes_mb`` estimates the total bytes the stage transfers to the
    device (all probe variants summed) — it sizes the retry timeout for
    a stage that overran its budget with a LIVE relay. Order: headline,
    then cheap evidence stages, then multi-GB sweeps (module docstring).
    """
    py = sys.executable
    out = [
        # bench.py's DEFAULT wire is now mulaw8 (PERF.md wire
        # recommendation) — this stage must pin int16 explicitly or it
        # would silently duplicate canonical-mulaw8 and starve the
        # int16 lineage's regression gate
        ("canonical-int16", [py, "-u", "bench.py"],
         {"BENCH_TRANSFER_DTYPE": "int16"}, 5400, 682),
        ("spectrogram", [py, "-u", "bench.py"],
         {"BENCH_MODE": "spectrogram"}, 5400, 682),
    ]
    # single-pair latency (config #2): int16 vs mulaw8, median-of-5 scan
    # (one ~0.2 s sample otherwise; the relay swings 2x). The int16 runs
    # also A/B piecing the single 340 MB put (the config-#3 piece sweep
    # runs at 10x this volume — a put this small may sit on a different
    # part of the relay's rate curve).
    for dtype, cap_mb in (
        ("int16", None), ("int16", 64), ("int16", 128), ("mulaw8", None),
    ):
        env = {
            "BENCH_EPISODE_SECS": "3600",
            "BENCH_EPISODES": "1",
            "BENCH_QUERIES": "1",
            "BENCH_TRANSFER_DTYPE": dtype,
            "BENCH_REPEATS": "5",
        }
        if cap_mb is not None:
            env["AUDIO_MATCHER_PUT_BYTES"] = str(cap_mb * 2**20)
        out.append((
            f"latency-{dtype}" + (f"-{cap_mb}mb" if cap_mb else ""),
            [py, "-u", "bench.py"], env, 3600,
            340 if dtype == "int16" else 170,
        ))
    # canonical batch shape, mulaw8 wire (halves the 682 MB stage; the
    # in-register mu-law expand may tax the fused forward kernel — A/B)
    out.append((
        "canonical-mulaw8", [py, "-u", "bench.py"],
        {"BENCH_TRANSFER_DTYPE": "mulaw8"}, 5400, 341,
    ))
    # mulaw8 first: literal3-int16 stages 2x the bytes for the same
    # positions evidence
    for dtype, mb in (("mulaw8", 1700), ("int16", 3400)):
        out.append((
            f"literal3-{dtype}", [py, "-u", "bench.py"],
            {"BENCH_EPISODE_SECS": "600", "BENCH_EPISODES": "64",
             "BENCH_QUERIES": "4", "BENCH_TRANSFER_DTYPE": dtype},
            5400, mb,
        ))
    out.append((
        # VARIANT_BUDGET made explicit (it matches the probe's own
        # default): the over-budget retry path scales the inner
        # per-variant budget for every stage that declares one — the
        # declaration IS the detection (no argv sniffing to go stale)
        "fence-ab", [py, "-u", "benches/probe_staging_fence.py"],
        {"VARIANT_BUDGET": "900"}, 5400, 5 * 3392,
    ))
    # serial-fence repeats (VERDICT r4 #2): 3 INTERLEAVED rounds per
    # variant — serial (put+fence per piece) vs bench (today's
    # stage_resident policy: dispatch all, fence each) — at the literal
    # config-#3 volume and once at the canonical 682 MB. Interleaving
    # makes the comparison robust to slow relay drift; 3 medians can
    # separate the round-4 one-sample 2.7x spread from the ~2x weather.
    serial_rounds = ",".join(["serial", "bench"] * 3)
    out.append((
        "serial-ab-3392", [py, "-u", "benches/probe_staging_fence.py"],
        {"VARIANTS": serial_rounds, "VARIANT_BUDGET": "1800"},
        11400, 6 * 3392,
    ))
    out.append((
        "serial-ab-682", [py, "-u", "benches/probe_staging_fence.py"],
        {"VARIANTS": serial_rounds, "SIZE_MB": "682",
         "VARIANT_BUDGET": "600"},
        4200, 6 * 682,
    ))
    for cap_mb in (128, 256, 512):
        out.append((
            f"pieces-{cap_mb}",
            [py, "-u", "benches/probe_staging_fence.py"],
            {"VARIANTS": "nofence",
             "AUDIO_MATCHER_PUT_BYTES": str(cap_mb * 2**20),
             "VARIANT_BUDGET": "1800"},
            2400, 3392,
        ))
    return out


def _done_file_lines() -> list[str]:
    try:
        with open(DONE) as f:
            return [ln.strip() for ln in f if ln.strip()]
    except FileNotFoundError:
        return []


def _done_stages() -> set[str]:
    return {
        ln for ln in _done_file_lines()
        if not ln.endswith("!fail") and not ln.endswith("!err")
        and not ln.endswith("!slow")
    }


def _errored_stages() -> set[str]:
    return {
        ln[: -len("!err")]
        for ln in _done_file_lines()
        if ln.endswith("!err")
    }


def _fail_counts() -> dict[str, int]:
    counts: dict[str, int] = {}
    for ln in _done_file_lines():
        if ln.endswith("!fail"):
            name = ln[: -len("!fail")]
            counts[name] = counts.get(name, 0) + 1
    return counts


def _mark_done(name: str) -> None:
    with open(DONE, "a") as f:
        f.write(name + "\n")


def _mark_failed(name: str) -> None:
    with open(DONE, "a") as f:
        f.write(name + "!fail\n")


def _mark_errored(name: str) -> None:
    with open(DONE, "a") as f:
        f.write(name + "!err\n")


def _slow_counts() -> dict[str, int]:
    counts: dict[str, int] = {}
    for ln in _done_file_lines():
        if ln.endswith("!slow"):
            name = ln[: -len("!slow")]
            counts[name] = counts.get(name, 0) + 1
    return counts


def _mark_slow(name: str) -> None:
    with open(DONE, "a") as f:
        f.write(name + "!slow\n")


# a stage that died with a relay-ish rc this many times is permanently
# skipped: a DEGRADED relay (probes answer, transfers hang) would
# otherwise ping-pong supervisor restarts on the same stage forever
MAX_STAGE_ATTEMPTS = 2

# a stage that overran its budget with a LIVE relay gets ONE byte-scaled
# retry; a second overrun is reported as over-budget and skipped
MAX_OVERBUDGET_ATTEMPTS = 2

# worst sustained degraded relay rate observed (PERF.md: monolithic
# multi-GB puts collapse to ~8 MB/s; leave margin below it) — sizes the
# over-budget retry timeout
DEGRADED_MBPS = 4.0


def classify_stage_timeout(rc: int, relay_answers: bool) -> str:
    """Disambiguate a stage timeout (VERDICT r4 #4): rc=124 with a relay
    that still answers a probe is the stage exceeding its budget (a
    3.4 GB staged probe at a degraded-but-alive ~4-20 MB/s legitimately
    overruns), NOT a relay death. rc=3 means bench.py's own bounded
    probes already failed — relay dead by construction."""
    if rc == 124 and relay_answers:
        return "over-budget"
    return "relay-dead"


def overbudget_timeout(bytes_mb: float, base_s: float) -> float:
    """Retry budget for an over-budget stage: its byte volume at the
    worst measured degraded rate, on top of the base (compile + scan)
    budget."""
    return base_s + bytes_mb / DEGRADED_MBPS


# probe subprocess spawn + buffer synth + integrity readback slack, on
# top of the variants' combined inner allowance, when sizing the outer
# timeout of a VARIANT_BUDGET-honoring stage
PROBE_SETUP_S = 600.0

# probe_staging_fence.VARIANTS when a stage sets no VARIANTS env
# (pinned by tests/test_experiment_runner.py against the probe module)
N_DEFAULT_PROBE_VARIANTS = 5


def scaled_probe_budgets(
    env: dict, slow_n: int, outer_timeout_s: float
) -> tuple[dict, float]:
    """Inner/outer budget pair for an over-budget retry of a
    VARIANT_BUDGET-honoring probe stage. The inner per-variant budget
    doubles per over-budget attempt (the stage already proved slower
    than its base budget with a LIVE relay), and the OUTER timeout is
    raised to dominate every variant running to its inner allowance —
    otherwise the retry promises the variants more time than the outer
    timeout permits, gets SIGKILLed mid-variant, and burns the stage's
    second over-budget attempt without ever violating its own budget."""
    inner = float(env["VARIANT_BUDGET"]) * 2**slow_n
    env = dict(env)
    env["VARIANT_BUDGET"] = str(int(inner))
    n_var = (
        len([v for v in env["VARIANTS"].split(",") if v])
        if env.get("VARIANTS")
        else N_DEFAULT_PROBE_VARIANTS
    )
    return env, max(outer_timeout_s, n_var * inner + PROBE_SETUP_S)


def main() -> int:
    if not wait_for_relay(float(os.environ.get("EXP_BUDGET", "14400"))):
        return 3
    done = _done_stages()
    errored = _errored_stages()
    fail_counts = _fail_counts()
    failures = []
    for name, cmd, env, timeout_s, bytes_mb in stages():
        if name in done:
            log(f"stage {name}: already complete, skipping")
            continue
        if name in errored:
            # a deterministic failure (non-relay rc) from an earlier run:
            # re-paying it on every supervisor restart would burn chip
            # time on a known-bad stage
            log(f"stage {name}: failed deterministically in an earlier "
                "run — skipped (delete benches/.exp_stages_done to retry)")
            failures.append((name, "errored-earlier"))
            continue
        if fail_counts.get(name, 0) >= MAX_STAGE_ATTEMPTS:
            log(f"stage {name}: {fail_counts[name]} relay-death attempts "
                "already — permanently skipped")
            failures.append((name, "attempts-exhausted"))
            continue
        slow_n = _slow_counts().get(name, 0)
        if slow_n >= MAX_OVERBUDGET_ATTEMPTS:
            # both over-budget attempts burned in an earlier run that
            # died before recording the !err marker
            log(f"stage {name}: {slow_n} over-budget attempts already — "
                "skipped")
            failures.append((name, "over-budget-earlier"))
            continue
        while True:
            eff_timeout = timeout_s
            eff_env = dict(env) if env else {}
            if slow_n:
                # an earlier run of this stage overran with a live relay
                # (possibly before a supervisor restart): byte-scaled
                # budget from the start
                eff_timeout = overbudget_timeout(bytes_mb, timeout_s)
                if "VARIANT_BUDGET" in eff_env:
                    # a probe stage declares its inner per-variant
                    # budget: double it (it would otherwise retry into
                    # the identical rc=124) and keep the outer timeout
                    # dominating the variants' combined allowance
                    eff_env, eff_timeout = scaled_probe_budgets(
                        eff_env, slow_n, eff_timeout
                    )
                log(f"stage {name}: over-budget retry {slow_n} — "
                    f"timeout {eff_timeout:.0f}s")
            rc = run(cmd, env_extra=eff_env or None, timeout_s=eff_timeout)
            if rc not in (3, 124):
                break
            # relay death vs stage-over-budget (VERDICT r4 #4): probe
            # the relay NOW — if it answers, the stage was just slower
            # than its budget and must not burn a relay-death attempt
            relay_alive = rc == 124 and probe_backend_once(180.0)
            if classify_stage_timeout(rc, relay_alive) == "relay-dead":
                # backend budget exhausted / stage timed out with a dead
                # relay — stop here and let the supervisor restart us;
                # the done-file resumes at THIS stage once the relay
                # answers (unless it has burned MAX_STAGE_ATTEMPTS)
                _mark_failed(name)
                log(f"stage {name}: relay presumed dead (rc={rc}, "
                    "post-timeout probe failed); aborting remainder for "
                    "supervisor restart")
                return 3
            slow_n += 1
            _mark_slow(name)
            if slow_n >= MAX_OVERBUDGET_ATTEMPTS:
                rc = "over-budget-with-live-relay"
                break
            log(f"stage {name}: timed out but the relay ANSWERS — "
                "classified over-budget; retrying with byte-scaled "
                "timeout")
        if rc != 0:
            _mark_errored(name)  # deterministic failure: never re-paid
            failures.append((name, rc))
            log(f"stage {name}: FAILED rc={rc} (continuing)")
        else:
            _mark_done(name)
    if failures:
        log(f"experiments complete with {len(failures)} failure(s): "
            + ", ".join(f"{n}({rc})" for n, rc in failures))
        return 1
    log("experiments complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
