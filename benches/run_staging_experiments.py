"""Driver for the round-4 hardware staging experiments (VERDICT r3 #3/#4).

Waits for the axon relay (bounded probes, shared with bench.py's
``probe_backend_once`` so the probe policy can't drift), then runs the
named stages below in order:

  canonical-int16      the canonical bench — the round's headline capture
                       comes FIRST so hours of experiments can't hold it
                       hostage
  fence-ab             probe_staging_fence.py — the fence/warmup A/B at
                       the literal config-#3 byte volume (what ends the
                       pre-execution fast path?)
  pieces-{128,256,512} piece-size sweep on the nofence variant
                       (AUDIO_MATCHER_PUT_BYTES; 768 MB default cap is
                       covered by fence-ab)
  latency-*            single-pair latency (BASELINE config #2):
                       EPISODE_SECS=3600 EPISODES=1 QUERIES=1, int16 vs
                       mulaw8 wire, plus 64/128 MB piece caps on int16
  literal3-*           the literal config-#3 shape (EPISODES=64 QUERIES=4
                       EPISODE_SECS=600), int16 vs mulaw8
  spectrogram          spectrogram mode's first fingerprinted hardware
                       history entry
  canonical-mulaw8     the canonical batch shape on the mulaw8 wire

Return-code policy (the supervisor restarts us only on rc=3):

  - a stage rc of 3 (bench backend budget exhausted) or 124 (stage/probe
    timeout) means the relay DIED mid-run: the remainder is skipped and
    the runner exits 3 so benches/exp_supervisor.sh restarts it. Every
    COMPLETED stage's name is recorded in benches/.exp_stages_done and
    skipped on the rerun, so the loop converges instead of re-paying
    finished stages. A stage that dies this way MAX_STAGE_ATTEMPTS
    times is permanently skipped — a DEGRADED relay (probes answer,
    transfers hang) must not ping-pong restarts on one stage forever.
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
    """(name, argv, env_extra, timeout_s) in execution order."""
    py = sys.executable
    out = [
        ("canonical-int16", [py, "-u", "bench.py"], None, 5400),
        ("fence-ab", [py, "-u", "benches/probe_staging_fence.py"],
         None, 5400),
    ]
    for cap_mb in (128, 256, 512):
        out.append((
            f"pieces-{cap_mb}",
            [py, "-u", "benches/probe_staging_fence.py"],
            {"VARIANTS": "nofence",
             "AUDIO_MATCHER_PUT_BYTES": str(cap_mb * 2**20)},
            3600,
        ))
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
        ))
    for dtype in ("int16", "mulaw8"):
        out.append((
            f"literal3-{dtype}", [py, "-u", "bench.py"],
            {"BENCH_EPISODE_SECS": "600", "BENCH_EPISODES": "64",
             "BENCH_QUERIES": "4", "BENCH_TRANSFER_DTYPE": dtype},
            5400,
        ))
    out.append((
        "spectrogram", [py, "-u", "bench.py"],
        {"BENCH_MODE": "spectrogram"}, 5400,
    ))
    # canonical batch shape, mulaw8 wire (halves the 635 MB stage; the
    # in-register mu-law expand may tax the fused forward kernel — A/B)
    out.append((
        "canonical-mulaw8", [py, "-u", "bench.py"],
        {"BENCH_TRANSFER_DTYPE": "mulaw8"}, 5400,
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


# a stage that died with a relay-ish rc this many times is permanently
# skipped: a DEGRADED relay (probes answer, transfers hang) would
# otherwise ping-pong supervisor restarts on the same stage forever
MAX_STAGE_ATTEMPTS = 2


def main() -> int:
    if not wait_for_relay(float(os.environ.get("EXP_BUDGET", "14400"))):
        return 3
    done = _done_stages()
    errored = _errored_stages()
    fail_counts = _fail_counts()
    failures = []
    for name, cmd, env, timeout_s in stages():
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
        rc = run(cmd, env_extra=env, timeout_s=timeout_s)
        if rc in (3, 124):
            # backend budget exhausted / stage timed out: the relay died
            # mid-run — stop here and let the supervisor restart us; the
            # done-file resumes at THIS stage once the relay answers
            # (unless it has now burned MAX_STAGE_ATTEMPTS on it)
            _mark_failed(name)
            log(f"stage {name}: relay presumed dead (rc={rc}); "
                "aborting remainder for supervisor restart")
            return 3
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
