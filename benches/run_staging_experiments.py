"""Driver for the round-4 hardware staging experiments (VERDICT r3 #3/#4).

Waits for the axon relay (bounded probes), then runs, in order:

  0. the canonical int16 bench — the round's headline capture comes
     FIRST so hours of experiments can't hold it hostage
  1. probe_staging_fence.py — the fence/warmup A/B at the literal
     config-#3 byte volume (what ends the pre-execution fast path?)
  2. a piece-size sweep on the nofence variant
     (AUDIO_MATCHER_PUT_BYTES in {128, 256, 512} MB; 768 MB is the
     default cap already covered by stage 1)
  3. single-pair latency (BASELINE config #2): bench.py at
     EPISODE_SECS=3600 EPISODES=1 QUERIES=1, int16 vs mulaw8 wire
  4. the literal config-#3 shape (EPISODES=64 QUERIES=4
     EPISODE_SECS=600), int16 vs mulaw8
  5. spectrogram mode's first fingerprinted hardware history entry
  6. the canonical batch shape on the mulaw8 wire

Appends everything to benches/staging_experiments.log (stdout lines are
also mirrored) so a later session can read the results even if this one
dies. Each stage is bounded; a dead relay mid-run skips the remainder
rather than hanging. Run with python -u.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "benches", "staging_experiments.log")


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
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                log(f"relay UP after {attempt} probe(s)")
                return True
        except subprocess.TimeoutExpired:
            pass
        log(f"relay probe {attempt} failed")
        time.sleep(240)
    log("relay never answered within budget")
    return False


def main() -> int:
    if not wait_for_relay(float(os.environ.get("EXP_BUDGET", "14400"))):
        return 3
    py = sys.executable

    # 0. canonical int16 bench FIRST — the round's headline capture must
    # not be hostage to hours of experiments if the relay dies again
    run([py, "-u", "bench.py"], timeout_s=5400)

    # 1. fence/warmup A/B (fresh subprocess per variant inside)
    run([py, "-u", "benches/probe_staging_fence.py"], timeout_s=5400)

    # 2. piece-size sweep on the no-warmup-fence variant
    for cap_mb in (128, 256, 512):
        run(
            [py, "-u", "benches/probe_staging_fence.py"],
            env_extra={
                "VARIANTS": "nofence",
                "AUDIO_MATCHER_PUT_BYTES": str(cap_mb * 2**20),
            },
            timeout_s=3600,
        )

    # 3. single-pair latency (config #2): int16 vs mulaw8, median-of-5
    # scan phase (one ~0.2 s sample otherwise; the relay swings 2x).
    # The int16 run also A/Bs piecing the single 340 MB put (the
    # config-#3 piece sweep in stage 2 runs at 10x this volume — a
    # single put this small may sit on a different part of the relay's
    # rate curve).
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
        run([py, "-u", "bench.py"], env_extra=env, timeout_s=3600)

    # 4. literal config-#3 shape: int16 vs mulaw8
    for dtype in ("int16", "mulaw8"):
        run(
            [py, "-u", "bench.py"],
            env_extra={
                "BENCH_EPISODE_SECS": "600",
                "BENCH_EPISODES": "64",
                "BENCH_QUERIES": "4",
                "BENCH_TRANSFER_DTYPE": dtype,
            },
            timeout_s=5400,
        )

    # 5. spectrogram mode's first fingerprinted hardware history entry
    # (VERDICT r3 #5) at the probe's measured shape
    run(
        [py, "-u", "bench.py"],
        env_extra={"BENCH_MODE": "spectrogram"},
        timeout_s=5400,
    )

    # 6. canonical batch shape, mulaw8 wire (halves the 635 MB stage; the
    # in-register mu-law expand may tax the fused forward kernel — A/B)
    run(
        [py, "-u", "bench.py"],
        env_extra={"BENCH_TRANSFER_DTYPE": "mulaw8"},
        timeout_s=5400,
    )
    log("experiments complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
