"""Digest benches/staging_experiments.log + benches/history.jsonl into
one table per experiment class (fence A/B, piece sweep, latency,
literal-#3, spectrogram, canonical) so the post-outage analysis session
reads results in seconds instead of scrolling probe logs.

Pure stdlib, no JAX — safe to run any time. The log mixes runner
chatter with mirrored stage output; JSON result lines are recovered
from the "  | " mirror prefix. History entries cover bench.py stages
(the probe stages only emit log JSON).
"""

from __future__ import annotations

import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))
LOG = os.path.join(HERE, "staging_experiments.log")
HIST = os.path.join(HERE, "history.jsonl")


def _json_lines(path):
    out = []
    try:
        with open(path) as f:
            for raw in f:
                line = raw.strip()
                # runner-mirrored stage stdout carries a "  | " prefix
                # after the timestamp: [HH:MM:SS]   | {...}
                m = re.match(r"^\[\d\d:\d\d:\d\d\]\s+\|\s+(\{.*\})$", line)
                if m:
                    line = m.group(1)
                elif not line.startswith("{"):
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    except FileNotFoundError:
        pass
    return out


def fence_rows(recs):
    rows = [r for r in recs if "variant" in r and "mbps" in r]
    if not rows:
        return
    print("## fence/warmup A/B + piece sweep (probe_staging_fence)")
    print(f"{'variant':>9} {'MB':>6} {'pieces':>6} {'put_s':>8} "
          f"{'fence_s':>8} {'MB/s':>8} {'disp MB/s':>9} ok")
    for r in rows:
        print(f"{r['variant']:>9} {r['size_mb']:>6} {r['pieces']:>6} "
              f"{r.get('put_s', 0):>8} {r.get('fence_s', 0):>8} "
              f"{r.get('mbps', 0):>8} {str(r.get('dispatch_mbps')):>9} "
              f"{'Y' if r.get('integrity_ok') else 'N'}")
    print()


def bench_rows(recs, title, want):
    """TPU history entries whose fingerprint matches the `want` subset
    (CPU entries from the test suite share the file — skip them)."""
    rows = []
    for r in recs:
        fp = r.get("fingerprint", {})
        if fp.get("backend") != "tpu":
            continue
        if all(fp.get(k) == v for k, v in want.items()):
            rows.append(r)
    if not rows:
        return
    print(f"## {title}")
    print(f"{'when':>16} {'dtype':>8} {'put_cap':>8} {'e2e p-h/s':>10} "
          f"{'x base':>7} {'resident':>9} {'x base':>7} "
          f"{'stage_s':>8} {'stg MB/s':>8}")
    for r in rows:
        res, fp = r.get("result", {}), r.get("fingerprint", {})
        cap = fp.get("put_cap")
        cap = f"{int(cap) // 2**20}MB" if cap else "-"
        # staging-weather columns (entries before r5 lack the fields,
        # and bench.py writes stage_mb_s: null when t_stage == 0): an
        # e2e outlier next to a ~20 MB/s stage rate is relay weather,
        # not a regression
        stage_s = res.get("stage_secs")
        stage_s = "-" if stage_s is None else stage_s
        stage_rate = res.get("stage_mb_s")
        stage_rate = "-" if stage_rate is None else stage_rate
        print(f"{r.get('when', '?'):>16.16} "
              f"{fp.get('transfer_dtype', '?'):>8} {cap:>8} "
              f"{res.get('value', '?'):>10} "
              f"{res.get('vs_baseline', '?'):>7} "
              f"{res.get('device_resident_value', '?'):>9} "
              f"{res.get('device_resident_vs_baseline', '?'):>7} "
              f"{stage_s:>8} {stage_rate:>8}")
    print()


def main():
    log_recs = _json_lines(LOG)
    hist = _json_lines(HIST)
    fence_rows(log_recs)
    bench_rows(hist, "single-pair latency (config #2)",
               {"episodes": 1, "queries": 1})
    bench_rows(hist, "literal config #3 (64x10min x 4q)",
               {"episodes": 64, "queries": 4})
    bench_rows(hist, "spectrogram mode", {"mode": "spectrogram"})
    bench_rows(hist, "canonical batch (4x30min x 64q)",
               {"episodes": 4, "queries": 64})
    # stage status from the done-file, if present
    done = os.path.join(HERE, ".exp_stages_done")
    if os.path.exists(done):
        with open(done) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        markers = ("!fail", "!err", "!slow")
        ok = [ln for ln in lines if not ln.endswith(markers)]
        fails = [ln for ln in lines if ln.endswith("!fail")]
        errs = [ln for ln in lines if ln.endswith("!err")]
        slows = [ln for ln in lines if ln.endswith("!slow")]
        print(f"stages complete: {len(ok)} ({', '.join(ok)})")
        if fails:
            print(f"relay-death attempts: {', '.join(fails)}")
        if slows:
            print(f"over-budget (live relay) attempts: {', '.join(slows)}")
        if errs:
            print(f"deterministic failures: {', '.join(errs)}")


if __name__ == "__main__":
    main()
