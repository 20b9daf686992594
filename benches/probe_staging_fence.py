"""Probe 19: what ends the relay's pre-execution fast path during staging?

ANSWERED (round-4 A/B + round-5 interleaved repeats, PERF.md "Round-5
serial-fence repeats"): nothing does, because there is no reliable fast
path to end — host→device rate is weather at ALL volumes (the same
3.4 GB stage measured 8.7 MB/s to 1.19 GB/s within 35 min); suspect (c)
was closest but even "intrinsic to this size" was wrong. The two
reliable effects are monolithic >GB single puts (~8 MB/s — the splitter
stays) and the post-execution mode (~21 MB/s, `postexec` variant below).
The hypothesis framing is kept verbatim so the variant set documents
what the probe was built to separate.

PERF.md's "Relay upload throughput vs transfer size" measured chunked
puts at ~41-56 MB/s WITH per-put readback fences and hypothesized an
execution-free chunked stage "should ride the ~0.7 GB/s fast path" —
never tested end-to-end (VERDICT r3 #3): the literal config-#3 shape
stages 3.4 GB at ~61 MB/s even though stage_resident is execution-free.
Suspects: (a) the bench's untimed warmup put's ``block_until_ready``
flips the relay into its post-execution slow mode before staging starts,
(b) ``block_until_ready`` on the pieces themselves does, or (c) the slow
rate is intrinsic to this transfer size and fencing is irrelevant.

One fresh subprocess per variant (the fast path is per-process state —
any readback/execution ends it for everything after), all staging the
same SIZE_MB int16 buffer split into ≤ AUDIO_MATCHER_PUT_BYTES pieces:

  bench      warmup put + bur; all puts; bur each   (bench.py today)
  nowarm     no warmup;        all puts; bur each
  serial     warmup put + bur; put+bur per piece    (stage-as-you-fence)
  nofence    warmup put, NO bur; all puts (dispatch timed); bur at end
  postexec   warmup put + a tiny EXECUTION + readback first (ends the
             fast path by construction), then puts + bur — the
             post-execution rate the dispatch-ahead pipeline would see

Each subprocess prints one JSON line: per-phase seconds + MB/s, plus an
untimed integrity readback (first/last 64 elements of every piece must
round-trip — a lying fence shows up as a rate that ignores byte volume,
a lying transfer as a mismatch). Run on the real chip with python -u.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SIZE_MB = int(os.environ.get("SIZE_MB", "3392"))  # literal config-#3 bytes
VARIANTS = ("bench", "nowarm", "serial", "nofence", "postexec")


def make_buffer(n_bytes: int) -> np.ndarray:
    """Non-trivial int16 pattern, cheap to build (RNG over 1.7G elements
    would dominate the probe)."""
    block = np.arange(1 << 20, dtype=np.int16) * 7 + 3
    reps = -(-(n_bytes // 2) // len(block))
    return np.tile(block, reps)[: n_bytes // 2]


def run_variant(variant: str) -> None:
    import jax

    from audio_matcher_tpu.models.matcher import put_bytes_cap

    # untimed backend/session init WITHOUT any transfer: jax.devices()
    # brings the relay session up (~10 s fixed cost) but puts no bytes
    # and runs no program, so the pre-execution fast path is untouched.
    # Without this the "nowarm" variant would pay session init inside
    # its timed put phase — +10 s of noise on the one variant that
    # tests whether the warmup put itself ends the fast path.
    jax.devices()

    buf = make_buffer(SIZE_MB * 2**20)
    cap = put_bytes_cap()
    step = -(-buf.nbytes // cap)
    step = -(-len(buf) // step)
    pieces_host = [buf[i : i + step] for i in range(0, len(buf), step)]

    t_warm = 0.0
    if variant != "nowarm":
        t0 = time.perf_counter()
        w = jax.device_put(np.zeros(1024, np.int16))
        if variant != "nofence":
            w.block_until_ready()
        if variant == "postexec":
            # a real compiled execution + device→host readback: ends the
            # pre-execution fast path by construction
            import jax.numpy as jnp

            _ = np.asarray(jnp.asarray(w) * np.int16(2))[:8]
        t_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    if variant == "serial":
        pieces = []
        for p in pieces_host:
            d = jax.device_put(p)
            d.block_until_ready()
            pieces.append(d)
        t_put, t_fence = time.perf_counter() - t0, 0.0
    else:
        pieces = [jax.device_put(p) for p in pieces_host]
        t_put = time.perf_counter() - t0
        t0 = time.perf_counter()
        for d in pieces:
            d.block_until_ready()
        t_fence = time.perf_counter() - t0

    total = t_put + t_fence
    # untimed integrity: the bytes must actually be on the device
    ok = all(
        np.array_equal(np.asarray(d[:64]), p[:64])
        and np.array_equal(np.asarray(d[-64:]), p[-64:])
        for d, p in zip(pieces, pieces_host)
    )
    print(
        json.dumps(
            {
                "variant": variant,
                "size_mb": SIZE_MB,
                "pieces": len(pieces),
                "warmup_s": round(t_warm, 3),
                "put_s": round(t_put, 3),
                "fence_s": round(t_fence, 3),
                "mbps": round(SIZE_MB / total, 1),
                "dispatch_mbps": round(SIZE_MB / t_put, 1) if t_put else None,
                "integrity_ok": bool(ok),
            }
        ),
        flush=True,
    )
    if not ok:
        # a rate measured over bytes that did NOT round-trip is not data
        sys.exit(2)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # hold the inter-process chip lock across ALL variants (a concurrent
    # bench.py would corrupt both sides' timings; bench.py's lock is
    # CPU-disabled so smoke tests never wait)
    sys.path.insert(0, os.path.join(repo, "benches"))
    from exp_common import load_bench

    load_bench().acquire_bench_lock()
    only = os.environ.get("VARIANTS")
    # a dead relay mid-variant blocks device_put unboundedly; the bound
    # here (not in the caller) kills the actual blocked process so no
    # orphan keeps ~SIZE_MB of host RAM pinned on the 1-vCPU bench box
    budget_s = float(os.environ.get("VARIANT_BUDGET", "900"))
    worst = 0
    for variant in only.split(",") if only else VARIANTS:
        env = dict(os.environ, _PROBE_VARIANT=variant)
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, cwd=repo, timeout=budget_s,
            )
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = 124
        if rc != 0:
            print(f"[probe] variant {variant} FAILED rc={rc}",
                  file=sys.stderr, flush=True)
            if rc == 124:
                print("[probe] relay presumed dead; skipping the rest",
                      file=sys.stderr, flush=True)
                sys.exit(124)
            # signal deaths (OOM-killer SIGKILL → negative rc) must
            # surface as a POSITIVE exit, not max() to 0
            worst = max(worst, rc if rc > 0 else 1)
    # failed variants (OOM, integrity mismatch, ...) must not read as a
    # completed A/B to the experiment runner
    sys.exit(worst)


if __name__ == "__main__":
    v = os.environ.get("_PROBE_VARIANT")
    if v:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        run_variant(v)
    else:
        main()
