"""Benchmark: (episode, snippet)-pair audio-hours scanned per second per chip.

Config = BASELINE.json #3 (batch scan): 44.1 kHz episodes scanned for
10 s-class intro snippets via overlap-save chunked correlation with the
reference's defaults (chunk 60 s, min-distance 480 s, prominence 13),
staged once and scanned against every query. The baseline is the measured
single-core CPU throughput of the same per-pair pipeline semantics (scipy
rFFT + scipy find_peaks, single thread) — a stand-in for the Rust
reference's single-core realfft path, which publishes no numbers and can't
be built here (no cargo; BASELINE.md).

Prints ONE JSON line: {"metric", "ok", "value", "unit", "vs_baseline",
"device_resident_value", "device_resident_vs_baseline"}; exits nonzero
(and records nothing in the history) when the correctness check fails
or no backend appears within the acquisition budget. Backend
acquisition retries with backoff (relay outages observed run hours):
per-attempt probe timeout BENCH_BACKEND_TIMEOUT (default 180 s), total
budget BENCH_BACKEND_BUDGET (default 2400 s); on final failure the JSON
line still carries "last_good" — the newest same-fingerprint
benches/history.jsonl entry — so an outage can't erase the number. The
RUN phase is watchdog-bounded too (BENCH_RUN_BUDGET, default 2700 s):
a relay that dies mid-run hangs device ops forever, and the watchdog
emits the same evidence-carrying JSON before any outer timeout kill.
Knobs: BENCH_EPISODE_SECS, BENCH_EPISODES, BENCH_QUERIES, BENCH_SLAB,
BENCH_TRANSFER_DTYPE, BENCH_FFT_IMPL, BENCH_PEAKS_IMPL, BENCH_REPEATS
(median-of-N scan phase), BENCH_STAGE_RETRY_MBS / BENCH_STAGE_ATTEMPTS
(best-of-N pre-execution staging when a draw lands under the rate
floor) — the last three are timing methodology, not part of the
history fingerprint. The pcm bench's wire default is mulaw8 — the recommended
production wire on relay-class hosts (PERF.md "Wire recommendation";
positions sample-exact, bench-verified) — while the sweep CLI keeps the
lossless int16 default; BENCH_TRANSFER_DTYPE=int16 reproduces the older
canonical entries.

BENCH_MODE=spectrogram benches the second model family instead
(BASELINE config #4: log-mel fingerprints + tiled multi-query ZNCC,
`ShardedSpectrogramScanner`) against a single-core scipy pipeline with
the same semantics; its history entries carry a distinct fingerprint
(``"mode": "spectrogram"``) so both modes inherit the >15% regression
gate independently (VERDICT r3 #5 — config #4 previously lived only in
a one-off probe and could silently regress).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

SR = 44100
EPISODE_SECS = int(os.environ.get("BENCH_EPISODE_SECS", "1800"))
SNIPPET_SECS = 10.0
BASELINE_WINDOWS = 3  # windows to time for the CPU extrapolation


def make_audio(rng, secs, snippet, offsets):
    x = (rng.standard_normal(int(secs * SR)) * 0.05).astype(np.float32)
    for off in offsets:
        i = int(off * SR)
        x[i : i + len(snippet)] = snippet
    return x


def _measure_staged_scan(scanner, episode, transfer_dtype, n_episodes,
                         n_queries, label):
    """Shared stage→fence→warm→scan timing core for BOTH bench modes:
    all episode uploads happen BEFORE the first program execution (the
    host→device path of tunneled links degrades sharply once the
    execution stream starts — scanner construction and
    ``stage_resident`` are execution-free by contract). Staging time is
    included in the e2e number; returns seconds per (episode, snippet)
    pair (e2e, device-resident) and the primary query's peaks.

    NOTE: deliberately NO persistent compilation cache here. The axon
    relay bypasses it on TPU, and on CPU a cache dir shared across
    heterogeneous hosts can load AOT executables compiled for another
    machine type — observed to produce silently WRONG peak results
    (XLA logs a feature-mismatch error but still runs the executable).
    """
    import jax

    # untimed: first-touch link/backend init (a fixed ~10s session cost on
    # the relay, unrelated to data volume)
    jax.device_put(np.zeros(1024, np.int16)).block_until_ready()

    # untimed: the int16 wire samples stand in for the native decoder's
    # output (mpg123 decodes to int16; the f32 PCM scaling is applied on
    # device) — quantization is decode work, not scan work
    if transfer_dtype != "float32":
        # ONE definition of the wire grid (handles int16 AND mulaw8 —
        # a float pass-through would push mu-law companding into the
        # timed staging phase)
        from audio_matcher_tpu.models.matcher import quantize_wire

        episode_wire = quantize_wire(episode, transfer_dtype)
    else:
        episode_wire = episode

    # timed phase 1: upload the whole batch as one array (no device
    # execution has happened yet — construction is execution-free).
    # block_until_ready is a valid fence for TRANSFERS (measured stage
    # times track byte volume at the link's regime rate — weather at
    # all volumes, 8.7 MB/s–1.2 GB/s observed for the same 3.4 GB
    # stage; post-execution is the one reliably-slow mode (PERF.md
    # "Round-5 serial-fence repeats"); a lying fence would
    # return ~instantly at any volume). The readback-only fencing rule
    # (CLAUDE.md) is about fencing EXECUTIONS, and a readback here would
    # pay a timed per-shape slice compile instead.
    #
    # Staging-weather retry: the relay's host→device rate swings >10×
    # between attempts minutes apart (8.7 vs 851 MB/s for the SAME
    # buffer, PERF.md "Round-5 serial-fence repeats") and the e2e
    # number inherits whichever regime the single round-end run drew.
    # When an attempt lands below BENCH_STAGE_RETRY_MBS (default 250;
    # <=0 disables), re-stage up to BENCH_STAGE_ATTEMPTS (default 3)
    # times — every retry is still BEFORE the first program execution,
    # so no attempt touches the post-execution cliff — keep the
    # fastest attempt, and record every attempt's rate in the history
    # entry (stage_attempts_mb_s) so best-of-N runs are self-labeled.
    # This measures the framework's staging path, not the relay's
    # worst mood. Every attempt stages byte-identical data, so the
    # PREVIOUS attempt's buffers are freed BEFORE re-staging (never two
    # copies resident — a batch near half of HBM would otherwise OOM on
    # retry) and the loop keeps the newest buffers + the best TIME.
    retry_floor = float(os.environ.get("BENCH_STAGE_RETRY_MBS", "250"))
    attempts_max = max(int(os.environ.get("BENCH_STAGE_ATTEMPTS", "3")), 1)
    attempt_rates: list[float] = []
    staged = None
    t_stage = float("inf")
    for attempt in range(attempts_max):
        if staged is not None:
            for c in chunks:
                c.delete()
        t_stage0 = time.perf_counter()
        staged = scanner.stage_resident([episode_wire] * n_episodes)
        chunks = staged[0] if isinstance(staged[0], tuple) else (staged[0],)
        for c in chunks:
            c.block_until_ready()
        t_attempt = time.perf_counter() - t_stage0
        t_stage = min(t_stage, t_attempt)
        staged_bytes = sum(c.nbytes for c in chunks)
        rate = staged_bytes / 1e6 / t_attempt if t_attempt > 0 else float("inf")
        attempt_rates.append(round(rate, 1))
        if retry_floor <= 0 or rate >= retry_floor:
            break
        if attempt + 1 < attempts_max:
            print(
                f"[bench] {label}stage attempt {attempt + 1} hit staging "
                f"weather ({rate:.1f} MB/s < {retry_floor:.0f} floor) — "
                "re-staging (still pre-execution)",
                file=sys.stderr,
            )

    # untimed: compile + first run of the batch program
    scanner.scan_staged(staged, scale=True)
    jax.effects_barrier()

    # timed phase 2: scan the staged batch against all queries.
    # BENCH_REPEATS>1 takes the MEDIAN of N scans (scan_collect ends in a
    # device->host peak readback, so each call is a fenced sample) — the
    # relay's run-to-run swing is ~2x and small shapes (the single-pair
    # latency capture, BASELINE config #2) are one ~0.2 s sample
    # otherwise. Repeats are timing methodology, not configuration: they
    # do NOT enter the history fingerprint. Default 3: the canonical
    # scan is ~4 s, so the median costs ~8 s and keeps a one-off relay
    # hiccup out of the gated device-resident number.
    repeats = max(int(os.environ.get("BENCH_REPEATS", "3")), 1)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        results = scanner.scan_staged(staged, scale=True)
        times.append(time.perf_counter() - t0)
    t_compute = statistics.median(times)  # true median for even N too
    if repeats > 1:
        print(
            f"[bench] {label}scan repeats: median of {repeats} = "
            f"{t_compute:.3f}s (min {min(times):.3f}, max {max(times):.3f})",
            file=sys.stderr,
        )
    # correctness: every episode must find the primary query's plants
    peaks = [per_query[0] for per_query in results]

    n_pairs = n_episodes * n_queries
    print(
        f"[bench] {label}stage {n_episodes} episodes "
        f"({staged_bytes / 1e6:.0f}MB in {len(chunks)} put(s), "
        f"{transfer_dtype}): "
        f"{t_stage:.2f}s; batch scan x{n_queries} queries: "
        f"{t_compute:.2f}s (amortized per-pair match latency "
        f"{t_compute / n_pairs * 1e3:.0f} ms)",
        file=sys.stderr,
    )
    # staging-weather annotation (VERDICT r4 #6): the relay's stage rate
    # swings >10x run-to-run, and e2e inherits it — record the measured
    # rate so same-fingerprint e2e outliers in history.jsonl are
    # self-explaining (5.98 vs 25.3 pair-h/s was a 17.4 s vs 1.1 s stage)
    extras = {
        "stage_secs": round(t_stage, 3),
        "staged_mb": round(staged_bytes / 1e6, 1),
        "stage_mb_s": round(staged_bytes / 1e6 / t_stage, 1)
        if t_stage > 0
        else None,
        "scan_secs": round(t_compute, 4),
    }
    if len(attempt_rates) > 1:
        # best-of-N staging happened — label the entry with every
        # attempt's rate so readers see the weather that was retried
        extras["stage_attempts_mb_s"] = attempt_rates
    return ((t_stage + t_compute) / n_pairs, t_compute / n_pairs), extras, peaks


def measure_tpu(episode, snippets, config, n_episodes=None):
    """Batch-scan regime, BASELINE config #3 (see _measure_staged_scan)."""
    if n_episodes is None:
        n_episodes = int(os.environ.get("BENCH_EPISODES", "4"))
    from audio_matcher_tpu.parallel.mesh import make_mesh
    from audio_matcher_tpu.parallel.sweep import ShardedScanner

    scanner = ShardedScanner(snippets, SR, config, mesh=make_mesh(1))
    return _measure_staged_scan(
        scanner, episode, config.transfer_dtype, n_episodes,
        len(snippets), "",
    )


def measure_tpu_spectrogram(episode, snippets, config, n_episodes=None):
    """Spectrogram family, BASELINE config #4: log-mel + tiled
    multi-query ZNCC + on-device peaks as the resident program (same
    phases/fences — see _measure_staged_scan)."""
    if n_episodes is None:
        n_episodes = int(os.environ.get("BENCH_EPISODES", "4"))
    from audio_matcher_tpu.parallel.mesh import make_mesh
    from audio_matcher_tpu.parallel.sweep import ShardedSpectrogramScanner

    scanner = ShardedSpectrogramScanner(
        snippets, SR, config, mesh=make_mesh(1)
    )
    return _measure_staged_scan(
        scanner, episode, config.transfer_dtype, n_episodes,
        len(snippets), "spectrogram ",
    )


def measure_cpu_baseline(episode, snippet, config):
    """Single-core scipy pipeline: per-window rfft→conj-mult→irfft→find_peaks."""
    import scipy.fft
    import scipy.signal

    m = len(snippet)
    chunk = int(config.chunk_secs * SR)
    window = chunk + m
    L = scipy.fft.next_fast_len(window + m - 1, real=True)
    sf = np.conj(scipy.fft.rfft(snippet, L, workers=1))
    inv_ac = 1.0 / float(np.sum(snippet.astype(np.float64) ** 2))
    distance = int(config.distance_secs) * SR

    # best-of-3: the 1-vCPU bench host is noisy (relay + python share it);
    # give the CPU baseline its least-starved showing so vs_baseline is
    # conservative rather than inflated by host contention
    per_window = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for k in range(BASELINE_WINDOWS):
            win = episode[k * chunk : k * chunk + window]
            x = scipy.fft.rfft(win, L, workers=1)
            c = scipy.fft.irfft(x * sf, L, workers=1)[: len(win) - m + 1]
            c *= inv_ac
            scipy.signal.find_peaks(
                c, distance=min(distance, len(c) - 1), prominence=(0.13, None)
            )
        per_window = min(
            per_window, (time.perf_counter() - t0) / BASELINE_WINDOWS
        )
    windows_per_hour = 3600.0 / config.chunk_secs
    return 1.0 / (per_window * windows_per_hour)  # audio-hours/sec


def cpu_spectrogram_scores(episode, snippet, config, sr=None):
    """Single-core scipy/numpy ZNCC scores with the device path's exact
    semantics: hann STFT → mel matmul → log → FFT-based patch-flat ZNCC
    with cumsum window norms. Pinned against ops.stft.fingerprint_scores
    by tests/test_bench_history.py so vs_baseline can't silently measure
    a different algorithm."""
    import scipy.fft

    from audio_matcher_tpu.ops.stft import mel_filterbank

    cfg = config
    sr = SR if sr is None else sr
    fb_t = mel_filterbank(cfg.n_mels, cfg.n_fft, sr).T  # [bins, mels]
    win = np.hanning(cfg.n_fft).astype(np.float32)

    def logmel(x):
        n_frames = 1 + (len(x) - cfg.n_fft) // cfg.hop
        frames = np.lib.stride_tricks.sliding_window_view(x, cfg.n_fft)[
            :: cfg.hop
        ][:n_frames]
        z = scipy.fft.rfft(frames * win, axis=1, workers=1)
        return np.log((z.real**2 + z.imag**2) @ fb_t + 1e-8)

    snip_fp = logmel(snippet)
    t_s = snip_fp.shape[0]
    s0 = (snip_fp - snip_fp.mean()).astype(np.float32)
    snorm = float(np.sqrt((s0 * s0).sum()))
    patch = t_s * cfg.n_mels
    ep_fp = logmel(episode)
    n_valid = ep_fp.shape[0] - t_s + 1
    L = scipy.fft.next_fast_len(ep_fp.shape[0] + t_s - 1, real=True)
    S = scipy.fft.rfft(s0.T, n=L, axis=1, workers=1)  # [M, F]
    E = scipy.fft.rfft(ep_fp.T, n=L, axis=1, workers=1)
    corr = scipy.fft.irfft(
        (E * np.conj(S)).sum(axis=0), n=L, workers=1
    )[:n_valid]
    s1 = np.concatenate([[0.0], np.cumsum(ep_fp.sum(axis=1))])
    s2 = np.concatenate([[0.0], np.cumsum((ep_fp * ep_fp).sum(axis=1))])
    win_sum = s1[t_s:] - s1[:-t_s]
    win_norm2 = np.maximum(
        (s2[t_s:] - s2[:-t_s]) - win_sum * win_sum / patch, 0.0
    )
    return corr / (np.sqrt(win_norm2[:n_valid]) * snorm + 1e-8)


def measure_cpu_baseline_spectrogram(episode, snippet, config):
    """Single-core pipeline cost (see :func:`cpu_spectrogram_scores` for
    the semantics), timed on a 60 s slice and extrapolated — both stages
    are linear in episode length, and the full half-hour episode would
    take minutes on the 1-vCPU host."""
    import scipy.signal

    cfg = config
    slice_secs = min(60.0, len(episode) / SR)
    x = episode[: int(slice_secs * SR)]

    elapsed = float("inf")
    for _ in range(3):  # best-of-3 (see measure_cpu_baseline)
        t0 = time.perf_counter()
        scores = cpu_spectrogram_scores(x, snippet, cfg)
        frame_distance = max(int(cfg.distance_secs * SR / cfg.hop), 1)
        scipy.signal.find_peaks(
            scores, distance=min(frame_distance, max(len(scores) - 1, 1))
        )
        elapsed = min(elapsed, time.perf_counter() - t0)
    return 1.0 / (elapsed * 3600.0 / slice_secs)  # audio-hours/sec


def _history_path() -> str:
    """benches/history.jsonl next to this file; BENCH_HISTORY_PATH
    overrides (tests point it at a scratch file)."""
    return os.environ.get("BENCH_HISTORY_PATH") or os.path.join(
        os.path.dirname(__file__), "benches", "history.jsonl"
    )


def record_history(result: dict, fingerprint: dict, path: str | None = None) -> None:
    """Append this run to benches/history.jsonl (criterion's tracked-
    history role, VERDICT r2 #8) and compare against the latest prior
    entry with the SAME config fingerprint. Regressions >15% on the
    device-resident number (the repeatable one — e2e inherits the relay's
    2x staging swings) fail loudly; BENCH_STRICT=1 makes that a hard
    exit."""
    import datetime

    if path is None:
        path = _history_path()
    prev = None
    same_cfg = []
    try:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("tag") == "bench" and rec.get("fingerprint") == fingerprint:
                    same_cfg.append(rec)
                    prev = rec
    except FileNotFoundError:
        pass
    entry = {
        "tag": "bench",
        "when": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "fingerprint": fingerprint,
        "result": result,
    }
    cur = result["device_resident_value"]
    if prev is not None:
        old = prev["result"]["device_resident_value"]
        delta = (cur - old) / old if old else 0.0
        print(
            f"[bench] history: device-resident {old:.3f} -> {cur:.3f} "
            f"pair-h/s ({delta:+.1%} vs {prev['when']})",
            file=sys.stderr,
        )
        # regression gate vs the rolling BEST of the last 5 non-regressed
        # entries, not just the previous run: a regressed run must not
        # become the new baseline, and successive sub-threshold drops must
        # not compound undetected
        candidates = [
            r["result"]["device_resident_value"]
            for r in same_cfg[-5:]
            if not r.get("regression")
        ]
        if not candidates:
            # window full of flagged runs: reach back to the newest
            # non-regressed entry anywhere in history so a sustained
            # regression can never re-baseline itself (falling back to
            # the degraded value only when NO clean run ever existed)
            candidates = [
                r["result"]["device_resident_value"]
                for r in reversed(same_cfg)
                if not r.get("regression")
            ][:1] or [old]
        best = max(candidates)
        best_delta = (cur - best) / best if best else 0.0
        if best_delta < -0.15:
            entry["regression"] = True
            print(
                f"[bench] REGRESSION: device-resident throughput dropped "
                f"{-best_delta:.1%} vs the rolling best of this config "
                f"({best:.3f} pair-h/s, >{15}% threshold)",
                file=sys.stderr,
            )
            if os.environ.get("BENCH_STRICT"):
                with open(path, "a") as f:
                    f.write(json.dumps(entry) + "\n")
                sys.exit(1)
    with open(path, "a") as f:
        f.write(json.dumps(entry) + "\n")


def historical_best_baseline(
    fingerprint: dict, path: str | None = None
) -> float | None:
    """Fastest CPU-baseline showing ever recorded for this fingerprint.
    The 1-vCPU bench host shares its core with the relay process: a
    starved ``measure_cpu_baseline`` run inflates vs_baseline (history
    holds 272x and 614x for near-identical absolute pair-h/s at the
    canonical shape). Clamping the denominator to the least-starved
    baseline ever measured for the same fingerprint keeps the multiplier
    conservative and comparable across host weather; absolute pair-h/s
    values are never touched.

    Entries written since the clamp shipped carry the denominator
    verbatim (``cpu_baseline``) — read it directly. Older entries fall
    back to the device_resident value/vs ratio, whose round(,4)/round(,2)
    fields reconstruct the baseline to only ~2e-5 relative; preferring
    the exact field stops that rounding error from ratcheting upward
    through max() generation after generation."""
    if path is None:
        path = _history_path()
    best = None
    try:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("tag") != "bench" or rec.get("fingerprint") != fingerprint:
                    continue
                res = rec.get("result", {})
                b = res.get("cpu_baseline")
                if not b or b <= 0:
                    val = res.get("device_resident_value")
                    vs = res.get("device_resident_vs_baseline")
                    if not (val and vs and val > 0 and vs > 0):
                        continue
                    b = val / vs
                if best is None or b > best:
                    best = b
    except FileNotFoundError:
        pass
    return best


def baseline_provenance(baseline: float, measured: float) -> dict:
    """History-entry fields recording vs_baseline's denominator:
    ``cpu_baseline`` is always written (at 6 decimals — the exact value
    ``historical_best_baseline`` reads back, so the clamp never has to
    reconstruct it from rounded value/vs ratios), plus
    ``cpu_baseline_measured`` when the clamp replaced a starved
    measurement (so forensics never need the stderr log)."""
    fields = {"cpu_baseline": round(baseline, 6)}
    if baseline != measured:
        fields["cpu_baseline_measured"] = round(measured, 6)
    return fields


def clamped_baseline(measured: float, fingerprint: dict) -> float:
    """max(measured, historical best) — see historical_best_baseline."""
    hist = historical_best_baseline(fingerprint)
    if hist is not None and hist > measured:
        print(
            f"[bench] cpu baseline measured {measured:.4f} pair-h/s is "
            f"below this fingerprint's least-starved showing "
            f"({hist:.4f}); using the historical best so vs_baseline "
            "stays conservative under host contention",
            file=sys.stderr,
        )
        return hist
    return measured


def make_config():
    """The bench's MatchConfig from env knobs (shared by the run and the
    failure path's fingerprint lookup)."""
    from audio_matcher_tpu.models.matcher import MatchConfig

    return MatchConfig(
        slab=int(os.environ.get("BENCH_SLAB", "8")),
        # an explicit BENCH_SLAB pins the slab for A/Bs; otherwise the
        # production adaptive pick (pick_slab) applies
        slab_auto="BENCH_SLAB" not in os.environ,
        # the bench defaults to the measured-best production wire for
        # relay-class hosts (PERF.md "Wire recommendation": mulaw8 is
        # 29.1 vs 25.3 pair-h/s e2e at this shape, positions sample-
        # exact, half the staged bytes = half the weather exposure);
        # the sweep CLI's default stays int16 — the lossless contract
        transfer_dtype=os.environ.get("BENCH_TRANSFER_DTYPE", "mulaw8"),
        # measured winners on v5e (benches/probe_pallas_fft.py + bench A/B):
        # the pallas VPU FFT (9.81 pair-h/s e2e vs 9.18 with xla_packed)
        # + the single-pass pallas peak kernel
        fft_impl=os.environ.get("BENCH_FFT_IMPL", "vpu"),
        peaks_impl=os.environ.get("BENCH_PEAKS_IMPL", "pallas"),
    )


def make_spec_config():
    """The spectrogram bench's config from env knobs (BENCH_MODE=
    spectrogram). Defaults match the hardware-measured probe shape
    (benches/probe_spectrogram.py: int16 wire, n_fft 1024 / hop 256 /
    64 mels — hop divides n_fft so framing stays on the sliced path)."""
    from audio_matcher_tpu.models.spectrogram import SpectrogramConfig

    return SpectrogramConfig(
        transfer_dtype=os.environ.get("BENCH_TRANSFER_DTYPE", "int16"),
    )


def spec_queries_default() -> int:
    """BENCH_QUERIES default for spectrogram mode: 8, the probe's
    measured shape (the pcm mode's 64 amortizes staging; fingerprint
    NCC is per-query cheap enough that 8 already saturates)."""
    return int(os.environ.get("BENCH_QUERIES", "8"))


def expected_fingerprint_spec(config, backend: str = "tpu") -> dict:
    """Spectrogram-mode history fingerprint (same no-backend-needed
    contract as :func:`expected_fingerprint`; the ``mode`` key keeps it
    disjoint from every pcm entry)."""
    return {
        "backend": backend,
        "mode": "spectrogram",
        "episode_secs": EPISODE_SECS,
        "episodes": int(os.environ.get("BENCH_EPISODES", "4")),
        "queries": spec_queries_default(),
        "n_fft": config.n_fft,
        "hop": config.hop,
        "n_mels": config.n_mels,
        "transfer_dtype": config.transfer_dtype,
        **(
            {"put_cap": os.environ["AUDIO_MATCHER_PUT_BYTES"]}
            if "AUDIO_MATCHER_PUT_BYTES" in os.environ
            else {}
        ),
    }


def current_fingerprint(backend: str = "tpu") -> dict:
    """The fingerprint of THIS invocation's mode/config (shared by the
    run and the no-backend failure path's history lookup)."""
    if os.environ.get("BENCH_MODE", "pcm") == "spectrogram":
        return expected_fingerprint_spec(make_spec_config(), backend)
    return expected_fingerprint(make_config(), backend)


def expected_fingerprint(config, backend: str = "tpu") -> dict:
    """The history fingerprint this configuration records. Computable
    WITHOUT touching a JAX backend (module imports don't initialize one)
    so the no-backend failure path can still look up history evidence;
    ``backend`` defaults to the bench's target platform."""
    from audio_matcher_tpu.models.matcher import effective_slab as _eff

    # same chunk rounding as the scanners (int(round(...))) so the
    # fingerprint records the slab the run actually uses
    chunk = int(round(config.chunk_secs * SR))
    n_samples = int(EPISODE_SECS * SR)
    return {
        "backend": backend,
        "episode_secs": EPISODE_SECS,
        "episodes": int(os.environ.get("BENCH_EPISODES", "4")),
        "queries": int(os.environ.get("BENCH_QUERIES", "64")),
        # the EFFECTIVE slab (adaptive pick resolved for this episode
        # length), so history entries from explicit BENCH_SLAB A/Bs
        # and adaptive runs of the same shape share a fingerprint
        "slab": _eff(config, max(-(-n_samples // chunk), 1)),
        "transfer_dtype": config.transfer_dtype,
        "fft_impl": config.fft_impl,
        "peaks_impl": config.peaks_impl,
        # piece-cap A/Bs (runner latency stages) must not share a
        # fingerprint with uncapped runs — the cap is exactly what moves
        # the e2e number. Only present when explicitly set, so every
        # pre-existing history entry keeps matching default runs.
        **(
            {"put_cap": os.environ["AUDIO_MATCHER_PUT_BYTES"]}
            if "AUDIO_MATCHER_PUT_BYTES" in os.environ
            else {}
        ),
    }


def _print_failure_evidence(metric: str, error: str) -> None:
    """Emit the failure JSON line that still carries evidence: the newest
    history entry with this run's fingerprint (``last_good``), so a relay
    outage at capture time can't erase the round's number (VERDICT r3 #2
    — round 3's 25.4/32.0 pair-h/s run sat in history while the artifact
    recorded null)."""
    fingerprint = current_fingerprint()
    last_good = None
    path = _history_path()
    try:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if (
                    rec.get("tag") == "bench"
                    and rec.get("fingerprint") == fingerprint
                    and not rec.get("regression")
                ):
                    last_good = rec
    except FileNotFoundError:
        pass
    out = {
        "metric": metric,
        "ok": False,
        "error": error,
        "fingerprint": fingerprint,
        "last_good": last_good,
    }
    print(json.dumps(out))


def _fail_no_backend(budget_s: float) -> None:
    """Exit 3 with ``last_good`` history evidence."""
    print(
        f"bench: no JAX backend within {budget_s:.0f}s "
        "(relay down?) — aborting instead of hanging. "
        "Set BENCH_BACKEND_BUDGET / BENCH_BACKEND_TIMEOUT to adjust.",
        file=sys.stderr,
    )
    _print_failure_evidence(
        "no-backend failure (relay outage at capture time)",
        f"no JAX backend within {budget_s:.0f}s",
    )
    raise SystemExit(3)


def arm_run_watchdog() -> None:
    """Bound the RUN phase too. Backend acquisition only proves the relay
    answered a probe; if it dies mid-run the bench blocks forever inside
    a device op (device_put / block_until_ready — the r3 MULTICHIP
    artifact died rc=124 exactly this hang class) and the caller's
    eventual timeout KILL records nothing. A daemon watchdog emits the
    same evidence-carrying failure JSON and exits 3 first, so even a
    degraded relay (probes answer, transfers hang) can't erase the
    round's number. BENCH_RUN_BUDGET seconds (default 2700 — healthy
    runs finish in minutes and first-process remote compiles in 5–10,
    while the driver/runner stage bounds are ≥3600 so this exit wins the
    race); <=0 disables. CPU runs (tests call main() in-process) are
    exempt: nothing on that backend can hang on a relay."""
    budget_s = float(os.environ.get("BENCH_RUN_BUDGET", "2700"))
    if budget_s <= 0 or os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    import threading

    def fire():
        time.sleep(budget_s)
        # still alive at the deadline — the run is hung; a completed
        # main() would have exited the process (daemon thread) already
        print(
            f"bench: run phase exceeded {budget_s:.0f}s after backend "
            "acquisition (relay died mid-run?) — emitting last-good "
            "evidence and aborting. Set BENCH_RUN_BUDGET to adjust.",
            file=sys.stderr,
        )
        _print_failure_evidence(
            "hung-run failure (relay died mid-run?)",
            f"run phase exceeded {budget_s:.0f}s after backend "
            "acquisition",
        )
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()


def probe_backend_once(timeout_s: float) -> bool:
    """ONE bounded subprocess probe of the default backend (``import jax;
    jax.devices()`` blocks forever in-process when the axon relay is
    down, and a blocked init thread can't be retried — a subprocess
    can). Shared by :func:`acquire_backend` and the experiment runner's
    relay wait so the probe policy can't drift between them."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=max(timeout_s, 30.0),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def acquire_backend(per_attempt_s: float, budget_s: float) -> None:
    """Bounded backend acquisition with retry + backoff. When the axon
    relay is down, ``jax.devices()`` blocks forever inside the first
    backend touch — observed outages run HOURS (round 3's single 600 s
    window lost the whole capture) — so probe in a SUBPROCESS (clean
    backend state per attempt; a blocked in-process init thread can't be
    retried) every ~4 min until ``budget_s`` runs out, then initialize
    in-process once a probe answers. A healthy relay answers in seconds;
    legit slow REMOTE COMPILES happen later and are not under this
    clock. Exits 3 with ``last_good`` history evidence on failure."""
    import threading

    t_end = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        left = t_end - time.monotonic()
        if probe_backend_once(min(per_attempt_s, left)):
            break
        left = t_end - time.monotonic()
        if left <= 0:
            _fail_no_backend(budget_s)
        print(
            f"[bench] backend probe {attempt} failed; retrying "
            f"({left:.0f}s of budget left)",
            file=sys.stderr,
        )
        time.sleep(min(240.0, max(left, 1.0)))

    # a clean probe answered — init this process's backend, still bounded
    # (the relay could die between the probe and here)
    got: dict = {}

    def probe():
        import jax

        got["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(max(per_attempt_s, 120.0))
    if "devices" not in got:
        _fail_no_backend(budget_s)
    print(f"[bench] backend: {got['devices']}", file=sys.stderr)


def make_bench_inputs(n_queries):
    """Deterministic snippets/offsets/episode shared by BOTH bench modes.
    Query lengths 10–13.5 s: varied (exercises per-query valid masking)
    while keeping the pcm FFT bucket at 2^22 for any query count; plants
    stay inside shrunken BENCH_EPISODE_SECS runs."""
    rng = np.random.default_rng(42)
    snippets = [
        np.clip(
            rng.standard_normal(
                int((SNIPPET_SECS + 0.5 * (q % 8)) * SR)
            ) * 0.15,
            -0.45, 0.45,
        ).astype(np.float32)
        for q in range(n_queries)
    ]
    offsets = [
        o for o in (21.0, EPISODE_SECS * 0.55)
        if (o + SNIPPET_SECS + 0.5) < EPISODE_SECS
    ] or [0.0]
    episode = make_audio(rng, EPISODE_SECS, snippets[0], offsets)
    return snippets, offsets, episode


def check_plants(peaks, offsets, distance_secs, tol, label="") -> bool:
    """Every episode must find the primary query's plants within ``tol``
    samples. When a shrunken BENCH_EPISODE_SECS puts the plants within
    the min-distance, suppression legitimately keeps only one (and exact
    height ties make WHICH one nondeterministic on threaded-CPU runs) —
    the check then relaxes to at-least-one-near-a-plant. The default
    config keeps them ≥ distance apart → strict zip-wise check."""
    want = sorted(int(o * SR) for o in offsets)
    gaps_ok = len(offsets) > 1 and (
        offsets[1] - offsets[0]
    ) >= distance_secs
    ok = True
    for e, ep_peaks in enumerate(peaks):
        got = sorted(p.position for p in ep_peaks if p.height > 0.5)
        if gaps_ok:
            good = len(got) == len(want) and all(
                abs(a - b) <= tol for a, b in zip(got, want)
            )
        else:
            good = len(got) >= 1 and all(
                any(abs(g - w) <= tol for w in want) for g in got
            )
        if not good:
            ok = False
            print(
                f"bench correctness check failed ({label}episode {e}): "
                f"got {got}, want {want} (±{tol})",
                file=sys.stderr,
            )
    return ok


def main_spectrogram() -> int:
    """BENCH_MODE=spectrogram body (backend already acquired)."""
    n_episodes = int(os.environ.get("BENCH_EPISODES", "4"))
    n_queries = spec_queries_default()
    snippets, offsets, episode = make_bench_inputs(n_queries)
    config = make_spec_config()

    (per_pair, per_pair_scan), extras, peaks = measure_tpu_spectrogram(
        episode, snippets, config, n_episodes
    )
    hours = EPISODE_SECS / 3600.0
    value = hours / per_pair
    value_scan = hours / per_pair_scan

    # offsets are frame-accurate → tolerance is one hop
    ok = check_plants(
        peaks, offsets, config.distance_secs, config.hop, "spectrogram, "
    )

    import jax

    fingerprint = expected_fingerprint_spec(config, backend=jax.default_backend())
    baseline_measured = measure_cpu_baseline_spectrogram(
        episode, snippets[0], config
    )
    baseline = clamped_baseline(baseline_measured, fingerprint)
    print(
        f"[bench] spectrogram: {hours:.2f} pair-hours per {per_pair:.2f}s "
        f"({value:.3f} pair-h/s end-to-end, {value_scan:.3f} "
        f"device-resident); cpu single-core baseline {baseline:.4f} "
        f"pair-h/s; matches {'OK' if ok else 'WRONG'}",
        file=sys.stderr,
    )
    result = {
        "metric": "(episode,snippet)-pair audio-hours scanned/sec/chip "
        f"(spectrogram mode: {n_episodes} episodes x {n_queries} query "
        "fingerprints, 44.1kHz log-mel ZNCC; staging included)",
        "ok": ok,
        "value": round(value, 4),
        "unit": "pair_audio_hours/s",
        "vs_baseline": round(value / baseline, 2),
        "device_resident_value": round(value_scan, 4),
        "device_resident_vs_baseline": round(value_scan / baseline, 2),
        **baseline_provenance(baseline, baseline_measured),
        **extras,
    }
    if not ok:
        print(json.dumps(result))
        return 2
    record_history(result, fingerprint)
    print(json.dumps(result))
    return 0


_BENCH_LOCK_FH = None  # module-held: flock released on process exit


def acquire_bench_lock() -> None:
    """Advisory inter-process lock so two bench-class processes never
    time device work on the one chip concurrently (the driver's
    end-of-round ``python bench.py`` vs a running experiment-runner
    stage would corrupt BOTH timings). Waits up to ``BENCH_LOCK_WAIT``
    seconds (default 1800 — runner stages finish in minutes), then
    PROCEEDS with a loud warning: a contended number beats no number.
    ``BENCH_LOCK_WAIT=0`` disables. The lock dies with the process, so
    a killed holder can't wedge later runs."""
    global _BENCH_LOCK_FH
    import fcntl
    import tempfile

    wait_s = float(os.environ.get("BENCH_LOCK_WAIT", "1800"))
    if wait_s <= 0:
        return
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # CPU runs (tests, smoke probes) share no chip — and repeated
        # bench mains inside ONE process would block on their own lock
        # (flock treats each open() as a distinct holder)
        return
    path = os.path.join(tempfile.gettempdir(), "am_tpu_bench.lock")
    fh = open(path, "a")
    t_end = time.monotonic() + wait_s
    warned = False
    while True:
        try:
            fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            _BENCH_LOCK_FH = fh
            return
        except OSError:
            if time.monotonic() >= t_end:
                print(
                    "[bench] WARNING: bench lock still held after "
                    f"{wait_s:.0f}s — proceeding; timings may be "
                    "contended by another bench process",
                    file=sys.stderr,
                )
                fh.close()
                return
            if not warned:
                print(
                    "[bench] another bench-class process holds the chip "
                    "lock; waiting",
                    file=sys.stderr,
                )
                warned = True
            time.sleep(10.0)


def main() -> int:
    acquire_bench_lock()
    acquire_backend(
        float(os.environ.get("BENCH_BACKEND_TIMEOUT", "180")),
        float(os.environ.get("BENCH_BACKEND_BUDGET", "2400")),
    )
    arm_run_watchdog()
    if os.environ.get("BENCH_MODE", "pcm") == "spectrogram":
        return main_spectrogram()
    n_episodes = int(os.environ.get("BENCH_EPISODES", "4"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "64"))
    snippets, offsets, episode = make_bench_inputs(n_queries)

    config = make_config()

    (per_pair, per_pair_scan), extras, peaks = measure_tpu(
        episode, snippets, config
    )
    hours = EPISODE_SECS / 3600.0
    value = hours / per_pair  # pair audio-hours per second
    value_scan = hours / per_pair_scan  # device-resident (staging excluded)

    # sample-exact matching → tolerance 1
    ok = check_plants(peaks, offsets, config.distance_secs, 1)

    import jax

    fingerprint = expected_fingerprint(config, backend=jax.default_backend())
    baseline_measured = measure_cpu_baseline(episode, snippets[0], config)
    baseline = clamped_baseline(baseline_measured, fingerprint)
    print(
        f"[bench] {hours:.2f} pair-hours per {per_pair:.2f}s "
        f"({value:.3f} pair-h/s end-to-end, {value_scan:.3f} pair-h/s "
        f"device-resident); cpu single-core baseline {baseline:.4f} "
        f"pair-h/s; matches {'OK' if ok else 'WRONG'}",
        file=sys.stderr,
    )
    result = {
        "metric": "(episode,snippet)-pair audio-hours scanned/sec/"
        f"chip (batch scan: {n_episodes} episodes x "
        f"{n_queries} query snippets, 44.1kHz; staging included)",
        "ok": ok,
        "value": round(value, 4),
        "unit": "pair_audio_hours/s",
        "vs_baseline": round(value / baseline, 2),
        "device_resident_value": round(value_scan, 4),
        "device_resident_vs_baseline": round(value_scan / baseline, 2),
        **baseline_provenance(baseline, baseline_measured),
        **extras,
    }
    if not ok:
        # a wrong-but-fast run must not become the rolling best the
        # regression gate compares against, and callers reading the JSON
        # or exit code must see the failure
        print(json.dumps(result))
        return 2

    record_history(result, fingerprint)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
