"""Probe 11: spectrogram-mode batch-scan throughput on the real chip
(BASELINE config #4 at batch scale).

Mirrors bench.py's stage-then-scan shape for the spectrogram family:
0.5 h 44.1 kHz episodes × several 10 s-class query fingerprints, int16
wire staging, log-mel + tiled ZNCC + on-device peaks as one resident
program. Prints pair audio-hours/sec. Run with python -u, no pipes.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
EPISODE_SECS = int(os.environ.get("SPEC_EPISODE_SECS", "1800"))
N_EPISODES = int(os.environ.get("SPEC_EPISODES", "4"))
N_QUERIES = int(os.environ.get("SPEC_QUERIES", "8"))


def main():
    import jax

    from audio_matcher_tpu.models.spectrogram import SpectrogramConfig
    from audio_matcher_tpu.parallel.mesh import make_mesh
    from audio_matcher_tpu.parallel.sweep import ShardedSpectrogramScanner

    rng = np.random.default_rng(42)
    snippets = [
        np.clip(
            rng.standard_normal(int((10.0 + 0.5 * (q % 8)) * SR)) * 0.15,
            -0.45, 0.45,
        ).astype(np.float32)
        for q in range(N_QUERIES)
    ]
    episode = (
        rng.standard_normal(EPISODE_SECS * SR) * 0.05
    ).astype(np.float32)
    offsets = [21.0, EPISODE_SECS * 0.55]
    for off in offsets:
        i = int(off * SR)
        episode[i : i + len(snippets[0])] = snippets[0]

    cfg = SpectrogramConfig(transfer_dtype="int16")
    sc = ShardedSpectrogramScanner(snippets, SR, cfg, mesh=make_mesh(1))

    jax.device_put(np.zeros(1024, np.int16)).block_until_ready()
    wire = np.clip(
        np.round(episode * 65535.0), -32768, 32767
    ).astype(np.int16)

    t0 = time.perf_counter()
    staged = sc.stage_resident([wire] * N_EPISODES)
    jax.block_until_ready(staged[0])
    t_stage = time.perf_counter() - t0
    print(f"[probe] staged {N_EPISODES} episodes in {t_stage:.2f}s",
          flush=True)

    res = sc.scan_staged(staged)  # compile + warmup
    jax.effects_barrier()
    t0 = time.perf_counter()
    res = sc.scan_staged(staged)
    t_scan = time.perf_counter() - t0

    hop = cfg.hop
    ok = True
    full = [int(o * SR / hop) * hop for o in offsets]
    # plants closer than the min-distance suppress down to one
    want = (
        full
        if offsets[1] - offsets[0] >= cfg.distance_secs
        else full[:1]
    )
    for e, per_q in enumerate(res):
        got = sorted(p.position for p in per_q[0])
        if len(got) != len(want) or any(
            abs(g - w) > hop for g, w in zip(got, want)
        ):
            ok = False
            print(f"[probe] episode {e} MISMATCH: {got} vs {want}",
                  flush=True)
    n_pairs = N_EPISODES * N_QUERIES
    hours = EPISODE_SECS / 3600.0
    print(
        f"[probe] spectrogram batch scan x{N_QUERIES} queries: "
        f"{t_scan:.2f}s ({hours / ((t_stage + t_scan) / n_pairs):.2f} "
        f"pair-h/s e2e, {hours / (t_scan / n_pairs):.2f} device-resident); "
        f"matches {'OK' if ok else 'WRONG'}",
        flush=True,
    )


if __name__ == "__main__":
    main()
