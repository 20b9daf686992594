"""A/B the streaming decode→stage path (ROADMAP #1) on real hardware.

Legacy: prefetch decodes f32, stage quantizes + allocates a fresh zeroed
buffer per group. Streaming: prefetch decodes straight to the int16 wire
(native decoder), stage memcpys rows into a reusable arena.

One process, both variants share compiled shapes. Run:
    python -u benches/probe_stream_stage.py > /tmp/stream_stage.log 2>&1
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from audio_matcher_tpu.hostio.decode import encode_audio, native_available
from audio_matcher_tpu.models.matcher import MatchConfig
from audio_matcher_tpu.parallel import sweep as sweep_mod
from audio_matcher_tpu.parallel.mesh import make_mesh

SR = 44100
EP_SECS = 120
N_FILES = 32


def build_archive(root: Path):
    rng = np.random.default_rng(11)
    k = np.hanning(9)
    snippet = (
        np.convolve(rng.standard_normal(3 * SR), k / k.sum(), mode="same")
        * 0.3
    ).astype(np.float32)
    paths = []
    for e in range(N_FILES):
        ep = (
            np.convolve(
                rng.standard_normal(EP_SECS * SR), k / k.sum(), mode="same"
            )
            * 0.04
        ).astype(np.float32)
        at = (5 + 3 * (e % 20)) * SR
        ep[at : at + len(snippet)] = snippet
        p = root / f"ep{e:02d}.mp3"
        encode_audio(p, SR, ep)
        paths.append(p)
    return snippet, paths


def run_sweep(paths, snippet, legacy: bool, group_size=None):
    cfg = MatchConfig(transfer_dtype="int16")
    mesh = make_mesh()
    if legacy:
        # force the r2 path: f32 decode (quantize on the critical path),
        # no arena (fresh zeroed buffer per group)
        from audio_matcher_tpu.hostio import prefetch as prefetch_mod

        orig_pref = prefetch_mod.decode_prefetched

        def legacy_prefetch(todo, depth=2, workers=2, **_kw):
            return orig_pref(todo, depth=depth, workers=workers)

        orig_stage = sweep_mod.ShardedScanner.stage_resident

        def legacy_stage(self, episodes, arena=None, pad_to=None):
            # drop the arena → fresh zeroed buffer per group (r2 path)
            return orig_stage(self, episodes, None, pad_to)

        prefetch_mod.decode_prefetched = legacy_prefetch
        sweep_mod.ShardedScanner.stage_resident = legacy_stage
        try:
            t0 = time.perf_counter()
            results = sweep_mod.sweep_archive(
                paths, [snippet], SR, cfg, mesh=mesh, group_size=group_size
            )
            dt = time.perf_counter() - t0
        finally:
            prefetch_mod.decode_prefetched = orig_pref
            sweep_mod.ShardedScanner.stage_resident = orig_stage
    else:
        t0 = time.perf_counter()
        results = sweep_mod.sweep_archive(
            paths, [snippet], SR, cfg, mesh=mesh, group_size=group_size
        )
        dt = time.perf_counter() - t0
    n_peaks = sum(
        1 for per_q in results.values() for pks in per_q for p in pks
        if p.height > 0.5
    )
    return dt, n_peaks


def host_side_ab(paths):
    """Pure host-side decode→wire-buffer A/B, no device: isolates the
    mechanism (i16 decode + arena reuse vs f32 decode + quantize + fresh
    zeroed buffer) from relay variance. Groups of 8 emulate a mesh host."""
    from audio_matcher_tpu.hostio.decode import read_audio, read_audio_int16
    from audio_matcher_tpu.models.matcher import (
        StagingArena, quantize_wire, wire_buffer,
    )

    G = 8
    n_pad = EP_SECS * SR + 8192  # mp3 encoder delay adds ~2.5k samples
    for name in ("legacy", "streaming", "legacy", "streaming"):
        t0 = time.perf_counter()
        if name == "legacy":
            for g in range(0, len(paths), G):
                buf = wire_buffer((G, n_pad), "int16")
                for i, p in enumerate(paths[g : g + G]):
                    _, samples = read_audio(p)  # f32
                    buf[i, : len(samples)] = quantize_wire(samples, "int16")
                buf.sum()  # keep it alive / touched
        else:
            arena = StagingArena("int16")
            for g in range(0, len(paths), G):
                arena.get(G, n_pad)
                for i, p in enumerate(paths[g : g + G]):
                    _, wire = read_audio_int16(p)
                    arena.write_row(G, n_pad, i, wire)
        dt = time.perf_counter() - t0
        print(
            f"host-only {name:9s}: {dt:6.2f}s decode+stage for "
            f"{len(paths)} files", flush=True,
        )


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    if not native_available("mp3_encode"):
        print("no native mp3 encoder; abort")
        return 1
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        t0 = time.perf_counter()
        snippet, paths = build_archive(root)
        print(f"built {N_FILES}x{EP_SECS}s mp3s in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        host_side_ab(paths)
        if os.environ.get("PROBE_HOST_ONLY"):
            return 0
        group = int(os.environ.get("PROBE_GROUP", "0")) or None
        # warmup: compile the scan shapes (both variants share them)
        dt, np_ = run_sweep(paths[:2], snippet, legacy=False,
                            group_size=group)
        print(f"warmup 2 files: {dt:.2f}s ({np_} peaks)", flush=True)
        variants = [("streaming", False), ("legacy", True)] * 2
        if group:
            # group A/B instead: grouped vs per-file dispatch, streaming
            variants = [(f"group={group}", False), ("group=1", False)] * 2
        for label, legacy in variants:
            g = group if label.startswith("group=") and label != "group=1" \
                else (1 if label == "group=1" else group)
            dt, peaks = run_sweep(paths, snippet, legacy=legacy, group_size=g)
            rate = N_FILES * EP_SECS / 3600 / dt
            print(
                f"{label:9s}: {dt:6.2f}s for {N_FILES} files "
                f"({rate:.2f} audio-h/s, {peaks} strong peaks)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
