"""Probe: forward-side fusion A/B + residual decomposition at bench shape.

Measures, at the production slab shape (B=8 windows of a 60 s chunk,
fft_len 2^22, Q=64 → Qh=32 packed query pairs):
  1. old forward chain: dequant(whole-slab wire) → windows f32 → pad →
     zeros plane → fft_major → fft_minor
  2. fused forward: wire windows → fft_major_fwd_wire → fft_minor
  3. each full correlation (planes) pipeline old vs new
  4. decomposition: windows-assembly alone, forward alone, product pass,
     inverse major, peak kernel
One process (relay compiles are minutes per shape); fence with a >=1-d
readback. Run: python -u benches/probe_fwd_fuse.py > /tmp/fwd_fuse.log 2>&1
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SR = int(os.environ.get("PROBE_SR", "44100"))
CHUNK_SECS = float(os.environ.get("PROBE_CHUNK_SECS", "60"))
SNIP_SECS = float(os.environ.get("PROBE_SNIP_SECS", "8"))
Q = int(os.environ.get("PROBE_Q", "64"))
SLAB = int(os.environ.get("PROBE_SLAB", "8"))


def bench(name, fn, *args, reps=5):
    try:
        out = np.asarray(fn(*args))  # warm + fence
    except Exception as e:
        print(f"[probe] {name:44s} FAILED: {type(e).__name__}: {e}"[:200],
              flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"[probe] {name:44s} best {best * 1e3:8.2f} ms  "
          f"median {sorted(ts)[len(ts) // 2] * 1e3:8.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from audio_matcher_tpu.models.matcher import (
        dequantize_on_device,
        quantize_wire,
        windows_from_episode,
        window_rows,
    )
    from audio_matcher_tpu.ops.correlate import fft_length, prepare_snippet
    from audio_matcher_tpu.ops.pallas_fft import (
        corr_slab_vpu_planes,
        corr_slab_vpu_planes_wire,
        fft2_scrambled,
        fft_major,
        fft_major_fwd_wire,
        fft_minor,
        ifft_minor_product,
        scrambled_query_spectra,
        split_factors,
    )
    from audio_matcher_tpu.ops.peaks import (
        peaks_crop_width,
        pick_peaks_pallas_packed,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(3)
    m = int(SNIP_SECS * SR)
    chunk = int(CHUNK_SECS * SR)
    window = chunk + m + 2
    n = fft_length(window + m - 1)
    A, M = split_factors(n)
    crop = peaks_crop_width(window - m + 1, 512, "pallas")
    crop = min(-(-crop // (8 * M)) * (8 * M), n)
    print(f"chunk={chunk} window={window} n={n} A={A} M={M} crop={crop}",
          flush=True)

    snippets = (rng.standard_normal((Q, m)) * 0.2).astype(np.float32)
    t_r, t_i = jax.jit(
        scrambled_query_spectra, static_argnames=("fft_len", "pack")
    )(snippets, n, True)
    t_r, t_i = jax.device_put(t_r), jax.device_put(t_i)

    # staged wire slab: SLAB+k chunk rows
    k = window_rows(window, chunk)
    ep_len = (SLAB + k) * chunk
    episode_wire = jax.device_put(
        quantize_wire(
            (rng.standard_normal(ep_len) * 0.1).astype(np.float32), "int16"
        )
    )
    np.asarray(episode_wire[:4])  # fence upload
    print("staged", flush=True)

    distance = 480 * SR
    n_peaks = 4
    inv_pad = jnp.ones((2 * ((Q + 1) // 2),), jnp.float32)
    vq2 = jnp.full((SLAB * 2 * ((Q + 1) // 2),), window - m + 1, jnp.int32)

    def s1(*parts):
        return sum(
            jnp.sum(p.reshape(p.shape[0], -1)[..., :: 1009]) for p in parts
        ).reshape(1)

    # --- decomposition -------------------------------------------------
    @jax.jit
    def win_wire(ep):
        return s1(windows_from_episode(ep, 0, SLAB, chunk, window))

    @jax.jit
    def win_f32(ep):
        return s1(
            windows_from_episode(
                dequantize_on_device(ep), 0, SLAB, chunk, window
            )
        )

    @jax.jit
    def fwd_old(ep):
        w = windows_from_episode(
            dequantize_on_device(ep), 0, SLAB, chunk, window
        )
        w = jnp.pad(w, ((0, 0), (0, n - window)))
        xr, xi = fft2_scrambled(
            w, jnp.zeros_like(w), n, interpret=interpret
        )
        return s1(xr, xi)

    @jax.jit
    def fwd_new(ep):
        w = windows_from_episode(ep, 0, SLAB, chunk, window)
        w = jnp.pad(w, ((0, 0), (0, n - window)))
        xr, xi = fft_major_fwd_wire(
            w.reshape(SLAB, A, M), A, n, window, interpret=interpret
        )
        xr, xi = fft_minor(xr, xi, M, interpret=interpret)
        return s1(xr, xi)

    @jax.jit
    def fwd_new_major_only(ep):
        w = windows_from_episode(ep, 0, SLAB, chunk, window)
        w = jnp.pad(w, ((0, 0), (0, n - window)))
        xr, xi = fft_major_fwd_wire(
            w.reshape(SLAB, A, M), A, n, window, interpret=interpret
        )
        return s1(xr, xi)

    def planes_old(ep):
        w = windows_from_episode(
            dequantize_on_device(ep), 0, SLAB, chunk, window
        )
        return corr_slab_vpu_planes(w, t_r, t_i, crop, interpret=interpret)

    def planes_new(ep):
        w = windows_from_episode(ep, 0, SLAB, chunk, window)
        return corr_slab_vpu_planes_wire(
            w, t_r, t_i, crop, interpret=interpret
        )

    @jax.jit
    def full_old(ep):
        yr, yi = planes_old(ep)
        return s1(
            *pick_peaks_pallas_packed(
                yr, yi, jnp.tile(inv_pad, SLAB), vq2, distance, n_peaks,
                512, interpret=interpret,
            )
        )

    @jax.jit
    def full_new(ep):
        yr, yi = planes_new(ep)
        return s1(
            *pick_peaks_pallas_packed(
                yr, yi, jnp.tile(inv_pad, SLAB), vq2, distance, n_peaks,
                512, interpret=interpret,
            )
        )

    @jax.jit
    def planes_old_s(ep):
        return s1(*planes_old(ep))

    @jax.jit
    def planes_new_s(ep):
        return s1(*planes_new(ep))

    bench("noop floor", jax.jit(lambda ep: ep[0:1]), episode_wire)
    bench("windows wire (i16 slices+concat)", win_wire, episode_wire)
    bench("windows f32 (dequant+slices)", win_f32, episode_wire)
    bench("forward OLD (dequant+pad+zeros+maj+min)", fwd_old, episode_wire)
    bench("forward NEW major only (wire fused)", fwd_new_major_only,
          episode_wire)
    bench("forward NEW (wire fused maj+min)", fwd_new, episode_wire)
    bench("planes OLD (fwd+prod+invmaj)", planes_old_s, episode_wire)
    bench("planes NEW (fused fwd)", planes_new_s, episode_wire)
    bench("FULL slab OLD (planes+peaks)", full_old, episode_wire)
    bench("FULL slab NEW (planes+peaks)", full_new, episode_wire)
    return 0


if __name__ == "__main__":
    sys.exit(main())
