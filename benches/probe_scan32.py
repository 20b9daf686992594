"""Probe 9: cumulative-stage timing of one Q=32 resident-scan slab.

Times truncated versions of the exact production slab body (dequant →
windows → forward FFT → fused minor-product → cropped major-inverse →
packed peaks) so each stage's cost is the difference of consecutive
rows. Run with python -u, no pipes (real TPU; ~5 remote compiles).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
CHUNK = 60 * SR
Q = 32
MS = [int((10.0 + 0.5 * (q % 8)) * SR) for q in range(Q)]
OVERLAP = max(MS) + 2
WINDOW = CHUNK + OVERLAP
FFT = 1 << (WINDOW + max(MS) - 1).bit_length()
SLAB = 8
DIST = 480 * SR
BLOCK = 256


def bench(name, fn, *args, reps=3):
    try:
        out = float(np.asarray(fn(*args)).ravel()[0])
    except Exception as e:
        print(f"[probe] {name:44s} FAILED: {type(e).__name__}: {e}"[:180],
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args)).ravel()[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe] {name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from audio_matcher_tpu.models.matcher import dequantize_on_device
    from audio_matcher_tpu.ops.pallas_fft import (
        fft2_scrambled,
        fft_major,
        ifft_minor_product,
        scrambled_query_spectra,
        split_factors,
    )
    from audio_matcher_tpu.ops.peaks import (
        peaks_crop_width,
        pick_peaks_pallas_packed,
    )

    A, M = split_factors(FFT)
    crop = min(peaks_crop_width(WINDOW - min(MS) + 1, BLOCK, "pallas"), FFT)
    a_crop = crop // M
    rng = np.random.default_rng(0)
    n_pad = SLAB * CHUNK + OVERLAP
    episode = jax.device_put(
        (rng.standard_normal(n_pad) * 3000).astype(np.int16)
    )
    qpad = np.zeros((Q, FFT), np.float32)
    for q, m in enumerate(MS):
        qpad[q, :m] = rng.standard_normal(m)
    t_r, t_i = jax.jit(
        scrambled_query_spectra, static_argnames=("fft_len", "pack")
    )(jnp.asarray(qpad[:, : max(MS)]), FFT, True)
    inv_ac = jnp.ones((Q,), jnp.float32) * 0.5
    mvec = jnp.asarray(MS, jnp.int32)
    jax.block_until_ready((episode, t_r, t_i))
    print(f"[probe] setup done fft={FFT} crop={crop} Qh={t_r.shape[0]}",
          flush=True)

    def s1(x):
        return jnp.sum(
            x.reshape(-1)[:: max(x.size // 4096, 1)].astype(jnp.float32)
        ).reshape(1)

    def windows_of(ep):
        ep = dequantize_on_device(ep)
        starts = jnp.arange(SLAB, dtype=jnp.int32) * CHUNK
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(ep, (s,), (WINDOW,))
        )(starts)

    bench("noop floor", jax.jit(lambda a: a[0:1].astype(jnp.float32)),
          episode)

    bench("dequant+windows", jax.jit(lambda e: s1(windows_of(e))), episode)

    def fwd(e):
        w = windows_of(e)
        w = jnp.pad(w, ((0, 0), (0, FFT - WINDOW)))
        return fft2_scrambled(w, jnp.zeros_like(w), FFT)

    bench("+ forward fft", jax.jit(lambda e: s1(fwd(e)[0])), episode)

    # query spectra must be ARGUMENTS — jit-closure constants get baked
    # into the uploaded HLO and the relay rejects the 536 MB body
    def minprod(e, tr, ti):
        Xr, Xi = fwd(e)
        return ifft_minor_product(
            Xr.reshape(SLAB, A, M), Xi.reshape(SLAB, A, M),
            tr.reshape(-1, A, M), ti.reshape(-1, A, M), M,
        )

    bench("+ minor-product",
          jax.jit(lambda e, tr, ti: s1(minprod(e, tr, ti)[0])),
          episode, t_r, t_i)

    def majinv(e, tr, ti):
        Vr, Vi = minprod(e, tr, ti)
        return fft_major(Vr, Vi, A, FFT, inverse=True, a_crop=a_crop)

    bench("+ major-inv (crop)",
          jax.jit(lambda e, tr, ti: s1(majinv(e, tr, ti)[0])),
          episode, t_r, t_i)

    def full(e, tr, ti):
        yr, yi = majinv(e, tr, ti)
        P = yr.shape[0]
        yr = yr.reshape(P, crop)
        yi = yi.reshape(P, crop)
        Q2 = 2 * t_r.shape[0]
        vq = jnp.broadcast_to(
            (WINDOW - mvec + 1).astype(jnp.int32)[None, :], (SLAB, Q2)
        )
        pos, h, prom = pick_peaks_pallas_packed(
            yr, yi, jnp.tile(jnp.pad(inv_ac, (0, Q2 - Q)), SLAB),
            vq.reshape(-1), DIST, 2, BLOCK,
        )
        return s1(h)

    bench("+ packed peaks (full slab)", jax.jit(full), episode, t_r, t_i)


if __name__ == "__main__":
    main()
