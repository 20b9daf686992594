"""Probe 3: MXU matmul-FFT correlation vs XLA FFT at bench slab shapes."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
CHUNK = 60 * SR
Q = 8
MS = [int((10.0 + 0.5 * q) * SR) for q in range(Q)]
M_MAX, M_MIN = max(MS), min(MS)
OVERLAP = M_MAX + 2
WINDOW = CHUNK + OVERLAP
FFT = 1 << (WINDOW + M_MAX - 1).bit_length()
VALID = WINDOW - M_MIN + 1
SLAB = 8
DIST = 480 * SR
N_PEAKS = 2
BLOCK = 2048


def bench(name, fn, *args, reps=3):
    out = float(np.asarray(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args))[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe] {name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from audio_matcher_tpu.ops.mxu_fft import (
        corr_slab_mxu,
        scrambled_spectra_parts,
    )
    from audio_matcher_tpu.ops.peaks import pick_peaks_core

    print(f"[probe] fft={FFT} valid={VALID} slab={SLAB} Q={Q}", flush=True)
    rng = np.random.default_rng(0)
    windows = jax.device_put(
        rng.standard_normal((SLAB, WINDOW)).astype(np.float32)
    )
    snips = jax.device_put(
        rng.standard_normal((Q, M_MAX)).astype(np.float32)
    )
    m = jax.device_put(np.asarray(MS, np.int32))
    jax.block_until_ready((windows, snips, m))
    Sr, Si = jax.jit(
        lambda s: scrambled_spectra_parts(s, FFT)
    )(snips)
    sf = jax.jit(lambda s: jnp.fft.rfft(s, n=FFT))(snips)
    jax.block_until_ready((Sr, Si, sf))
    print("[probe] spectra ready", flush=True)

    bench("noop floor", jax.jit(lambda w: w[0:1, 0]), windows)

    def s1(c):
        return jnp.sum(c[..., ::1009].astype(jnp.float32)).reshape(1)

    # XLA correlation only
    def xla_corr(w, sfq):
        x = jnp.fft.rfft(w, n=FFT)
        spec = x[:, None, :] * jnp.conj(sfq)[None, :, :]
        return s1(jnp.fft.irfft(spec, n=FFT)[..., :VALID])

    bench("corr XLA fft [8x8]", jax.jit(xla_corr), windows, sf)

    # MXU correlation only (HIGHEST precision)
    def mxu_corr(w, sr_, si_):
        return s1(corr_slab_mxu(w, sr_, si_, VALID))

    bench("corr MXU fft [8x8] HIGHEST", jax.jit(mxu_corr),
          windows, Sr, Si)

    from jax.lax import Precision

    def mxu_corr_def(w, sr_, si_):
        return s1(
            corr_slab_mxu(w, sr_, si_, VALID, precision=Precision.DEFAULT)
        )

    bench("corr MXU fft [8x8] DEFAULT", jax.jit(mxu_corr_def),
          windows, Sr, Si)

    # XLA packed: query-pair spectra -> half the inverse FFTs
    from audio_matcher_tpu.ops.correlate import (
        corr_slab_xla_packed,
        packed_query_spectra,
    )

    T = jax.jit(
        lambda s: packed_query_spectra(s, FFT)
    )(snips)
    jax.block_until_ready(T)

    def xp_corr(w, t):
        return s1(corr_slab_xla_packed(w, t, VALID)[:, :Q])

    bench("corr XLA-PACKED [8x8]", jax.jit(xp_corr), windows, T)

    # full body: MXU corr + peak pick (jnp and pallas pickers)
    from audio_matcher_tpu.ops.peaks import (
        peaks_crop_width,
        pick_peaks_pallas,
    )

    def mxu_body(w, sr_, si_, mq, pallas=False):
        crop = peaks_crop_width(VALID, BLOCK, "pallas" if pallas else "jnp")
        c = corr_slab_mxu(w, sr_, si_, crop)
        vq = jnp.maximum(
            jnp.full((SLAB, Q), WINDOW, jnp.int32) - mq[None, :] + 1, 0
        )
        from audio_matcher_tpu.ops.peaks import pick_peaks_dispatch

        out = pick_peaks_dispatch(
            c, vq, DIST, N_PEAKS, BLOCK, "pallas" if pallas else "jnp"
        )
        return jnp.sum(
            sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
        ).reshape(1)

    def xp_body(w, t, mq, pallas=True):
        crop = peaks_crop_width(VALID, BLOCK, "pallas" if pallas else "jnp")
        c = corr_slab_xla_packed(w, t, crop)[:, :Q]
        vq = jnp.maximum(
            jnp.full((SLAB, Q), WINDOW, jnp.int32) - mq[None, :] + 1, 0
        )
        from audio_matcher_tpu.ops.peaks import pick_peaks_dispatch

        out = pick_peaks_dispatch(
            c, vq, DIST, N_PEAKS, BLOCK, "pallas" if pallas else "jnp"
        )
        return jnp.sum(
            sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
        ).reshape(1)

    bench("full slab XLA-PACKED + PALLAS peaks",
          jax.jit(lambda w, t, mq: xp_body(w, t, mq, True)), windows, T, m)
    bench("full slab XLA-PACKED + jnp peaks",
          jax.jit(lambda w, t, mq: xp_body(w, t, mq, False)), windows, T, m)
    bench("full slab MXU corr + PALLAS peaks",
          jax.jit(lambda w, a, b, mq: mxu_body(w, a, b, mq, pallas=True)),
          windows, Sr, Si, m)

    # pallas peaks alone at slab volume
    CROP = peaks_crop_width(VALID, BLOCK, "pallas")
    corr_big = jax.device_put(
        rng.standard_normal((Q * SLAB, CROP)).astype(np.float32)
    )
    vl = jax.device_put(np.full(Q * SLAB, VALID, np.int32))
    jax.block_until_ready((corr_big, vl))

    def pk_pallas(c, v):
        out = pick_peaks_pallas(c, v, DIST, N_PEAKS, BLOCK)
        return jnp.sum(
            sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
        ).reshape(1)

    bench("pick_peaks_pallas [64, V]", jax.jit(pk_pallas), corr_big, vl)

    # numerical cross-check at slab scale
    got = jax.jit(
        lambda w, a, b: corr_slab_mxu(w, a, b, VALID)[:, :, ::65537]
    )(windows, Sr, Si)
    want = jax.jit(
        lambda w, sfq: (
            jnp.fft.irfft(
                jnp.fft.rfft(w, n=FFT)[:, None, :] * jnp.conj(sfq)[None],
                n=FFT,
            )[..., :VALID]
        )[:, :, ::65537]
    )(windows, sf)
    g, wv = np.asarray(got), np.asarray(want)
    scale = np.max(np.abs(wv))
    print(f"[probe] mxu-vs-xla max rel err {np.max(np.abs(g - wv)) / scale:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
