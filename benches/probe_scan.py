"""Component timing probe for the batch-scan device program (real TPU).

Times the pieces of one resident-scan slab at the exact bench shapes
(BENCH config: chunk 60 s @ 44.1 kHz, 8 queries 10-13.5 s, fft 2^22) so
optimization targets the measured bottleneck, not a guess.

Run: python benches/probe_scan.py   (real TPU; budget ~10-20 min compile)
"""

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
N_PEAKS = 2
BLOCK = 2048
DIST = 480 * SR


def bench(name, fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe] {name:42s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from audio_matcher_tpu.ops.peaks import pick_peaks_core

    print(
        f"[probe] shapes: window={WINDOW} fft={FFT} valid={VALID} "
        f"slab={SLAB} Q={Q} n_peaks={N_PEAKS}"
    )
    rng = np.random.default_rng(0)
    windows_h = rng.standard_normal((SLAB, WINDOW)).astype(np.float32)
    sf_h = (
        rng.standard_normal((Q, FFT // 2 + 1))
        + 1j * rng.standard_normal((Q, FFT // 2 + 1))
    ).astype(np.complex64)
    inv_ac_h = np.ones(Q, np.float32)
    m_h = np.asarray(MS, np.int32)
    corr_h = rng.standard_normal((Q * SLAB, VALID)).astype(np.float32)

    windows = jax.device_put(windows_h)
    sf = jax.device_put(sf_h)
    inv_ac = jax.device_put(inv_ac_h)
    m = jax.device_put(m_h)
    corr = jax.device_put(corr_h)
    jax.block_until_ready((windows, sf, inv_ac, m, corr))
    print("[probe] uploads done")

    # 1. forward rfft of a slab
    f_rfft = jax.jit(lambda w: jnp.fft.rfft(w, n=FFT))
    bench("rfft [8, W]->[8, F]", f_rfft, windows)

    # 2. conj-mult + irfft + crop (the per-query heavy op), summed readback
    def spec_irfft(x, sfq):
        spec = x[:, None, :] * jnp.conj(sfq)[None, :, :]
        c = jnp.fft.irfft(spec, n=FFT)[..., :VALID]
        return c.sum()

    bench("conj-mult+irfft [8,Q,F]->[8,Q,V] (sum)",
          jax.jit(spec_irfft), f_rfft(windows), sf)

    # 3. peak pick alone at the full per-slab volume
    vl = jnp.full((Q * SLAB,), VALID, jnp.int32)
    f_pick = jax.jit(
        lambda c: pick_peaks_core(c, vl, DIST, N_PEAKS, BLOCK)
    )
    bench("pick_peaks [64, V] block=2048", f_pick, corr)

    vl2 = jnp.full((Q * SLAB,), VALID, jnp.int32)
    f_pick2 = jax.jit(
        lambda c: pick_peaks_core(c, vl2, DIST, N_PEAKS, 32768)
    )
    bench("pick_peaks [64, V] block=32768", f_pick2, corr)

    # 4. full slab body as used by resident_match_step (with swapaxes)
    def body_swap(w, sfq, ia, mq):
        x = jnp.fft.rfft(w, n=FFT)
        spec = x[:, None, :] * jnp.conj(sfq)[None, :, :]
        c = jnp.fft.irfft(spec, n=FFT)[..., :VALID]
        c = c * ia[None, :, None]
        c = jnp.swapaxes(c, 0, 1)
        vq = jnp.maximum(
            jnp.full((Q, SLAB), WINDOW, jnp.int32) - mq[:, None] + 1, 0
        )
        return jax.vmap(
            lambda cc, vv: pick_peaks_core(cc, vv, DIST, N_PEAKS, BLOCK)
        )(c, vq)

    bench("full slab body (swapaxes, block=2048)",
          jax.jit(body_swap), windows, sf, inv_ac, m)

    # 5. same without the [B,Q]->[Q,B] transpose (pick in [B,Q] order)
    def body_noswap(w, sfq, ia, mq):
        x = jnp.fft.rfft(w, n=FFT)
        spec = x[:, None, :] * jnp.conj(sfq)[None, :, :]
        c = jnp.fft.irfft(spec, n=FFT)[..., :VALID]
        c = c * ia[None, :, None]
        vq = jnp.maximum(
            jnp.full((SLAB, Q), WINDOW, jnp.int32) - mq[None, :] + 1, 0
        )
        out = jax.vmap(
            lambda cc, vv: pick_peaks_core(cc, vv, DIST, N_PEAKS, BLOCK)
        )(c, vq)
        return jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), out)

    bench("full slab body (no big transpose)",
          jax.jit(body_noswap), windows, sf, inv_ac, m)

    # 6. bigger overlap-save tile: fft 2^23, window = fft - m_max + 1
    FFT2 = FFT * 2
    W2 = FFT2 - M_MAX + 1
    V2 = W2 - M_MIN + 1
    w2 = jax.device_put(
        rng.standard_normal((SLAB // 2, W2)).astype(np.float32)
    )
    sf2 = jax.device_put(
        (rng.standard_normal((Q, FFT2 // 2 + 1))
         + 1j * rng.standard_normal((Q, FFT2 // 2 + 1))).astype(np.complex64)
    )

    def body2(w, sfq, ia, mq):
        x = jnp.fft.rfft(w, n=FFT2)
        spec = x[:, None, :] * jnp.conj(sfq)[None, :, :]
        c = jnp.fft.irfft(spec, n=FFT2)[..., :V2]
        c = c * ia[None, :, None]
        vq = jnp.maximum(
            jnp.full((SLAB // 2, Q), W2, jnp.int32) - mq[None, :] + 1, 0
        )
        return jax.vmap(
            lambda cc, vv: pick_peaks_core(cc, vv, DIST, N_PEAKS, BLOCK)
        )(c, vq)

    dt2 = bench("2x tile: slab=4 windows of fft 2^23", jax.jit(body2),
                w2, sf2, inv_ac, m)
    print(f"[probe] 2x-tile cost per valid sample ratio basis: "
          f"V2*4={4 * V2} vs V*8={8 * VALID} "
          f"(per-sample {dt2 / (4 * V2):.3e})")


if __name__ == "__main__":
    main()
