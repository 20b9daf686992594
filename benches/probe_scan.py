"""Component timing probe for the batch-scan device program (real TPU).

Times the pieces of one resident-scan slab at the exact bench shapes
(BENCH config: chunk 60 s @ 44.1 kHz, 8 queries 10-13.5 s, fft 2^22) so
optimization targets the measured bottleneck, not a guess.

Each probe returns a scalar that is read back to the host per repetition —
through the axon relay, block_until_ready alone under-reports (dispatch is
pipelined); a 4-byte D2H readback is the only reliable fence.

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
    # readbacks must be >=1-d: the axon relay's D2H path rejects 0-d arrays
    out = float(np.asarray(fn(*args))[0])  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args))[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe] {name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def tsum(tree):
    import jax.numpy as jnp
    import jax

    leaves = jax.tree.leaves(tree)
    return sum(
        jnp.sum(x.astype(jnp.float32)) for x in leaves
    ).reshape(1)


def main():
    import jax
    import jax.numpy as jnp

    from audio_matcher_tpu.ops.peaks import pick_peaks_core

    print(
        f"[probe] shapes: window={WINDOW} fft={FFT} valid={VALID} "
        f"slab={SLAB} Q={Q} n_peaks={N_PEAKS}", flush=True,
    )
    rng = np.random.default_rng(0)
    windows_h = rng.standard_normal((SLAB, WINDOW)).astype(np.float32)
    # complex64 device_put is UNIMPLEMENTED through the axon relay:
    # compute the query spectra on device from f32 (as production does)
    snip_h = rng.standard_normal((Q, M_MAX)).astype(np.float32)
    inv_ac_h = np.ones(Q, np.float32)
    m_h = np.asarray(MS, np.int32)
    corr_h = rng.standard_normal((Q * SLAB, VALID)).astype(np.float32)
    vl_h = np.full((Q * SLAB,), VALID, np.int32)

    windows = jax.device_put(windows_h)
    sf = jax.jit(lambda z: jnp.fft.rfft(z, n=FFT))(jax.device_put(snip_h))
    inv_ac = jax.device_put(inv_ac_h)
    m = jax.device_put(m_h)
    corr = jax.device_put(corr_h)
    vl = jax.device_put(vl_h)
    jax.block_until_ready((windows, sf, inv_ac, m, corr, vl))
    print("[probe] uploads done", flush=True)

    # 0. dispatch+readback floor
    bench("noop (dispatch+readback floor)",
          jax.jit(lambda w: w[0:1, 0]), windows)

    # 1. forward rfft of a slab
    bench("rfft [8, W] (sum)",
          jax.jit(lambda w: tsum(jnp.abs(jnp.fft.rfft(w, n=FFT)[:, ::997]))),
          windows)

    # 2. conj-mult + irfft + crop (the per-query heavy op)
    def spec_irfft(w, sfq):
        x = jnp.fft.rfft(w, n=FFT)
        spec = x[:, None, :] * jnp.conj(sfq)[None, :, :]
        c = jnp.fft.irfft(spec, n=FFT)[..., :VALID]
        return tsum(c[..., ::997])

    bench("rfft+conj+irfft [8,Q] (sum)", jax.jit(spec_irfft), windows, sf)

    # 3. peak pick alone at the full per-slab volume
    def pick(c, v, block):
        return tsum(pick_peaks_core(c, v, DIST, N_PEAKS, block))

    bench("pick_peaks [64, V] block=2048",
          jax.jit(lambda c, v: pick(c, v, 2048)), corr, vl)
    bench("pick_peaks [64, V] block=32768",
          jax.jit(lambda c, v: pick(c, v, 32768)), corr, vl)

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
        out = jax.vmap(
            lambda cc, vv: pick_peaks_core(cc, vv, DIST, N_PEAKS, BLOCK)
        )(c.reshape(Q * SLAB, VALID)[None].reshape(Q, SLAB, VALID),
          vq)
        return tsum(out)

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
        return tsum(out)

    bench("full slab body (no big transpose)",
          jax.jit(body_noswap), windows, sf, inv_ac, m)

    # 6. bigger overlap-save tile: fft 2^23, window = fft - m_max + 1
    FFT2 = FFT * 2
    W2 = FFT2 - M_MAX + 1
    V2 = W2 - M_MIN + 1
    w2 = jax.device_put(
        rng.standard_normal((SLAB // 2, W2)).astype(np.float32)
    )
    sf2 = jax.jit(lambda z: jnp.fft.rfft(z, n=FFT2))(jax.device_put(snip_h))
    jax.block_until_ready((w2, sf2))

    def body2(w, sfq, ia, mq):
        x = jnp.fft.rfft(w, n=FFT2)
        spec = x[:, None, :] * jnp.conj(sfq)[None, :, :]
        c = jnp.fft.irfft(spec, n=FFT2)[..., :V2]
        c = c * ia[None, :, None]
        vq = jnp.maximum(
            jnp.full((SLAB // 2, Q), W2, jnp.int32) - mq[None, :] + 1, 0
        )
        out = jax.vmap(
            lambda cc, vv: pick_peaks_core(cc, vv, DIST, N_PEAKS, BLOCK)
        )(c, vq)
        return tsum(out)

    dt2 = bench("2x tile: slab=4 windows of fft 2^23", jax.jit(body2),
                w2, sf2, inv_ac, m)
    print(
        f"[probe] 2x-tile covers {4 * (W2 - CHUNK)} extra overlap; "
        f"per-valid-sample {dt2 / (4 * V2):.3e} s", flush=True,
    )


if __name__ == "__main__":
    main()
