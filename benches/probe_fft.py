"""Probe 2: FFT implementation alternatives on the real TPU.

Questions:
  1. Is irfft priced like a full complex ifft? (If yes, packing two real
     outputs into one complex ifft halves the dominant scan cost.)
  2. What does the MXU deliver on this chip through the relay
     (f32/bf16 matmul, DEFAULT vs HIGHEST precision)?
  3. How do bigger FFTs price per sample?
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FFT = 1 << 22


def bench(name, fn, *args, reps=3, work=None):
    out = float(np.asarray(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args))[0])
    dt = (time.perf_counter() - t0) / reps
    extra = f"  ({work / dt / 1e12:.1f} TFLOP/s)" if work else ""
    print(f"[probe] {name:46s} {dt * 1e3:9.2f} ms{extra}", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.lax import Precision

    rng = np.random.default_rng(0)
    B = 8
    x = jax.device_put(rng.standard_normal((B, FFT)).astype(np.float32))
    jax.block_until_ready(x)
    print("[probe] uploads done", flush=True)

    def s1(y):
        return jnp.sum(jnp.abs(y[..., ::1009]).astype(jnp.float32)).reshape(1)

    bench("noop floor", jax.jit(lambda a: a[0:1, 0]), x)

    # 1a. real irfft path at the bench shape: [8, F] -> [8, FFT]
    def via_irfft(a):
        X = jnp.fft.rfft(a, n=FFT)
        return s1(jnp.fft.irfft(X, n=FFT))

    bench("rfft+irfft real [8, 2^22]", jax.jit(via_irfft), x)

    # 1b. complex fft/ifft of the same size
    def via_cfft(a):
        z = a + 1j * a[::-1]
        Z = jnp.fft.fft(z)
        return s1(jnp.fft.ifft(Z))

    bench("cfft+icfft complex [8, 2^22]", jax.jit(via_cfft), x)

    # 1c. irfft alone, batch 64 (the real per-slab volume)
    x64 = jax.device_put(
        rng.standard_normal((64, FFT // 8)).astype(np.float32)
    )
    jax.block_until_ready(x64)

    def irfft64(a):
        X = jnp.fft.rfft(a, n=FFT // 8)  # small fwd to make spectra
        Xb = jnp.tile(X, (1, 8))[:, : FFT // 2 + 1]
        return s1(jnp.fft.irfft(Xb, n=FFT))

    bench("irfft [64, 2^22] (fwd small)", jax.jit(irfft64), x64)

    def icfft32(a):
        X = jnp.fft.rfft(a, n=FFT // 8)
        Xb = jnp.tile(X, (1, 8))[:, : FFT // 2]
        Z = jnp.concatenate([Xb, Xb[:, ::-1]], axis=1)  # [64, FFT]
        z = Z[0::2] + 1j * Z[1::2]  # pack pairs -> [32, FFT]
        return s1(jnp.fft.ifft(z))

    bench("icfft [32, 2^22] (2-real pack)", jax.jit(icfft32), x64)

    # 2. MXU: complex-equivalent matmul stages (4 real mm of [2048]^3) x B
    a_h = rng.standard_normal((2048, 2048)).astype(np.float32)
    b_h = rng.standard_normal((B, 2048, 2048)).astype(np.float32)
    A = jax.device_put(a_h)
    Bm = jax.device_put(b_h)
    jax.block_until_ready((A, Bm))
    flops = 2 * 2048**3 * B

    for prec, label in [
        (Precision.DEFAULT, "DEFAULT"),
        (Precision.HIGHEST, "HIGHEST"),
    ]:
        f = jax.jit(
            lambda Aa, Bb, p=prec: jnp.einsum(
                "ij,bjk->bik", Aa, Bb, precision=p
            )[0:1, 0, 0]
        )
        bench(f"matmul f32 [2048^3]x{B} {label}", f, A, Bm,
              work=flops)

    fb16 = jax.jit(
        lambda Aa, Bb: jnp.einsum(
            "ij,bjk->bik",
            Aa.astype(jnp.bfloat16), Bb.astype(jnp.bfloat16),
        ).astype(jnp.float32)[0:1, 0, 0]
    )
    bench(f"matmul bf16 [2048^3]x{B}", fb16, A, Bm, work=flops)

    # 3. fft size scaling per sample
    for logn in (22, 23, 24):
        n = 1 << logn
        xb = jax.device_put(
            rng.standard_normal((2, n)).astype(np.float32)
        )
        jax.block_until_ready(xb)

        def rt(a, n=n):
            return s1(jnp.fft.irfft(jnp.fft.rfft(a, n=n), n=n))

        dt = bench(f"rfft+irfft [2, 2^{logn}]", jax.jit(rt), xb)
        print(f"[probe]   per-sample {dt / (2 * n):.3e}", flush=True)


if __name__ == "__main__":
    main()
