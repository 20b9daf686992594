"""Probe 6: Pallas VPU FFT vs XLA's native FFT at the scan's shapes."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 22


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

    from audio_matcher_tpu.ops.pallas_fft import fft2_scrambled

    rng = np.random.default_rng(0)

    def s1(parts):
        return sum(
            jnp.sum(p[..., ::1009].astype(jnp.float32)) for p in parts
        ).reshape(1)

    from audio_matcher_tpu.ops.pallas_fft import fft_major, fft_minor

    for P in (8, 16, 32, 64):
        xr = jax.device_put(rng.standard_normal((P, N)).astype(np.float32))
        xi = jax.device_put(rng.standard_normal((P, N)).astype(np.float32))
        jax.block_until_ready((xr, xi))
        print(f"[probe] uploads done P={P}", flush=True)

        bench(f"noop floor P={P}", jax.jit(lambda a: a[0:1, 0]), xr)

        def pfwd(a, b):
            yr, yi = fft2_scrambled(a, b, N)
            return s1((yr, yi))

        bench(f"pallas fwd cfft [{P}, 2^22]", jax.jit(pfwd), xr, xi)

        def pinv(a, b):
            yr, yi = fft2_scrambled(a, b, N, inverse=True)
            return s1((yr, yi))

        bench(f"pallas inv cfft [{P}, 2^22]", jax.jit(pinv), xr, xi)

        def xfft(a, b):
            z = jnp.fft.fft(a + 1j * b)
            return s1((jnp.real(z), jnp.imag(z)))

        bench(f"XLA cfft [{P}, 2^22]", jax.jit(xfft), xr, xi)

        A = 2048

        def pmaj(a, b):
            yr, yi = fft_major(
                a.reshape(P, A, N // A), b.reshape(P, A, N // A), A, N
            )
            return s1((yr.reshape(P, N), yi.reshape(P, N)))

        bench(f"pallas major-only [{P}]", jax.jit(pmaj), xr, xi)

        def pmin(a, b):
            yr, yi = fft_minor(
                a.reshape(P, A, N // A), b.reshape(P, A, N // A), N // A
            )
            return s1((yr.reshape(P, N), yi.reshape(P, N)))

        bench(f"pallas minor-only [{P}]", jax.jit(pmin), xr, xi)

    # numerics on TPU (compiled kernels, not interpret)
    x = rng.standard_normal(N).astype(np.float32)
    yr, yi = jax.jit(
        lambda a: fft2_scrambled(a[None], jnp.zeros((1, N), jnp.float32), N)
    )(jax.device_put(x))
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    from audio_matcher_tpu.ops.pallas_fft import _brev_host, split_factors

    A, M = split_factors(N)
    sa, sm = _brev_host(A), _brev_host(M)
    want = np.fft.fft(x)[(sa[:, None] + A * sm[None, :]).reshape(-1)]
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    print(f"[probe] pallas-vs-numpy max rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
