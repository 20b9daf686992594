"""Probe 4: practical HBM bandwidth + where the MXU-FFT time actually goes."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 22


def bench(name, fn, *args, reps=3, gb=None):
    out = float(np.asarray(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args))[0])
    dt = (time.perf_counter() - t0) / reps
    extra = ""
    if gb:
        extra = f"  ({gb / max(dt - 0.0311, 1e-9):.0f} GB/s net-of-floor)"
    print(f"[probe] {name:52s} {dt * 1e3:9.2f} ms{extra}", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.standard_normal((32, N)).astype(np.float32))
    y32 = jax.device_put(rng.standard_normal((32, N)).astype(np.float32))
    jax.block_until_ready((x32, y32))
    print("[probe] uploads done", flush=True)
    GB = 32 * N * 4 / 1e9

    bench("noop floor", jax.jit(lambda a: a[0:1, 0]), x32)

    # pure read: sum-reduce 537MB
    bench("reduce-sum [32, 4M] (read 0.54GB)",
          jax.jit(lambda a: jnp.sum(a, dtype=jnp.float32).reshape(1)),
          x32, gb=GB)

    # read+write: elementwise
    bench("axpy [32, 4M] (r 1.07GB, w 0.54GB)",
          jax.jit(lambda a, b: (a * 1.5 + b)[0:1, 0]), x32, y32,
          gb=3 * GB)

    # transcendental: cos of the same volume
    bench("cos [32, 4M] (r+w 1.07GB + 134M cos)",
          jax.jit(lambda a: jnp.cos(a)[0:1, 0]), x32, gb=2 * GB)

    # the twiddle shape itself: cos+sin of [256, 16384] iota product
    def twiddle(_):
        c = jnp.arange(256, dtype=jnp.float32)[:, None]
        b = jnp.arange(N // 256, dtype=jnp.float32)[None, :]
        ph = (2.0 * np.pi / N) * (c * b)
        return (jnp.cos(ph) + jnp.sin(ph))[0:1, 0]

    bench("twiddle build [256, 16k] (4.2M cos+sin)",
          jax.jit(twiddle), x32)

    # one inverse-style matmul stage on [32, N]: reshape + einsum + twiddle
    from jax.lax import Precision

    def stage(ar, ai):
        a, m = 256, N // 256
        xr = ar.reshape(32, a, m)
        xi = ai.reshape(32, a, m)
        c = jnp.arange(a, dtype=jnp.int32)
        dk = (c[:, None] * c[None, :]) % a
        ph = (-2.0 * np.pi / a) * dk.astype(jnp.float32)
        tr, ti = jnp.cos(ph), jnp.sin(ph)
        rr = jnp.einsum("ca,bam->bcm", tr, xr, precision=Precision.HIGHEST)
        ii = jnp.einsum("ca,bam->bcm", ti, xi, precision=Precision.HIGHEST)
        ri = jnp.einsum("ca,bam->bcm", tr, xi, precision=Precision.HIGHEST)
        ir = jnp.einsum("ca,bam->bcm", ti, xr, precision=Precision.HIGHEST)
        return ((rr - ii) + (ri + ir))[0:1, 0, 0]

    bench("one DFT-256 stage [32, 4M] HIGHEST (4 einsums)",
          jax.jit(stage), x32, y32, gb=None)

    def stage_def(ar, ai):
        a, m = 256, N // 256
        xr = ar.reshape(32, a, m)
        xi = ai.reshape(32, a, m)
        c = jnp.arange(a, dtype=jnp.int32)
        dk = (c[:, None] * c[None, :]) % a
        ph = (-2.0 * np.pi / a) * dk.astype(jnp.float32)
        tr, ti = jnp.cos(ph), jnp.sin(ph)
        rr = jnp.einsum("ca,bam->bcm", tr, xr)
        ii = jnp.einsum("ca,bam->bcm", ti, xi)
        ri = jnp.einsum("ca,bam->bcm", tr, xi)
        ir = jnp.einsum("ca,bam->bcm", ti, xr)
        return ((rr - ii) + (ri + ir))[0:1, 0, 0]

    bench("one DFT-256 stage [32, 4M] DEFAULT (4 einsums)",
          jax.jit(stage_def), x32, y32, gb=None)

    # last-stage shape: DFT-64 on [32*65536, 64, 64]-ish volume
    def stage64(ar, ai):
        a = 64
        m = N // a
        xr = ar.reshape(32, a, m)
        xi = ai.reshape(32, a, m)
        c = jnp.arange(a, dtype=jnp.int32)
        dk = (c[:, None] * c[None, :]) % a
        ph = (-2.0 * np.pi / a) * dk.astype(jnp.float32)
        tr, ti = jnp.cos(ph), jnp.sin(ph)
        rr = jnp.einsum("ca,bam->bcm", tr, xr, precision=Precision.HIGHEST)
        ii = jnp.einsum("ca,bam->bcm", ti, xi, precision=Precision.HIGHEST)
        ri = jnp.einsum("ca,bam->bcm", tr, xi, precision=Precision.HIGHEST)
        ir = jnp.einsum("ca,bam->bcm", ti, xr, precision=Precision.HIGHEST)
        return ((rr - ii) + (ri + ir))[0:1, 0, 0]

    bench("one DFT-64 stage [32, 4M] HIGHEST",
          jax.jit(stage64), x32, y32)


if __name__ == "__main__":
    main()
