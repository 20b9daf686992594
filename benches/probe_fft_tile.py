"""Probe 7: VPU FFT pass cost vs column-tile width (real TPU).

The major pass reads [1, A, tile] blocks of an [A, M]-contiguous plane —
strided runs of tile·4 bytes. Wider tiles lengthen the contiguous HBM
runs at the price of bigger VMEM temporaries; this probe times each pass
at tile ∈ {256, 512, 1024} to find the knee (one process: the relay's
remote compile is minutes per shape).

Run: python benches/probe_fft_tile.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 22
P = 32


def bench(name, fn, *args, reps=3):
    try:
        out = float(np.asarray(fn(*args))[0])  # warmup + compile
    except Exception as e:
        print(f"[probe] {name:52s} FAILED: {type(e).__name__}: {e}"[:200],
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args))[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe] {name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from audio_matcher_tpu.ops.pallas_fft import (
        fft_major,
        fft_minor,
        ifft_minor_product,
        split_factors,
    )

    A, M = split_factors(N)
    rng = np.random.default_rng(0)
    xr = jax.device_put(
        rng.standard_normal((P, A, M)).astype(np.float32)
    )
    xi = jax.device_put(
        rng.standard_normal((P, A, M)).astype(np.float32)
    )
    jax.block_until_ready((xr, xi))
    print(f"[probe] uploads done P={P} A={A} M={M}", flush=True)

    def s1(parts):
        return sum(
            jnp.sum(p.reshape(p.shape[0], -1)[..., ::1009]) for p in parts
        ).reshape(1)

    bench("noop floor", jax.jit(lambda a: a[0:1, 0, 0]), xr)

    for tile in (256, 512, 1024):
        bench(
            f"major fwd  tile={tile}",
            jax.jit(lambda a, b, t=tile: s1(fft_major(a, b, A, N, tile=t))),
            xr, xi,
        )
    bench(
        "major inv  tile=best? 512 (crop 65%)",
        jax.jit(
            lambda a, b: s1(
                fft_major(
                    a, b, A, N, inverse=True,
                    a_crop=(A * 2 // 3 + 15) // 16 * 16, tile=512,
                )
            )
        ),
        xr, xi,
    )
    bench(
        "minor fwd  tile=256",
        jax.jit(lambda a, b: s1(fft_minor(a, b, M, tile=256))),
        xr, xi,
    )
    # the fused product pass at the scan's own shape: B windows × Qh pairs
    B, Qh = 8, 4  # B·Qh = P rows out
    tr = jax.device_put(
        rng.standard_normal((Qh, A, M)).astype(np.float32)
    )
    ti = jax.device_put(
        rng.standard_normal((Qh, A, M)).astype(np.float32)
    )
    jax.block_until_ready((tr, ti))
    for tile in (256, 512):
        bench(
            f"minor-product inv B={B} Qh={Qh} tile={tile}",
            jax.jit(
                lambda a, b, c, d, t=tile: s1(
                    ifft_minor_product(a[:B], b[:B], c, d, M, tile=t)
                )
            ),
            xr, xi, tr, ti,
        )


if __name__ == "__main__":
    main()
