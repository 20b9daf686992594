"""Probe 13: MXU DFT-W group width sweep for the FFT passes (real TPU).

Run with python -u, no pipes.
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
        out = float(np.asarray(fn(*args))[0])
    except Exception as e:
        print(f"[probe] {name:44s} FAILED: {type(e).__name__}: {e}"[:180],
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args))[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe] {name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import audio_matcher_tpu.ops.pallas_fft as pf

    A, M = pf.split_factors(N)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((P, A, M)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((P, A, M)).astype(np.float32))
    jax.block_until_ready((xr, xi))
    print(f"[probe] uploads done P={P}", flush=True)

    def s1(parts):
        return sum(
            jnp.sum(p.reshape(p.shape[0], -1)[..., ::1009]) for p in parts
        ).reshape(1)

    bench("noop floor", jax.jit(lambda a: a[0:1, 0, 0]), xr)

    # un-jitted bodies: the inner jit caches ignore the DFT_MXU_W change
    for w in (128, 256, 512, 0):
        pf.DFT_MXU_W = w
        bench(
            f"major inv  W={w} (crop 65%)",
            jax.jit(lambda a, b: s1(
                pf.fft_major.__wrapped__(
                    a, b, A, N, inverse=True,
                    a_crop=(A * 2 // 3 + 15) // 16 * 16, tile=512,
                )
            )),
            xr, xi,
        )
    for w in (128, 256):
        pf.DFT_MXU_W = w
        bench(
            f"minor fwd  W={w}",
            jax.jit(lambda a, b: s1(
                pf.fft_minor.__wrapped__(a, b, M, tile=256)
            )),
            xr, xi,
        )
    pf.DFT_MXU_W = 128

    # numerics: W=256 against numpy at full scale
    pf.DFT_MXU_W = 256
    x = rng.standard_normal(1 << 16).astype(np.float32)
    # fresh shapes → the inner jits compile at the current DFT_MXU_W
    yr, yi = pf.fft2_scrambled(
        jax.device_put(x)[None],
        jnp.zeros((1, 1 << 16), jnp.float32), 1 << 16,
    )
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    A2, M2 = pf.split_factors(1 << 16)
    sa, sm = pf._brev_host(A2), pf._brev_host(M2)
    want = np.fft.fft(x)[(sa[:, None] + A2 * sm[None, :]).reshape(-1)]
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    print(f"[probe] W=256 vs numpy max rel err {err:.2e}", flush=True)
    pf.DFT_MXU_W = 128


if __name__ == "__main__":
    main()
