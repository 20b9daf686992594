"""Probe 10: DIF stages per scratch round-trip (STAGE_GROUP) sweep.

Float-identical regrouping; larger groups cut VMEM write-backs but grow
live temporaries. Run with python -u, no pipes (real TPU).
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

    # call the un-jitted bodies (__wrapped__): the inner jit caches are
    # keyed on static args only and would ignore the STAGE_GROUP change
    for g in (2, 3, 4, 6):
        pf.STAGE_GROUP = g
        bench(
            f"minor fwd  group={g}",
            jax.jit(lambda a, b: s1(
                pf.fft_minor.__wrapped__(a, b, M, tile=256)
            )),
            xr, xi,
        )
    for g in (2, 3, 4):
        pf.STAGE_GROUP = g
        bench(
            f"major inv  group={g} (crop 65%)",
            jax.jit(lambda a, b: s1(
                pf.fft_major.__wrapped__(
                    a, b, A, N, inverse=True,
                    a_crop=(A * 2 // 3 + 15) // 16 * 16, tile=512,
                )
            )),
            xr, xi,
        )
    pf.STAGE_GROUP = 2

    # peaks decomposition at the Q=32 slab shape: the packed reduce
    # kernel alone, then the full picker, at block 256 vs 512
    from audio_matcher_tpu.ops.pallas_kernels import (
        local_max_block_reduce_packed,
    )
    from audio_matcher_tpu.ops.peaks import pick_peaks_pallas_packed

    rows = 128
    V = 2818048  # crop width at bench shapes (multiple of 256·128)
    yr = jax.device_put(
        (rng.standard_normal((rows, V)) * 0.05).astype(np.float32)
    )
    yi = jax.device_put(
        (rng.standard_normal((rows, V)) * 0.05).astype(np.float32)
    )
    scale = jnp.ones((2 * rows,), jnp.float32)
    valid = jnp.full((2 * rows,), V - 7, jnp.int32)
    jax.block_until_ready((yr, yi))
    print("[probe] peaks planes uploaded", flush=True)

    for blk in (256, 512):
        bench(
            f"packed reduce only block={blk}",
            jax.jit(lambda a, b, _k=blk: s1(
                local_max_block_reduce_packed(
                    a, b, scale, valid, block=_k
                )[:1]
            )),
            yr, yi,
        )
    for blk in (256,):
        bench(
            f"packed full picker block={blk}",
            # sum over ALL outputs so nothing (e.g. prominence) is DCE'd
            jax.jit(lambda a, b, _k=blk: s1(tuple(
                o.astype(jnp.float32) for o in pick_peaks_pallas_packed(
                    a, b, scale, valid, 480 * 44100, 2, _k
                )
            ))),
            yr, yi,
        )


if __name__ == "__main__":
    main()
