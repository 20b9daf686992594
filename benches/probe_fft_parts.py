"""Probe 8: decompose VPU-FFT pass cost into IO / transpose / butterflies.

Times stripped-down variants of the minor and major kernels (same block
specs, stages elided or transposes elided) so the next optimization
targets whichever component actually dominates. One process; output
unbuffered (run with python -u, no pipes).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 22
P = 32


def bench(name, fn, *args, reps=3):
    try:
        out = float(np.asarray(fn(*args))[0])
    except Exception as e:
        print(f"[probe] {name:48s} FAILED: {type(e).__name__}: {e}"[:180],
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(np.asarray(fn(*args))[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe] {name:48s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from audio_matcher_tpu.ops.pallas_fft import (
        _PARAMS,
        _dif_stages_ref,
        split_factors,
    )

    A, M = split_factors(N)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((P, A, M)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((P, A, M)).astype(np.float32))
    jax.block_until_ready((xr, xi))
    print(f"[probe] uploads done P={P} A={A} M={M}", flush=True)

    def s1(parts):
        return sum(
            jnp.sum(p.reshape(p.shape[0], -1)[..., ::1009]) for p in parts
        ).reshape(1)

    bench("noop floor", jax.jit(lambda a: a[0:1, 0, 0]), xr)

    def variant_kernel(xr_ref, xi_ref, or_ref, oi_ref, sr_ref, si_ref, *,
                       R, transpose, stages):
        a = xr_ref[0]
        b = xi_ref[0]
        if transpose:
            a = jnp.swapaxes(a, 0, 1)
            b = jnp.swapaxes(b, 0, 1)
        sr_ref[...] = a
        si_ref[...] = b
        if stages:
            _dif_stages_ref(sr_ref, si_ref, R, sr_ref.shape[1], False)
        a = sr_ref[...]
        b = si_ref[...]
        if transpose:
            a = jnp.swapaxes(a, 0, 1)
            b = jnp.swapaxes(b, 0, 1)
        or_ref[0] = a
        oi_ref[0] = b

    def run_variant(name, block_rows, block_cols, sublane_first,
                    transpose, stages):
        # minor-style: block [1, tile, M], scratch [M, tile] (transpose)
        # major-style: block [1, A, tile], scratch [A, tile] (no transpose)
        spec = pl.BlockSpec(
            (1, block_rows, block_cols),
            lambda i, j: (i, j, 0) if sublane_first else (i, 0, j),
            memory_space=pltpu.VMEM,
        )
        if transpose:
            scratch = (block_cols, block_rows)
            R = block_cols
        else:
            scratch = (block_rows, block_cols)
            R = block_rows
        grid = (P, (A if sublane_first else M) // (
            block_rows if sublane_first else block_cols))

        f = pl.pallas_call(
            partial(variant_kernel, R=R, transpose=transpose, stages=stages),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((P, A, M), jnp.float32),
                jax.ShapeDtypeStruct((P, A, M), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM(scratch, jnp.float32),
                pltpu.VMEM(scratch, jnp.float32),
            ],
            compiler_params=_PARAMS,
        )
        bench(name, jax.jit(lambda a, b: s1(f(a, b))), xr, xi)

    # minor-style decomposition (blocks [1, 256, M])
    run_variant("minor io only (copy through VMEM)", 256, M, True,
                transpose=False, stages=False)
    run_variant("minor io + transposes", 256, M, True,
                transpose=True, stages=False)
    run_variant("minor full (io+tr+stages)", 256, M, True,
                transpose=True, stages=True)
    # major-style decomposition (blocks [1, A, 512], strided reads)
    run_variant("major io only tile=512", A, 512, False,
                transpose=False, stages=False)
    run_variant("major io + stages tile=512", A, 512, False,
                transpose=False, stages=True)


if __name__ == "__main__":
    main()
