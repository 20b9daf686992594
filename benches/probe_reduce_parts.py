"""Probe 14: packed peak-reduce kernel cost decomposition (real TPU).

Variants of the per-plane reduce body (io / +minmax / +peakdetect /
full) at the Q=32 slab shape, block=512. Run with python -u, no pipes.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 128  # plane rows (256 logical)
V = 2752512  # production crop at block=512
BLOCK = 512


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from audio_matcher_tpu.ops.pallas_kernels import GROUP

    rng = np.random.default_rng(0)
    yr = jax.device_put(
        (rng.standard_normal((ROWS, V)) * 0.05).astype(np.float32)
    )
    yi = jax.device_put(
        (rng.standard_normal((ROWS, V)) * 0.05).astype(np.float32)
    )
    jax.block_until_ready((yr, yi))
    nb = V // BLOCK
    print(f"[probe] uploads done rows={ROWS} V={V} nb={nb}", flush=True)

    def s1(parts):
        return sum(jnp.sum(p[:1].astype(jnp.float32)) for p in parts
                   ).reshape(1)

    bench("noop floor", jax.jit(lambda a: a[0:1, 0].astype(jnp.float32)), yr)

    def make(mode):
        def kern(yr_ref, yi_ref, o1, o2, o3, o4, *, block):
            j = pl.program_id(1)
            width = GROUP * block
            base = j * width
            prows = yr_ref.shape[0]
            outs = []
            for ref in (yr_ref, yi_ref):
                x = ref[:, :]
                if mode == "io":
                    x3 = x.reshape(prows, GROUP, block)
                    outs.append((x3[:, :, 0], x3[:, :, 1].astype(jnp.int32),
                                 x3[:, :, 2], x3[:, :, 3]))
                    continue
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (prows, width), 1
                ) + base
                colvalid = cols < (V - 7)
                x_min = jnp.where(colvalid, x, float("inf"))
                x_max = jnp.where(colvalid, x, float("-inf"))
                if mode == "minmax":
                    x3n = x_min.reshape(prows, GROUP, block)
                    x3x = x_max.reshape(prows, GROUP, block)
                    outs.append((
                        jnp.max(x3x, -1),
                        jnp.argmax(x3x, -1).astype(jnp.int32),
                        jnp.min(x3n, -1), jnp.max(x3x, -1),
                    ))
                    continue
                left = pltpu.roll(x_max, 1, 1)
                right = pltpu.roll(x_max, width - 1, 1)
                interior = (cols >= 1) & (cols <= V - 9)
                interior &= (cols >= base + 1) & (cols <= base + width - 2)
                is_peak = (x > left) & (x > right) & interior & colvalid
                heights = jnp.where(is_peak, x, float("-inf"))
                h3 = heights.reshape(prows, GROUP, block)
                bv = jnp.max(h3, -1)
                r = jnp.argmax(h3, -1).astype(jnp.int32)
                tb = base + jax.lax.broadcasted_iota(
                    jnp.int32, (prows, GROUP), 1
                ) * block
                outs.append((
                    bv, tb + r,
                    jnp.min(x_min.reshape(prows, GROUP, block), -1),
                    jnp.max(x_max.reshape(prows, GROUP, block), -1),
                ))
            for ref, e, o in zip(
                (o1, o2, o3, o4), outs[0], outs[1]
            ):
                ref[:, :] = jnp.stack([e, o], axis=1).reshape(
                    2 * prows, GROUP
                )

        nb_pad = -(-nb // GROUP) * GROUP
        grid = (ROWS // 8, nb_pad // GROUP)
        lspec = pl.BlockSpec(
            (16, GROUP), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )
        pspec = pl.BlockSpec(
            (8, GROUP * BLOCK), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = [
            jax.ShapeDtypeStruct((2 * ROWS, nb_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * ROWS, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((2 * ROWS, nb_pad), jnp.float32),
            jax.ShapeDtypeStruct((2 * ROWS, nb_pad), jnp.float32),
        ]
        f = pl.pallas_call(
            partial(kern, block=BLOCK),
            grid=grid,
            in_specs=[pspec, pspec],
            out_specs=[lspec] * 4,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
        return jax.jit(lambda a, b: s1(f(a, b)))

    for mode in ("io", "minmax", "full"):
        bench(f"reduce {mode}", make(mode), yr, yi)


if __name__ == "__main__":
    main()
