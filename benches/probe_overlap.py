"""Probe 5: can staging overlap with compute on the axon relay?

PERF.md r1 claims the host->device path collapses once the execution
stream starts, making stage-then-scan the right architecture. VERDICT r1
asks for double-buffered streaming instead. This measures the actual
upload throughput (a) before any execution, (b) concurrently with a
running program, (c) after executions, to settle it with data.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = 160


def upload(tag, arr):
    import jax

    t0 = time.perf_counter()
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    print(
        f"[probe] upload {tag:28s} {dt * 1e3:8.1f} ms "
        f"({arr.nbytes / dt / 1e6:.0f} MB/s)",
        flush=True,
    )
    return d, dt


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    bufs = [
        (rng.standard_normal(MB * 1024 * 1024 // 2) * 1000).astype(np.int16)
        for _ in range(4)
    ]

    a, _ = upload("A (pre-exec)", bufs[0])
    b, _ = upload("B (pre-exec)", bufs[1])

    # a deliberately long program (~1-2 s of FFT work)
    @jax.jit
    def crunch(x):
        y = x.astype(jnp.float32).reshape(40, -1)
        for _ in range(24):
            y = jnp.fft.irfft(jnp.fft.rfft(y), y.shape[-1])
        return y[:, ::65537]

    out = crunch(a)  # compile + run once
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = crunch(a)
    jax.block_until_ready(out)
    t_crunch = time.perf_counter() - t0
    print(f"[probe] crunch alone: {t_crunch * 1e3:.1f} ms", flush=True)

    # upload DURING execution
    out = crunch(a)  # async dispatch
    c, dt_during = upload("C (during exec)", bufs[2])
    t0 = time.perf_counter()
    jax.block_until_ready(out)
    print(
        f"[probe] remaining crunch wait after overlap: "
        f"{(time.perf_counter() - t0) * 1e3:.1f} ms",
        flush=True,
    )

    d, _ = upload("D (post-exec, idle)", bufs[3])

    # steady-state pipeline: N rounds of (dispatch crunch, upload next)
    t0 = time.perf_counter()
    pend = crunch(a)
    for nxt in (b, c, d):
        staged = jax.device_put(np.asarray(bufs[0]))  # fresh host buffer
        jax.block_until_ready(staged)
        jax.block_until_ready(pend)
        pend = crunch(nxt)
    jax.block_until_ready(pend)
    dt_pipe = time.perf_counter() - t0
    print(f"[probe] 4-round overlap pipeline: {dt_pipe * 1e3:.1f} ms "
          f"(serial estimate {4 * t_crunch * 1e3:.0f} ms crunch + uploads)",
          flush=True)


if __name__ == "__main__":
    main()
