"""Probe 15: relay upload throughput vs transfer size/granularity.

The 64x10-min config #3 bench staged its 5.5 GB wire buffer at ~29 MB/s
while the 682 MB default-config buffer rides at ~0.7 GB/s — this probe
maps device_put throughput against array size and tests whether slicing
the same bytes into row-chunk device_puts avoids the large-transfer
collapse. Readback of a tiny row fences each upload (block_until_ready
lies through the relay). Run with python -u, no pipes.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    # >=1-d readback is the only trustworthy fence through the relay
    np.asarray(x[:1, :8])


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[probe] device: {dev}", flush=True)
    rows = int(os.environ.get("PROBE_ROWS", "64"))
    width = int(os.environ.get("PROBE_WIDTH", str(42_336_000)))  # 16 win
    buf = np.zeros((rows, width), np.int16)
    total_mb = buf.nbytes / 2**20
    print(f"[probe] buffer {rows}x{width} int16 = {total_mb:.0f} MB", flush=True)

    # one monolithic device_put (the bench's current staging shape)
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    fence(d)
    t1 = time.perf_counter() - t0
    print(f"[probe] monolithic: {t1:.2f}s = {total_mb / t1:.0f} MB/s", flush=True)
    del d

    # chunked: C row-groups device_put separately (no concat — measuring
    # pure upload throughput at smaller grain)
    for chunks in (4, 8, 16):
        step = -(-rows // chunks)  # ceil: remainder rows must ship too
        t0 = time.perf_counter()
        parts = []
        for c in range(0, rows, step):
            parts.append(jax.device_put(buf[c : c + step]))
        for p in parts:
            fence(p)
        t1 = time.perf_counter() - t0
        print(
            f"[probe] {len(parts)} chunks of ≤{step * buf.shape[1] * 2 / 2**20:.0f} MB: "
            f"{t1:.2f}s = {total_mb / t1:.0f} MB/s",
            flush=True,
        )
        del parts

    # smaller monolithic sizes for the throughput-vs-size curve
    for frac_rows in (8, 16, 32):
        sub = buf[:frac_rows]
        mb = sub.nbytes / 2**20
        t0 = time.perf_counter()
        d = jax.device_put(sub)
        fence(d)
        t1 = time.perf_counter() - t0
        print(f"[probe] monolithic {mb:.0f} MB: {t1:.2f}s = {mb / t1:.0f} MB/s", flush=True)
        del d


if __name__ == "__main__":
    main()
