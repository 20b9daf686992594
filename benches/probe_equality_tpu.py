"""Probe 12: compiled-kernel equality on the REAL chip.

The interpret-mode equality suites (tests/) pin the fused vpu+pallas
path against xla+jnp on CPU; this probe runs the same comparison with
the actual Mosaic-compiled kernels on the TPU — positions must match
exactly and scores within the reference's float tolerance. Each staging
wire format is compared within itself (same wire → identical inputs for
both impls), so int16 additionally exercises the r3 wire-reading fused
forward (fft_major_fwd_wire) as compiled for the chip. Run with
python -u, no pipes.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 22050
TOL = 1.2e-5


def main():
    from audio_matcher_tpu.models.matcher import MatchConfig
    from audio_matcher_tpu.parallel.mesh import make_mesh
    from audio_matcher_tpu.parallel.sweep import ShardedScanner

    rng = np.random.default_rng(9)
    snippets = [
        np.clip(rng.standard_normal(int(t * SR)) * 0.15, -0.45, 0.45)
        .astype(np.float32)
        for t in (2.0, 1.3, 3.1)
    ]
    episodes = []
    for e in range(3):
        ep = (rng.standard_normal(90 * SR) * 0.05).astype(np.float32)
        for q, off in ((0, 5.0 + 7 * e), (1, 44.0), (2, 71.5)):
            i = int(off * SR)
            ep[i : i + len(snippets[q])] = snippets[q]
        episodes.append(ep)

    transfers = os.environ.get("PROBE_TRANSFERS", "float32,int16").split(",")
    base = dict(chunk_secs=10.0, distance_secs=12.0, slab=4, block=512)
    outs = {}
    for transfer in transfers:
        for impl, peaks in (("xla", "jnp"), ("vpu", "pallas")):
            cfg = MatchConfig(
                fft_impl=impl, peaks_impl=peaks,
                transfer_dtype=transfer, **base,
            )
            sc = ShardedScanner(snippets, SR, cfg, make_mesh(1))
            outs[transfer, impl] = [
                [
                    [(p.position, p.height, p.prominence) for p in pk]
                    for pk in per_q
                ]
                for per_q in sc.scan_resident(episodes)
            ]
            print(f"[probe] {transfer}:{impl}+{peaks} scanned", flush=True)

    mismatch = 0
    n_peaks = 0
    for transfer in transfers:
        for e in range(len(episodes)):
            for q in range(len(snippets)):
                a = outs[transfer, "xla"][e][q]
                b = outs[transfer, "vpu"][e][q]
                n_peaks += len(a)
                tag = f"{transfer} ep{e} q{q}"
                pos_a = [p for p, _, _ in a]
                pos_b = [p for p, _, _ in b]
                if pos_a != pos_b:
                    mismatch += 1
                    print(
                        f"[probe] {tag} POSITIONS {pos_a} != {pos_b}",
                        flush=True,
                    )
                    continue
                for (p, h1, pr1), (_, h2, pr2) in zip(a, b):
                    rel = abs(h1 - h2) / max(abs(h1), 1e-6)
                    relp = abs(pr1 - pr2) / max(abs(pr1), 1e-6)
                    if rel > TOL or relp > TOL:
                        mismatch += 1
                        print(
                            f"[probe] {tag} pos {p}: scores "
                            f"{h1:.7f}/{h2:.7f} prom {pr1:.7f}/{pr2:.7f}",
                            flush=True,
                        )
    print(
        f"[probe] compiled-TPU equality: {n_peaks} peaks compared over "
        f"{transfers}, {mismatch} mismatches "
        f"({'OK' if mismatch == 0 else 'FAIL'})",
        flush=True,
    )


if __name__ == "__main__":
    main()
