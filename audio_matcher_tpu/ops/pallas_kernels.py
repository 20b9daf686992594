"""Pallas TPU kernels for the peak-scan hot path.

The correlation itself lives in XLA's MXU-decomposed FFT; the remaining
HBM-bound stage is peak picking, where the stock jnp path re-reads the
[B, V] correlation row once per distance-suppression round plus again for
prominence bases. ``local_max_block_reduce`` collapses that to a SINGLE
HBM pass: one grid step per (row, V-tile) computes, in VMEM,

  * the tile's best strict local maximum (height + global position)
  * the tile's min / max (the prominence pyramid level)

after which suppression rounds and prominence assembly operate on the tiny
[B, NB] block arrays. Falls back to interpret mode off-TPU so the same
code path is unit-testable on CPU (tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = jnp.float32(-jnp.inf)
_POS = jnp.float32(jnp.inf)


def _block_reduce_kernel(
    valid_ref,  # [1, 1] SMEM — valid length of this row
    x_ref,  # [1, block] VMEM — one tile of the correlation row
    best_val_ref,  # [1, 1] out
    best_pos_ref,  # [1, 1] out
    bmin_ref,  # [1, 1] out
    bmax_ref,  # [1, 1] out
    *,
    block: int,
):
    j = pl.program_id(1)  # tile index along V
    base = j * block
    valid = valid_ref[0, 0]
    x = x_ref[0, :]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)[0] + base
    colvalid = cols < valid

    x_min = jnp.where(colvalid, x, float("inf"))
    x_max = jnp.where(colvalid, x, float("-inf"))
    bmin_ref[0, 0] = jnp.min(x_min)
    bmax_ref[0, 0] = jnp.max(x_max)

    # strict local maxima using in-tile neighbours only; tile-boundary
    # columns are handled by the caller's boundary repair pass
    left = pltpu.roll(x_max, 1, 0)
    right = pltpu.roll(x_max, block - 1, 0)  # shift must be non-negative
    interior = (cols >= base + 1) & (cols <= base + block - 2)
    interior &= (cols >= 1) & (cols <= valid - 2)
    is_peak = (x > left) & (x > right) & interior & colvalid
    heights = jnp.where(is_peak, x, float("-inf"))
    best = jnp.argmax(heights)
    best_val_ref[0, 0] = heights[best]
    best_pos_ref[0, 0] = best.astype(jnp.int32) + base


@partial(jax.jit, static_argnames=("block", "interpret"))
def local_max_block_reduce(
    x: jax.Array,  # [B, V] (V a multiple of block; pad with -inf)
    valid_len: jax.Array,  # [B] int32
    block: int = 1024,
    interpret: bool = False,
):
    """One-pass per-tile peak/extrema reduction.

    Returns (best_val [B, NB], best_pos [B, NB], bmin [B, NB], bmax [B, NB]).
    Tile-boundary local maxima (a peak exactly on a tile edge) are NOT
    detected by this kernel — callers re-check the 2-wide seams on the tiny
    block arrays (see tests for the repair contract).
    """
    B, V = x.shape
    assert V % block == 0, "pad V to a multiple of block"
    nb = V // block
    grid = (B, nb)
    out_shape = [
        jax.ShapeDtypeStruct((B, nb), jnp.float32),
        jax.ShapeDtypeStruct((B, nb), jnp.int32),
        jax.ShapeDtypeStruct((B, nb), jnp.float32),
        jax.ShapeDtypeStruct((B, nb), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (i, j), memory_space=pltpu.SMEM)
        for _ in range(4)
    ]
    return pl.pallas_call(
        partial(_block_reduce_kernel, block=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(valid_len.reshape(B, 1).astype(jnp.int32), x.astype(jnp.float32))


def _conj_mult_scale_kernel(scale_ref, xr, xi, sr, si, or_, oi_):
    """Fused spectrum multiply out = x·conj(s)·scale on split real/imag
    planes (Pallas has no complex refs; split-complex is also the natural
    VPU layout). XLA fuses the jnp equivalent — this is the explicit-VMEM
    reference implementation + microbenchmark hook."""
    k = scale_ref[0, 0]
    a, b = xr[:], xi[:]
    c, d = sr[:], si[:]
    or_[:] = (a * c + b * d) * k
    oi_[:] = (b * c - a * d) * k


@partial(jax.jit, static_argnames=("interpret",))
def conj_mult_scale(x, s, scale, interpret: bool = False):
    """x, s: complex64 arrays of equal shape → x * conj(s) * scale."""
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    planes = (
        jnp.real(x).astype(jnp.float32),
        jnp.imag(x).astype(jnp.float32),
        jnp.real(s).astype(jnp.float32),
        jnp.imag(s).astype(jnp.float32),
    )
    out_r, out_i = pl.pallas_call(
        _conj_mult_scale_kernel,
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)],
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
        ],
        interpret=interpret,
    )(scale_arr, *planes)
    return jax.lax.complex(out_r, out_i)


def seam_repair_host(x: np.ndarray, valid_len: int, block: int):
    """Reference (numpy) for the caller-side seam contract: local maxima at
    tile boundaries that the kernel skips."""
    V = x.shape[-1]
    seams = []
    for j in range(1, V // block):
        for pos in (j * block - 1, j * block):
            if 1 <= pos <= valid_len - 2:
                if x[pos] > x[pos - 1] and x[pos] > x[pos + 1]:
                    seams.append((pos, float(x[pos])))
    return seams
