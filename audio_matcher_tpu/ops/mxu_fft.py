"""MXU matmul FFT: Cooley-Tukey via DFT matmuls + twiddles.

XLA's native TPU FFT runs the hot irFFT of the scan at ~130 GFLOP/s —
VPU-bound and far off the chip's roofline. This module re-expresses the
FFT as a recursive four-step decomposition whose butterflies are DENSE
DFT MATMULS (128–512 points), putting ~97% of the FLOPs on the MXU
(systolic array) instead:

    X[c + A·d] = Σ_b  W_N^{bc} · (Σ_a x[a·B + b] · W_A^{ac}) · W_B^{bd}
                 ────twiddle────  ───── DFT_A matmul ──────    recurse

Complex arithmetic is hand-split into real matmul pairs so matmul
precision is controllable (``precision=HIGHEST`` ≈ f32-accurate via bf16
pass decomposition). Real signals are packed in PAIRS into one complex
transform (z = a + i·b), which the scan exploits: two query correlations
per inverse FFT.

Verified against numpy's FFT to ~1e-6 relative error (tests/test_mxu_fft.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def default_factors(n: int) -> tuple[int, ...]:
    """Factor n (a power of two) into DFT-matmul radices of 64–512."""
    if n & (n - 1):
        raise ValueError(f"mxu fft requires a power of two, got {n}")
    factors = []
    while n > 512:
        factors.append(256)
        n //= 256
    factors.append(n)
    return tuple(factors)


@lru_cache(maxsize=32)
def _dft_mat_host(n: int, sign: int) -> tuple[np.ndarray, np.ndarray]:
    """[n, n] DFT matrix W^{sign·jk} as (real, imag) f32 (float64 phases)."""
    j = np.arange(n)
    phase = sign * 2.0 * np.pi / n * np.outer(j, j % n)
    return (
        np.cos(phase).astype(np.float32),
        np.sin(phase).astype(np.float32),
    )


@lru_cache(maxsize=64)
def _twiddle_host(a: int, m: int, sign: int) -> tuple[np.ndarray, np.ndarray]:
    """[a, m] twiddle W_{a·m}^{sign·c·b} as (real, imag) f32."""
    n = a * m
    c = np.arange(a)[:, None].astype(np.float64)
    b = np.arange(m)[None, :].astype(np.float64)
    phase = sign * 2.0 * np.pi / n * (c * b)
    return (
        np.cos(phase).astype(np.float32),
        np.sin(phase).astype(np.float32),
    )


def _cmatmul(tr, ti, xr, xi, precision):
    """(tr + i·ti) @ (xr + i·xi) with the contraction on the MXU.

    t: [c, a]; x: [..., a, m] → [..., c, m]; 4 real matmuls.
    """
    dot = partial(jnp.einsum, "ca,...am->...cm", precision=precision)
    rr = dot(tr, xr)
    ii = dot(ti, xi)
    ri = dot(tr, xi)
    ir = dot(ti, xr)
    return rr - ii, ri + ir


def _cfft_rec(xr, xi, factors, precision, sign):
    """Recursive four-step complex FFT along the LAST axis (length
    prod(factors)); x as separate (real, imag) f32 arrays."""
    a = factors[0]
    n = xr.shape[-1]
    m = n // a
    tr, ti = (jnp.asarray(v) for v in _dft_mat_host(a, sign))
    # n = idx_a · m + idx_b → [..., a, m]
    xr = xr.reshape(*xr.shape[:-1], a, m)
    xi = xi.reshape(*xi.shape[:-1], a, m)
    yr, yi = _cmatmul(tr, ti, xr, xi, precision)  # [..., c, m]
    if len(factors) == 1:
        return yr.reshape(*yr.shape[:-2], n), yi.reshape(*yi.shape[:-2], n)
    wr, wi = (jnp.asarray(v) for v in _twiddle_host(a, m, sign))
    zr = yr * wr - yi * wi
    zi = yr * wi + yi * wr
    zr, zi = _cfft_rec(zr, zi, factors[1:], precision, sign)  # [..., c, d]
    # k = c + a·d → put d before c, then flatten
    zr = jnp.swapaxes(zr, -1, -2).reshape(*zr.shape[:-2], n)
    zi = jnp.swapaxes(zi, -1, -2).reshape(*zi.shape[:-2], n)
    return zr, zi


def cfft_parts(
    xr,
    xi,
    inverse: bool = False,
    factors: tuple[int, ...] | None = None,
    precision=DEFAULT_PRECISION,
):
    """Complex FFT along the last axis on split (real, imag) f32 arrays.

    Forward matches ``np.fft.fft``; inverse matches ``np.fft.ifft``
    (including the 1/N scale). Returns (real, imag).
    """
    n = xr.shape[-1]
    factors = factors or default_factors(n)
    sign = 1 if inverse else -1
    yr, yi = _cfft_rec(
        jnp.asarray(xr, jnp.float32),
        jnp.asarray(xi, jnp.float32),
        factors, precision, sign,
    )
    if inverse:
        s = jnp.float32(1.0 / n)
        return yr * s, yi * s
    return yr, yi


@partial(jax.jit, static_argnames=("inverse", "factors"))
def cfft(x, inverse: bool = False, factors: tuple[int, ...] | None = None):
    """Convenience complex64 in/out wrapper (jitted)."""
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = cfft_parts(xr, xi, inverse=inverse, factors=factors)
    return yr + 1j * yi


def rfft_pair_parts(x2, n: int, precision=DEFAULT_PRECISION):
    """rFFT of PAIRS of real rows via one complex transform.

    x2: [..., 2, T] real (T ≤ n; zero-padded to n). Returns
    (Ar, Ai, Br, Bi) each [..., n//2 + 1]: the rfft of row 0 and row 1.
    Uses z = a + i·b; hermitian split recovers both spectra.
    """
    T = x2.shape[-1]
    if T < n:
        pad = [(0, 0)] * (x2.ndim - 1) + [(0, n - T)]
        x2 = jnp.pad(x2, pad)
    zr = x2[..., 0, :]
    zi = x2[..., 1, :]
    yr, yi = cfft_parts(zr, zi, inverse=False, precision=precision)
    h = n // 2 + 1
    # Z[-k] with k in [0, h): index (n - k) mod n
    rev_r = jnp.concatenate([yr[..., :1], yr[..., :0:-1]], axis=-1)[..., :h]
    rev_i = jnp.concatenate([yi[..., :1], yi[..., :0:-1]], axis=-1)[..., :h]
    fr, fi = yr[..., :h], yi[..., :h]
    ar = 0.5 * (fr + rev_r)
    ai = 0.5 * (fi - rev_i)
    br = 0.5 * (fi + rev_i)
    bi = 0.5 * (rev_r - fr)
    return ar, ai, br, bi


def irfft_pair_parts(ar, ai, br, bi, n: int, precision=DEFAULT_PRECISION):
    """Inverse of two hermitian spectra → two real signals, via ONE complex
    inverse transform: icfft(A + i·B) = a + i·b when a, b are real.

    a*, b*: [..., n//2 + 1] split spectra. Returns (a, b) each [..., n].
    """
    h = n // 2 + 1
    zr = ar - bi
    zi = ai + br
    # extend to full length by hermitian symmetry of A and B:
    # Z[n-k] = conj(A[k]) + i·conj(B[k]) for k in [1, n/2)
    tr = ar[..., 1:-1][..., ::-1]
    ti = ai[..., 1:-1][..., ::-1]
    ur = br[..., 1:-1][..., ::-1]
    ui = bi[..., 1:-1][..., ::-1]
    zr_full = jnp.concatenate([zr, tr + ui], axis=-1)
    zi_full = jnp.concatenate([zi, ur - ti], axis=-1)
    del h
    yr, yi = cfft_parts(zr_full, zi_full, inverse=True, precision=precision)
    return yr, yi
