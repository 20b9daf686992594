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


def _dft_mat(n: int, sign: int):
    """[n, n] DFT matrix W^{sign·jk} as (real, imag) f32, built IN-GRAPH.

    (Host constants would be embedded as program literals — tens of MB for
    the twiddles — which bloats remote compiles; iota+cos is cheap.)
    """
    j = jnp.arange(n, dtype=jnp.int32)
    jk = (j[:, None] * j[None, :]) % n  # exact in int32 for n ≤ 512
    phase = (sign * 2.0 * np.pi / n) * jk.astype(jnp.float32)
    return jnp.cos(phase), jnp.sin(phase)


def _twiddle(a: int, m: int, sign: int):
    """[a, m] twiddle W_{a·m}^{sign·c·b} as (real, imag) f32, in-graph.

    c·b < a·m ≤ 2^24 stays exact in f32 for the FFT sizes used here.
    """
    n = a * m
    c = jnp.arange(a, dtype=jnp.float32)[:, None]
    b = jnp.arange(m, dtype=jnp.float32)[None, :]
    phase = (sign * 2.0 * np.pi / n) * (c * b)
    return jnp.cos(phase), jnp.sin(phase)


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
    tr, ti = _dft_mat(a, sign)
    # n = idx_a · m + idx_b → [..., a, m]
    xr = xr.reshape(*xr.shape[:-1], a, m)
    xi = xi.reshape(*xi.shape[:-1], a, m)
    yr, yi = _cmatmul(tr, ti, xr, xi, precision)  # [..., c, m]
    if len(factors) == 1:
        return yr.reshape(*yr.shape[:-2], n), yi.reshape(*yi.shape[:-2], n)
    wr, wi = _twiddle(a, m, sign)
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


def full_spectra_parts(x, n: int, precision=DEFAULT_PRECISION):
    """FULL-length (non-hermitian-compressed) spectra of real rows.

    x: [..., T] real → (Sr, Si) each [..., n]. Run once per query set;
    the scan keeps query spectra full-length so the packed inverse needs
    no symmetry reconstruction.
    """
    x = jnp.asarray(x, jnp.float32)
    if x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    return cfft_parts(x, jnp.zeros_like(x), precision=precision)


def corr_slab_mxu(
    windows,  # [B, W] f32 (W ≤ n; zero-padded)
    s_full_r,  # [Q, n] f32 — full-length query spectra (real part)
    s_full_i,  # [Q, n] f32
    valid_max: int,
    precision=DEFAULT_PRECISION,
    factors: tuple[int, ...] | None = None,
):
    """All (window, query) valid correlations with every FFT on the MXU.

    Work per slab: B/2 forward complex FFTs (window pairs packed as
    z = w0 + i·w1, spectra recovered by hermitian split) and B·Q/2
    inverse complex FFTs (consecutive (window, query) correlation spectra
    packed as V = Ca + i·Cb; both outputs are real so icfft(V) yields the
    pair directly). XLA's TPU rFFT/irFFT are priced as FULL complex
    transforms (measured, benches/probe_fft.py), so the packing alone is
    a 2× cut even before the MXU speedup. Returns [B, Q, valid_max] f32.
    """
    B, W = windows.shape
    Q, n = s_full_r.shape
    factors = factors or default_factors(n)
    if W < n:
        windows = jnp.pad(windows, ((0, 0), (0, n - W)))
    if B % 2:
        windows = jnp.pad(windows, ((0, 1), (0, 0)))
    Bp = windows.shape[0]
    # forward: pack window pairs
    Zr, Zi = cfft_parts(
        windows[0::2], windows[1::2], precision=precision, factors=factors
    )  # [Bp/2, n]
    # hermitian split at FULL length: Z[-k] = Z[(n-k) mod n]
    Rr = jnp.roll(Zr[..., ::-1], 1, axis=-1)
    Ri = jnp.roll(Zi[..., ::-1], 1, axis=-1)
    Xr = jnp.stack([0.5 * (Zr + Rr), 0.5 * (Zi + Ri)], axis=1)
    Xi = jnp.stack([0.5 * (Zi - Ri), 0.5 * (Rr - Zr)], axis=1)
    Xr = Xr.reshape(Bp, n)[:B]
    Xi = Xi.reshape(Bp, n)[:B]
    # correlation spectra C = X · conj(S), flattened over (window, query)
    Cr = (Xr[:, None, :] * s_full_r[None] + Xi[:, None, :] * s_full_i[None])
    Ci = (Xi[:, None, :] * s_full_r[None] - Xr[:, None, :] * s_full_i[None])
    P = B * Q
    Cr = Cr.reshape(P, n)
    Ci = Ci.reshape(P, n)
    if P % 2:
        Cr = jnp.pad(Cr, ((0, 1), (0, 0)))
        Ci = jnp.pad(Ci, ((0, 1), (0, 0)))
    # inverse: pack correlation pairs V = C_{2k} + i·C_{2k+1}
    Vr = Cr[0::2] - Ci[1::2]
    Vi = Ci[0::2] + Cr[1::2]
    yr, yi = cfft_parts(
        Vr, Vi, inverse=True, precision=precision, factors=factors
    )
    c = jnp.stack([yr[..., :valid_max], yi[..., :valid_max]], axis=1)
    return c.reshape(-1, valid_max)[:P].reshape(B, Q, valid_max)


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
