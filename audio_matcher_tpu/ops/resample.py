"""Polyphase resampling on device.

A capability the reference lacks entirely (its matcher errors on
sample-rate mismatch, matcher/errors.rs:8-11); the host fallback lives in
``hostio.decode.resample`` (scipy). This version maps the whole polyphase
structure onto ONE XLA convolution: ``conv_general_dilated`` with
``lhs_dilation=up`` (zero-stuffing) and ``window_strides=down``
(decimation) — the compiler never materializes the up-sampled signal and
the FIR runs on the MXU. Matches ``scipy.signal.resample_poly``'s default
Kaiser design so the two paths are interchangeable.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _poly_filter(up: int, down: int) -> np.ndarray:
    """scipy.signal.resample_poly's default FIR (firwin Kaiser β=5.0,
    2·10·max(up,down) taps, cutoff at the tighter Nyquist), scaled by
    ``up`` to preserve amplitude."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0))
    return (h * up).astype(np.float32)


@partial(
    jax.jit, static_argnames=("up", "down", "n_out", "wire_int16")
)
def _resample_conv(
    x, h, up: int, down: int, n_out: int, wire_int16: bool = False
):
    # scipy centers the filter: pad so output sample j corresponds to
    # input time j*down/up with the group delay removed. Right pad must
    # reach the last output index: out_len = floor(((T-1)·up + 1 + half
    # + pad_r − K)/down) + 1 ≥ ceil(T·up/down) needs pad_r ≥ half + down
    # + up − 1 (a fixed half+down came up short whenever up > down and
    # the input landed on a bucket boundary)
    half = (h.shape[0] - 1) // 2
    flat = x.reshape((-1, x.shape[-1]))  # leading dims → conv batch
    lhs = flat[:, None, :]  # [N, C=1, T]
    rhs = h[::-1][None, None, :]  # [O=1, I=1, K] (conv = corr w/ reversed)
    y = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(down,),
        padding=[(half, half + down + up - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :n_out]
    y = y.reshape(x.shape[:-1] + (y.shape[-1],))
    if wire_int16:
        # quantize to the staging wire grid ON DEVICE: halves the
        # device→host readback bytes on relayed links
        return jnp.clip(
            jnp.round(y * 65535.0), -32768, 32767
        ).astype(jnp.int16)
    return y


def _bucket_len(n: int) -> int:
    """Smallest ``{8,10,12,14,16}·2^k ≥ n`` (≤25% pad): real archives have
    a distinct length per file, and jitting the conv per exact length
    would recompile for every episode (minutes each on relayed TPU links
    with no persistent cache). Bucketing caps the compiled shapes at
    O(log n) per rate pair; the pad is zeros — exactly the edge model
    ``scipy.signal.resample_poly`` assumes — so the first ``n_out`` output
    samples are bit-identical to the unpadded computation."""
    if n <= 8:
        return 8
    k = max((n - 1).bit_length() - 4, 0)
    for m in (8, 10, 12, 14, 16):
        if m << k >= n:
            return m << k
    raise AssertionError(n)


def resample_poly_device_padded(
    samples, sr_from: int, sr_to: int, wire_int16: bool = False
) -> tuple[jax.Array, int]:
    """Bucketed device resample: returns ``(y, n_out)`` where ``y`` has
    the BUCKETED output length and only ``y[:n_out]`` is the real result.
    Callers doing a host readback anyway (hostio.decode.resample) slice
    after ``np.asarray`` — avoiding both a per-length conv recompile and a
    per-shape device slice program."""
    x = samples
    if not isinstance(x, np.ndarray):
        x = np.asarray(x)
    x = x.astype(np.float32, copy=False)
    n = x.shape[-1]
    if sr_from == sr_to:
        xj = jnp.asarray(x)
        if wire_int16:
            return (
                jnp.clip(jnp.round(xj * 65535.0), -32768, 32767).astype(
                    jnp.int16
                ),
                n,
            )
        return xj, n
    g = math.gcd(int(sr_from), int(sr_to))
    up, down = sr_to // g, sr_from // g
    n_out = -(-n * up // down)
    n_b = _bucket_len(n)
    if n_b != n:  # host-side pad keeps staging execution-free (a device
        # pad would be an execution — later uploads then run in the
        # relay's post-execution ~21 MB/s mode; PERF.md)
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_b - n)])
    n_out_b = -(-n_b * up // down)
    h = jnp.asarray(_poly_filter(up, down))
    y = _resample_conv(jnp.asarray(x), h, up, down, n_out_b, wire_int16)
    return y, n_out


def resample_poly_device(
    samples, sr_from: int, sr_to: int, wire_int16: bool = False
) -> jax.Array:
    """[T] f32 → resampled on device; matches
    ``scipy.signal.resample_poly(x, up, down)`` to float tolerance.

    ``wire_int16``: return int16 staging-wire values (``round(y·65535)``)
    instead of f32 — quantization happens device-side so only half the
    bytes ride the readback.
    """
    y, n_out = resample_poly_device_padded(
        samples, sr_from, sr_to, wire_int16
    )
    return y[..., :n_out] if y.shape[-1] != n_out else y
