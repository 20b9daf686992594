"""Log-mel STFT fingerprints + normalized 2D correlation (device ops).

A new capability beyond the reference (BASELINE.json config #4:
noise-robust spectrogram-domain matching — the reference matches raw PCM
only). TPU mapping: framing → batched rFFT (MXU-decomposed), mel projection
as one matmul, and time-axis correlation of whole fingerprints via
rFFT/irFFT with contraction over mel bins; sliding-window norms come from a
cumulative-sum box filter so the score is a true normalized cross
correlation in [-1, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .correlate import fft_length


def mel_filterbank(
    n_mels: int, n_fft: int, sr: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-style triangular mel filterbank [n_mels, n_fft//2+1]."""
    fmax = fmax if fmax is not None else sr / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lo, cen, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (fft_freqs - lo) / max(cen - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - cen, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        norm = fb[i].sum()
        if norm > 0:
            fb[i] /= norm
    return fb


_FRAME_BLOCK = 4096  # frames per STFT block (bounds the gather footprint)


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames"))
def _stft_power(x, n_fft: int, hop: int, n_frames: int):
    """Power spectrogram in frame blocks: a whole-signal gather would
    materialize an [n_frames, n_fft] index matrix (GBs for hour-long
    episodes); blocks keep the working set to _FRAME_BLOCK×n_fft."""
    n_blocks = -(-n_frames // _FRAME_BLOCK)
    # pad so every block's last frame has n_fft real samples to read
    needed = (n_blocks * _FRAME_BLOCK - 1) * hop + n_fft
    if x.shape[-1] < needed:
        x = jnp.pad(x, (0, needed - x.shape[-1]))
    window = jnp.hanning(n_fft).astype(x.dtype)
    local_idx = (
        jnp.arange(_FRAME_BLOCK)[:, None] * hop + jnp.arange(n_fft)[None, :]
    )

    def block(b):
        start = b * _FRAME_BLOCK * hop
        span = jax.lax.dynamic_slice(
            x, (start,), ((_FRAME_BLOCK - 1) * hop + n_fft,)
        )
        frames = span[local_idx] * window[None, :]
        return jnp.abs(jnp.fft.rfft(frames, n=n_fft)) ** 2

    power = jax.lax.map(block, jnp.arange(n_blocks))
    return power.reshape(n_blocks * _FRAME_BLOCK, -1)[:n_frames]


def log_mel(
    samples: jax.Array,
    sr: int,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 64,
    fb: jax.Array | None = None,
) -> jax.Array:
    """[T] samples → [n_frames, n_mels] log-mel fingerprint."""
    samples = jnp.asarray(samples, jnp.float32)
    n = samples.shape[-1]
    if n < n_fft:
        samples = jnp.pad(samples, (0, n_fft - n))
        n = n_fft
    n_frames = 1 + (n - n_fft) // hop
    power = _stft_power(samples, n_fft, hop, n_frames)
    if fb is None:
        fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sr))
    mel = power @ fb.T  # [n_frames, n_mels] — MXU matmul
    return jnp.log(mel + 1e-8)


def _box_sums(x: jax.Array, width: int) -> jax.Array:
    """Sliding-window sums of a 1D sequence (cumsum box filter)."""
    csum = jnp.concatenate([jnp.zeros(1, x.dtype), jnp.cumsum(x)])
    return csum[width:] - csum[:-width]


@partial(jax.jit, static_argnames=("fft_len", "t_s"))
def _ncc_frames(episode_fp, snippet_fp, fft_len: int, t_s: int):
    """Zero-mean normalized cross-correlation over the time axis (ZNCC).

    episode_fp: [T_e, M]; snippet_fp: [T_s, M]. The snippet is zero-meaned
    once; because Σ(S - mean) = 0 the numerator needs no per-window episode
    mean, and the denominator's window energy uses the window-local mean
    via two cumsum box filters. Returns [T_e - T_s + 1] scores in [-1, 1].
    """
    patch = t_s * episode_fp.shape[1]
    s0 = snippet_fp - jnp.mean(snippet_fp)
    ex = episode_fp.T  # [M, T_e]
    sx = s0.T  # [M, T_s]
    E = jnp.fft.rfft(ex, n=fft_len)
    S = jnp.fft.rfft(sx, n=fft_len)
    corr = jnp.fft.irfft(jnp.sum(E * jnp.conj(S), axis=0), n=fft_len)
    t_e = ex.shape[-1]
    valid = t_e - t_s + 1
    corr = corr[:valid]
    # window-local variance norm: Σe² - (Σe)²/N over each [t, t+t_s)×M patch
    win_sum = _box_sums(jnp.sum(ex, axis=0), t_s)
    win_sq = _box_sums(jnp.sum(ex * ex, axis=0), t_s)
    win_norm2 = jnp.maximum(win_sq - win_sum * win_sum / patch, 0.0)
    snip_norm = jnp.sqrt(jnp.sum(sx * sx))
    return corr / (jnp.sqrt(win_norm2) * snip_norm + 1e-8)


def fingerprint_scores(
    episode_fp: jax.Array, snippet_fp: jax.Array
) -> jax.Array:
    """Zero-mean NCC scores per frame lag (window-local statistics)."""
    t_e, t_s = episode_fp.shape[0], snippet_fp.shape[0]
    if t_e < t_s:
        raise ValueError("episode shorter than snippet")
    L = fft_length(t_e + t_s - 1)
    return _ncc_frames(episode_fp, snippet_fp, L, t_s)
