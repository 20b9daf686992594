"""Spectrogram-domain snippet matching (noise-robust mode).

Model family #2 (BASELINE.json config #4): instead of raw-PCM correlation,
episodes and snippets are reduced to log-mel STFT fingerprints and matched
by normalized cross-correlation over frames. Robust to codec artifacts,
EQ/level differences and moderate noise where the PCM matcher's scores
collapse; offsets are frame-accurate (hop / sr seconds).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ops.peaks import Peak, find_peaks_device
from ..ops.stft import fingerprint_scores, log_mel, mel_filterbank


@dataclasses.dataclass(frozen=True)
class SpectrogramConfig:
    n_fft: int = 1024
    hop: int = 256
    n_mels: int = 64
    distance_secs: float = 8 * 60.0  # reference default match spacing
    min_score: float = 0.4  # NCC threshold (scores in [-1, 1])
    # staging wire format for the sharded batch scanner (see
    # MatchConfig.transfer_dtype): NCC scores are scale-invariant;
    # int16 staging keeps positions identical, scores shift <1% (the
    # log-mel amplifies the 16-bit grid noise at quiet frames)
    transfer_dtype: str = "float32"
    # cross-rate resampling impl for the sweep (see MatchConfig)
    resample_impl: str = "auto"


class SpectrogramMatcher:
    """Reusable per-snippet fingerprint matcher."""

    def __init__(
        self,
        snippet: np.ndarray,
        sr: int,
        config: SpectrogramConfig | None = None,
    ):
        self.sr = int(sr)
        self.config = config or SpectrogramConfig()
        cfg = self.config
        self._fb = jnp.asarray(
            mel_filterbank(cfg.n_mels, cfg.n_fft, self.sr)
        )
        self.snippet_fp = log_mel(
            np.asarray(snippet, np.float32),
            self.sr, cfg.n_fft, cfg.hop, cfg.n_mels, fb=self._fb,
        )

    def match(self, samples: np.ndarray) -> list[Peak]:
        """→ peaks with ``position`` in SAMPLES (frame-accurate)."""
        cfg = self.config
        episode_fp = log_mel(
            np.asarray(samples, np.float32),
            self.sr, cfg.n_fft, cfg.hop, cfg.n_mels, fb=self._fb,
        )
        if episode_fp.shape[0] < self.snippet_fp.shape[0]:
            # shorter than the query: no valid lag — "no matches", not a
            # crash (mirrors the PCM path's short-input handling)
            return []
        scores = np.asarray(fingerprint_scores(episode_fp, self.snippet_fp))
        frame_distance = max(
            int(cfg.distance_secs * self.sr / cfg.hop), 1
        )
        peaks = find_peaks_device(
            scores, distance=frame_distance, min_prominence=0.0
        )
        out = []
        for p in peaks:
            if p.height >= cfg.min_score:
                out.append(
                    Peak(
                        position=p.position * cfg.hop,
                        height=p.height,
                        prominence=p.prominence,
                    )
                )
        return out
