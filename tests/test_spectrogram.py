"""Spectrogram-domain matcher tests (noise-robust mode)."""

import numpy as np

from audio_matcher_tpu.models.spectrogram import (
    SpectrogramConfig,
    SpectrogramMatcher,
)

SR = 16000


def make_snippet(rng, secs=3.0):
    # harmonic-rich snippet so the mel fingerprint is distinctive
    t = np.arange(int(secs * SR)) / SR
    x = sum(
        np.sin(2 * np.pi * f * t + p)
        for f, p in [(220, 0.1), (523, 1.0), (1397, 2.0)]
    )
    env = np.minimum(1.0, 10 * t) * np.minimum(1.0, 10 * (secs - t))
    return (0.2 * x * env).astype(np.float32)


def test_finds_snippet_under_noise(rng):
    snippet = make_snippet(rng)
    episode = (rng.standard_normal(60 * SR) * 0.05).astype(np.float32)
    inserted_at = int(20.0 * SR)
    episode[inserted_at : inserted_at + len(snippet)] += snippet
    # heavy additive noise on top — PCM correlation would degrade
    episode += (rng.standard_normal(len(episode)) * 0.05).astype(np.float32)

    cfg = SpectrogramConfig(distance_secs=10.0)
    matcher = SpectrogramMatcher(snippet, SR, cfg)
    peaks = matcher.match(episode)
    assert peaks, "no match found"
    best = max(peaks, key=lambda p: p.height)
    # frame accuracy: within one hop
    assert abs(best.position - inserted_at) <= cfg.hop
    assert best.height > 0.5


def test_no_false_positive_on_pure_noise(rng):
    snippet = make_snippet(rng)
    episode = (rng.standard_normal(30 * SR) * 0.05).astype(np.float32)
    matcher = SpectrogramMatcher(snippet, SR, SpectrogramConfig(distance_secs=5.0))
    peaks = matcher.match(episode)
    assert all(p.height < 0.5 for p in peaks)
