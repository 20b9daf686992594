"""Device polyphase resampler vs the scipy oracle."""

import math

import numpy as np
import pytest
import scipy.signal

from audio_matcher_tpu.ops.resample import resample_poly_device


@pytest.mark.parametrize(
    "sr_from,sr_to",
    [(44100, 48000), (48000, 44100), (8000, 16000), (22050, 8000)],
)
def test_matches_scipy_resample_poly(rng, sr_from, sr_to):
    x = rng.standard_normal(33333).astype(np.float32)
    g = math.gcd(sr_from, sr_to)
    want = scipy.signal.resample_poly(
        x.astype(np.float64), sr_to // g, sr_from // g
    ).astype(np.float32)
    got = np.asarray(resample_poly_device(x, sr_from, sr_to))
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 2e-6


def test_identity_rate(rng):
    x = rng.standard_normal(100).astype(np.float32)
    got = np.asarray(resample_poly_device(x, 8000, 8000))
    np.testing.assert_array_equal(got, x)


def test_cross_rate_match_via_device_resample(rng):
    """A 2x-rate episode resampled on device still yields the exact match
    position at the snippet's rate."""
    from audio_matcher_tpu.models.matcher import MatchConfig, SnippetMatcher

    SR = 8000
    snippet = (rng.standard_normal(SR) * 0.2).astype(np.float32)
    episode = (rng.standard_normal(20 * SR) * 0.05).astype(np.float32)
    episode[6 * SR : 7 * SR] = snippet
    hi = scipy.signal.resample_poly(episode.astype(np.float64), 2, 1).astype(
        np.float32
    )
    back = np.asarray(resample_poly_device(hi, 2 * SR, SR))
    m = SnippetMatcher(
        snippet, SR, MatchConfig(chunk_secs=5, distance_secs=8, slab=2)
    )
    peaks = m.match(back)
    assert peaks and abs(peaks[0].position - 6 * SR) <= 1
