"""Cross-format matching (BASELINE.json config #1 shape): an opus snippet
located inside an mp3 episode, crossing codecs AND sample rates.

The reference can only match same-rate mp3 streams; this exercises the
full native decode path (mpg123 + libopus + Ogg) plus polyphase
resampling feeding the device matcher.
"""

import numpy as np
import pytest

from audio_matcher_tpu.hostio.decode import (
    encode_audio,
    native_available,
    read_audio,
    resample,
)
from audio_matcher_tpu.models import MatchConfig, SnippetMatcher

pytestmark = pytest.mark.skipif(
    not (native_available("mp3") and native_available("opus")
         and native_available("mp3_encode")),
    reason="needs native codecs",
)


def test_opus_snippet_in_mp3_episode(tmp_path, rng):
    # one master signal; snippet cut from it, stored as 48k opus while the
    # episode goes out as 44.1k mp3
    sr = 44100
    t = np.arange(8 * sr) / sr
    jingle = (
        0.1 * np.sin(2 * np.pi * 392 * t)
        + 0.08 * np.sin(2 * np.pi * 588 * t)
        + 0.04 * rng.standard_normal(len(t))
    ).astype(np.float32) * 0.5
    episode = (rng.standard_normal(90 * sr) * 0.03).astype(np.float32)
    inserted = int(33.0 * sr)
    episode[inserted : inserted + len(jingle)] = jingle

    ep_path = tmp_path / "episode.mp3"
    encode_audio(ep_path, sr, episode)
    snip_path = tmp_path / "jingle.opus"
    encode_audio(snip_path, 48000, resample(jingle, sr, 48000))

    m_sr, m_samples = read_audio(ep_path)
    s_sr, s_samples = read_audio(snip_path)
    assert (m_sr, s_sr) == (44100, 48000)

    snippet_at_m = resample(s_samples, s_sr, m_sr)
    cfg = MatchConfig(chunk_secs=30, distance_secs=30, slab=2)
    peaks = SnippetMatcher(snippet_at_m, m_sr, cfg).match(m_samples)
    assert peaks, "no match across codecs"
    best = max(peaks, key=lambda p: p.height)
    # codec delays (LAME adds ~1700 samples of encoder delay, plus opus
    # pre-skip roundtrip) shift the found offset by a few tens of ms
    assert abs(best.position - inserted) < 0.08 * m_sr
    assert best.height > 0.4
