"""audio-matcher CLI end-to-end on real mp3 files (native decode path),
including the duration tag-cache side effect (mp3_reader.rs:102-106)."""

import logging

import numpy as np
import pytest

from audio_matcher_tpu.cli import matcher_cli
from audio_matcher_tpu.hostio.decode import encode_audio, native_available
from audio_matcher_tpu.hostio.labels import read_labels
from audio_matcher_tpu.meta.tagger import Length, TaggedFile

pytestmark = pytest.mark.skipif(
    not native_available("mp3_encode"), reason="needs native mp3 codec"
)

SR = 44100


def test_matcher_cli_mp3_end_to_end(tmp_path, rng, caplog):
    snippet = np.clip(
        rng.standard_normal(6 * SR) * 0.12, -0.45, 0.45
    ).astype(np.float32)
    episode = (rng.standard_normal(120 * SR) * 0.03).astype(np.float32)
    for off in (15.0, 80.0):
        i = int(off * SR)
        episode[i : i + len(snippet)] = snippet
    snip_path = tmp_path / "intro.mp3"
    ep_path = tmp_path / "episode.mp3"
    encode_audio(snip_path, SR, snippet)
    encode_audio(ep_path, SR, episode)

    ns = matcher_cli.build_parser().parse_args(
        [str(ep_path), "--snippet", str(snip_path),
         "--chunk-size", "30", "--distance", "30"]
    )
    with caplog.at_level(logging.INFO, logger="audio_matcher.cli"):
        assert matcher_cli.run(ns) == 0

    offsets = [r.message for r in caplog.records if "Offset" in r.message]
    assert any("00:00:15" in m for m in offsets)
    assert any("00:01:20" in m for m in offsets)

    labels = read_labels(ep_path.with_suffix(".txt"))
    assert len(labels) == 1
    assert labels[0].name == "Segment 1"
    assert labels[0].start == pytest.approx(15.0 + 7.0, abs=0.05)
    assert labels[0].end == pytest.approx(80.0, abs=0.05)

    # side effect: the duration probe cached whole-second Lengths into the
    # media files' tags
    for path, secs in ((snip_path, 6), (ep_path, 120)):
        cached = TaggedFile.from_path(path).get(Length)
        assert cached is not None
        assert abs(cached - secs) <= 1.0
