"""Parity tests against the reference's actual bundled assets.

The reference ships res/id3test.mp3 + res/tag_test.opus (its tagger test
fixtures, SURVEY.md §4); when the reference checkout is mounted, we verify
our independent codec + tagger implementations read the very same values
the reference's tests assert, and that BASELINE.json config #1 (locating
the opus snippet inside the mp3) works on them.
"""

from pathlib import Path

import numpy as np
import pytest

from audio_matcher_tpu.hostio.decode import native_available

REF = Path("/root/reference/res")

pytestmark = pytest.mark.skipif(
    not (REF / "id3test.mp3").exists(), reason="reference assets not mounted"
)


@pytest.mark.parametrize("name", ["id3test.mp3", "tag_test.opus"])
def test_tagger_reads_reference_fixture(name):
    # values the reference's own tests assert (tagger.rs:782-792)
    from audio_matcher_tpu.meta.tagger import (
        Album, Artist, Disk, Genre, Length, TaggedFile, Title,
        TotalDisks, TotalTracks, Track, Year,
    )

    tag = TaggedFile.from_path(REF / name)
    assert tag.get(Title) == "title"
    assert tag.get(Artist) == "artist"
    assert tag.get(Album) == "album"
    assert tag.get(Genre) == "genre"
    assert tag.get(Year) == 2023
    assert tag.get(Track) == 5
    assert tag.get(TotalTracks) == 7
    assert tag.get(Disk) == 2
    assert tag.get(TotalDisks) is None
    assert tag.get(Length) == 7.0


@pytest.mark.skipif(
    not native_available("mp3"), reason="needs native mp3 decode"
)
def test_decode_reference_mp3_shape():
    from audio_matcher_tpu.hostio.decode import read_audio

    sr, x = read_audio(REF / "id3test.mp3")
    assert sr == 44100
    # ~7.3 s of audio; amplitude within the (l+r)*0.5/65535 scale
    assert 7.0 < len(x) / sr < 7.6
    assert float(np.abs(x).max()) < 0.5


@pytest.mark.skipif(
    not (native_available("mp3") and native_available("opus")),
    reason="needs native codecs",
)
def test_baseline_config1_opus_snippet_in_mp3():
    """BASELINE.json config #1: locate the tag_test.opus snippet inside
    id3test.mp3 (they carry the same recording at 48 k / 44.1 k)."""
    from audio_matcher_tpu.hostio.decode import read_audio, resample
    from audio_matcher_tpu.ops import correlate

    sr_m, mp3 = read_audio(REF / "id3test.mp3")
    sr_o, opus = read_audio(REF / "tag_test.opus")
    assert (sr_m, sr_o) == (44100, 48000)
    query = resample(opus, sr_o, sr_m)[sr_m : 3 * sr_m]  # 2 s slice @ 1 s
    scores = np.asarray(correlate(mp3, query, mode="valid", scale=True))
    best = int(np.argmax(scores))
    # codec delays shift the alignment by a few tens of ms around 1.0 s
    assert abs(best / sr_m - 1.0) < 0.1
    assert scores[best] > 0.8


def test_progress_reads_reference_fixture(tmp_path):
    """The reference's own res/progress.txt (its worker tests assert these
    states, worker/mod.rs:342-392) parses identically in our store."""
    import shutil

    from audio_matcher_tpu.meta.progress import Progress, State

    work = tmp_path / "progress.txt"
    shutil.copy(REF / "progress.txt", work)
    p = Progress(work)
    assert p.get("element 1") == State.DONE
    assert p.get("element 2") == State.LOADED
    assert p.get("element 3") == State.DONE
    assert p.get("element 4") == State.NAMED
    assert p.get("element 5") is None
