"""Edge-path robustness: protocol errors, short inputs, corrupted media."""

import numpy as np
import pytest

from audio_matcher_tpu.models import MatchConfig, SnippetMatcher

SR = 8000


def test_episode_shorter_than_snippet(rng):
    snippet = (rng.standard_normal(4 * SR) * 0.2).astype(np.float32)
    episode = (rng.standard_normal(SR) * 0.05).astype(np.float32)  # 1 s
    cfg = MatchConfig(chunk_secs=10, distance_secs=30, slab=4)
    peaks = SnippetMatcher(snippet, SR, cfg).match(episode)
    assert peaks == []


def test_empty_episode(rng):
    snippet = (rng.standard_normal(SR) * 0.2).astype(np.float32)
    cfg = MatchConfig(chunk_secs=10, distance_secs=30, slab=4)
    assert SnippetMatcher(snippet, SR, cfg).match(np.zeros(0, np.float32)) == []


def test_silent_episode_no_peaks(rng):
    snippet = (rng.standard_normal(SR) * 0.2).astype(np.float32)
    episode = np.zeros(20 * SR, np.float32)
    cfg = MatchConfig(chunk_secs=10, distance_secs=30, slab=4)
    assert SnippetMatcher(snippet, SR, cfg).match(episode) == []


def test_audacity_failed_command_raises(tmp_path, monkeypatch):
    from audio_matcher_tpu.worker.audacity import AudacityApi, AudacityError
    from audio_matcher_tpu.worker.fake_audacity import FakeAudacity

    pipe_dir = tmp_path / "pipes"
    monkeypatch.setenv("AUDACITY_PIPE_DIR", str(pipe_dir))
    server = FakeAudacity(pipe_dir)
    try:
        api = AudacityApi(timeout=5)
        with pytest.raises(AudacityError):
            api.do("NoSuchCommand:")
        # the session survives a failed command
        api.write_assume_empty("NewLabelTrack:")
        assert len(api.get_track_info()) == 1
        api.close()
    finally:
        server.stop()


def test_opus_decode_with_garbage_prefix(tmp_path, rng):
    from audio_matcher_tpu.hostio.decode import (
        encode_audio, native_available, read_audio,
    )

    if not native_available("opus"):
        pytest.skip("no native opus")
    sig = (rng.standard_normal(48000) * 0.1).astype(np.float32)
    path = tmp_path / "x.opus"
    encode_audio(path, 48000, sig)
    # prepend junk: the ogg demuxer must resync on the first OggS capture
    data = path.read_bytes()
    path.write_bytes(b"JUNKJUNKJUNK" + data)
    sr, back = read_audio(path)
    assert sr == 48000
    assert len(back) > 40000


def test_corrupt_mp3_raises_clean_error(tmp_path):
    from audio_matcher_tpu.hostio.decode import (
        DecodeError, native_available, read_audio,
    )

    if not native_available("mp3"):
        pytest.skip("no native mp3")
    path = tmp_path / "bad.mp3"
    path.write_bytes(b"this is not an mp3 file at all" * 10)
    with pytest.raises((DecodeError, Exception)):
        sr, x = read_audio(path)
        # mpg123 may tolerate junk and emit nothing — that's also a failure
        assert len(x) > 0


def test_progress_file_with_crlf_and_blank_lines(tmp_path):
    from audio_matcher_tpu.meta.progress import Progress, State

    p = tmp_path / ".done.txt"
    p.write_text("a done\r\n\n   \nb Named\n")
    prog = Progress(p)
    # \r survives rpartition as part of the state token → tolerated or parsed
    assert prog.get("b") == State.NAMED
