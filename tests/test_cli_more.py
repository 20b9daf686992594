"""Additional CLI-surface coverage: multi-file runs, --resample, adjust_labels."""

import numpy as np
import pytest

from audio_matcher_tpu.cli import matcher_cli
from audio_matcher_tpu.hostio.decode import resample, write_wav
from audio_matcher_tpu.hostio.labels import read_labels

SR = 8000


@pytest.fixture
def fixtures(tmp_path, rng):
    snippet = (rng.standard_normal(2 * SR) * 0.15).astype(np.float32)
    paths = []
    for k, off in enumerate((5.0, 20.0)):
        ep = (rng.standard_normal(40 * SR) * 0.03).astype(np.float32)
        i = int(off * SR)
        ep[i : i + len(snippet)] = snippet
        p = tmp_path / f"ep{k}.wav"
        write_wav(p, SR, ep)
        paths.append(p)
    snip = tmp_path / "snip.wav"
    write_wav(snip, SR, snippet)
    return snip, paths, snippet


def run(args):
    ns = matcher_cli.build_parser().parse_args(args)
    return matcher_cli.run(ns)


def test_multi_file_run_writes_label_per_file(fixtures, caplog):
    import logging

    snip, paths, _ = fixtures
    with caplog.at_level(logging.INFO, logger="audio_matcher.cli"):
        rc = run([str(p) for p in paths] + [
            "--snippet", str(snip), "--chunk-size", "10", "--distance", "10",
        ])
    assert rc == 0
    offsets = [r.message for r in caplog.records if "Offset" in r.message]
    assert any("00:00:05" in m for m in offsets)
    assert any("00:00:20" in m for m in offsets)


def test_out_flag_rejected_for_multiple_files(fixtures, tmp_path):
    snip, paths, _ = fixtures
    rc = run([str(p) for p in paths] + [
        "--snippet", str(snip), "-o", str(tmp_path / "x.txt"),
    ])
    assert rc == 1


def test_resample_flag_matches_cross_rate(fixtures, tmp_path, caplog):
    import logging

    snip_path, paths, snippet = fixtures
    hi = tmp_path / "snip16k.wav"
    write_wav(hi, 16000, resample(snippet, SR, 16000))
    # without --resample: error
    rc = run([str(paths[0]), "--snippet", str(hi), "--no-out",
              "--chunk-size", "10", "--distance", "10"])
    assert rc == 1
    # with --resample: match found at 5 s
    with caplog.at_level(logging.INFO, logger="audio_matcher.cli"):
        rc = run([str(paths[0]), "--snippet", str(hi), "--no-out",
                  "--resample", "--chunk-size", "10", "--distance", "10"])
    assert rc == 0
    assert any(
        "00:00:05" in r.message for r in caplog.records if "Offset" in r.message
    )


def test_spectrogram_mode(tmp_path, rng, caplog):
    # spectral fingerprints need tonal content (white noise is spectrally
    # flat — uninformative for this matcher by design)
    import logging

    t = np.arange(2 * SR) / SR
    snippet = (
        0.1 * np.sin(2 * np.pi * 330 * t) + 0.08 * np.sin(2 * np.pi * 554 * t)
    ).astype(np.float32)
    episode = (rng.standard_normal(40 * SR) * 0.02).astype(np.float32)
    episode[5 * SR : 5 * SR + len(snippet)] += snippet
    snip_p = tmp_path / "tone.wav"
    ep_p = tmp_path / "tone_ep.wav"
    write_wav(snip_p, SR, snippet)
    write_wav(ep_p, SR, episode)
    with caplog.at_level(logging.INFO, logger="audio_matcher.cli"):
        rc = run([str(ep_p), "--snippet", str(snip_p), "--no-out",
                  "--mode", "spectrogram", "--distance", "10"])
    assert rc == 0
    offsets = [r.message for r in caplog.records if "Offset" in r.message]
    assert any("00:00:04" in m or "00:00:05" in m for m in offsets)


def test_transfer_int16_flag_matches_float32(fixtures, caplog):
    import logging

    snip, paths, _ = fixtures
    for transfer in ("float32", "int16", "mulaw8"):
        caplog.clear()
        with caplog.at_level(logging.INFO, logger="audio_matcher.cli"):
            rc = run([str(paths[0]), "--snippet", str(snip), "--no-out",
                      "--chunk-size", "10", "--distance", "10",
                      "--transfer", transfer])
        assert rc == 0
        offsets = [r.message for r in caplog.records if "Offset" in r.message]
        assert any("00:00:05" in m for m in offsets), transfer


def test_adjust_labels_walks_gaps(tmp_path, monkeypatch):
    from audio_matcher_tpu.cli.common import Inputs
    from audio_matcher_tpu.worker.audacity import AudacityApi
    from audio_matcher_tpu.worker.fake_audacity import FakeAudacity
    from audio_matcher_tpu.worker.rename import adjust_labels

    pipe_dir = tmp_path / "pipes"
    monkeypatch.setenv("AUDACITY_PIPE_DIR", str(pipe_dir))
    server = FakeAudacity(pipe_dir)
    try:
        api = AudacityApi(timeout=5)
        api.write_assume_empty("NewLabelTrack:")
        for start, end in [(0.0, 5.0), (10.0, 15.0)]:
            api.select_time(start, end)
            api.write_assume_empty("AddLabel:")
        # 2 labels → 3 gap stops (start, middle, end)
        adjust_labels(api, Inputs(script=["", "", ""]))
        zooms = [c for c in server.command_log if c.startswith("ZoomSel")]
        assert len(zooms) == 3
        api.close()
    finally:
        server.stop()
