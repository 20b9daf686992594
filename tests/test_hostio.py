"""Host-IO tests: decode parity scaling, duration probe + tag cache,
label files, prefetcher (SURVEY.md §2.1/2.2/2.12-data)."""

import numpy as np
import pytest

from audio_matcher_tpu.hostio.decode import (
    PCM_FACTOR,
    audio_duration,
    encode_audio,
    native_available,
    read_audio,
    read_wav,
    write_wav,
)
from audio_matcher_tpu.hostio.labels import (
    TimeLabel,
    read_labels,
    timelabel_from_peaks,
    write_labels,
)
from audio_matcher_tpu.hostio.prefetch import decode_prefetched
from audio_matcher_tpu.ops.peaks import Peak


def test_wav_roundtrip_reference_scaling(tmp_path, rng):
    # int16 full scale is ±0.5 in the reference's (l+r)*0.5/65535 scaling —
    # keep amplitudes well below to avoid clipping
    mono = (rng.standard_normal(4000) * 0.05).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, 8000, mono)
    sr, back = read_wav(path)
    assert sr == 8000
    # stereo duplicate downmix (l+r)*0.5*PCM_FACTOR returns the int16 grid
    np.testing.assert_allclose(back, mono, atol=float(PCM_FACTOR))
    # values live on the (l+r)*0.5/65535 grid — parity with mp3_reader.rs:35
    steps = back / (0.5 * PCM_FACTOR)
    # f32 resolution at ±2^16 is ~0.008 — allow for it
    np.testing.assert_allclose(steps, np.round(steps), atol=0.05)


def test_duration_probe_writes_tag_cache(tmp_path, rng):
    if not native_available("mp3_encode"):
        pytest.skip("no native mp3 encoder")
    from audio_matcher_tpu.meta.tagger import Length, TaggedFile

    mono = (rng.standard_normal(44100 * 3) * 0.1).astype(np.float32)
    path = tmp_path / "probe.mp3"
    encode_audio(path, 44100, mono)
    assert TaggedFile.from_path(path, True).get(Length) is None
    d1 = audio_duration(path)
    assert d1 == pytest.approx(3.0, abs=0.2)
    # side effect: duration cached into the media file's tag (whole seconds)
    cached = TaggedFile.from_path(path).get(Length)
    assert cached == float(int(cached))
    assert cached == pytest.approx(d1, abs=1.0)
    # second probe is served from the tag
    d2 = audio_duration(path)
    assert d2 == cached


def test_read_audio_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_audio(tmp_path / "nope.mp3")


def test_labels_roundtrip(tmp_path):
    labels = [TimeLabel(1.5, 2.25, "a b"), TimeLabel(3.0, 4.0, None)]
    path = tmp_path / "l.txt"
    write_labels(labels, path)
    back = read_labels(path)
    assert back == labels


def test_timelabel_from_peaks():
    sr = 10
    peaks = [Peak(100, 1.0, 1.0), Peak(300, 1.0, 1.0), Peak(900, 1.0, 1.0)]
    labels = timelabel_from_peaks(peaks, sr, 7.0, "Segment #")
    assert len(labels) == 2
    assert labels[0] == TimeLabel(10.0 + 7.0, 30.0, "Segment 1")
    assert labels[1] == TimeLabel(30.0 + 7.0, 90.0, "Segment 2")


def test_prefetch_preserves_order_and_errors(tmp_path, rng):
    paths = []
    for i in range(4):
        p = tmp_path / f"f{i}.wav"
        write_wav(p, 8000, (rng.standard_normal(100) * 0.1).astype(np.float32))
        paths.append(p)
    paths.insert(2, tmp_path / "missing.wav")
    out = list(decode_prefetched(paths, depth=2))
    assert [d.path for d in out] == paths
    assert out[2].error is not None
    assert all(d.error is None for i, d in enumerate(out) if i != 2)


def test_prefetch_byte_budget_bounds_queue(tmp_path, rng):
    """With max_bytes set, the queue stops refilling once completed
    results exceed the budget (up to `workers` in-flight always allowed),
    and still yields every file in order."""
    paths = []
    for i in range(8):
        p = tmp_path / f"g{i}.wav"
        write_wav(
            p, 8000, (rng.standard_normal(5000) * 0.1).astype(np.float32)
        )
        paths.append(p)
    # each file decodes to 20 kB f32; a 30 kB budget must never hold the
    # full depth=8 queue (≈160 kB) in completed results
    gen = decode_prefetched(paths, depth=8, workers=1, max_bytes=30_000)
    first = next(gen)
    assert first.path == paths[0]
    # drain; order and completeness are the observable contract
    rest = list(gen)
    assert [d.path for d in rest] == paths[1:]
    assert all(d.error is None for d in [first] + rest)


def test_read_audio_int16_wire_format(tmp_path, rng):
    from audio_matcher_tpu.hostio.decode import read_audio_int16

    mono = (rng.standard_normal(4000) * 0.05).astype(np.float32)
    path = tmp_path / "w.wav"
    write_wav(path, 8000, mono)
    sr16, x16 = read_audio_int16(path)
    sr32, x32 = read_audio(path)
    assert sr16 == sr32
    assert x16.dtype == np.int16
    dev = np.abs(x16.astype(np.float32) / 65535.0 - x32)
    assert float(dev.max()) <= 0.5 / 65535.0 + 1e-9


@pytest.mark.skipif(
    not native_available("mp3_encode"), reason="no native mp3 codec"
)
def test_read_audio_int16_mp3(tmp_path, rng):
    from audio_matcher_tpu.hostio.decode import read_audio_int16

    mono = (rng.standard_normal(44100) * 0.05).astype(np.float32)
    path = tmp_path / "w.mp3"
    encode_audio(path, 44100, mono)
    sr16, x16 = read_audio_int16(path)
    sr32, x32 = read_audio(path)
    assert sr16 == sr32 == 44100
    assert len(x16) == len(x32)
    dev = np.abs(x16.astype(np.float32) / 65535.0 - x32)
    assert float(dev.max()) <= 0.5 / 65535.0 + 1e-9


@pytest.mark.skipif(
    not native_available("opus"), reason="no native opus codec"
)
def test_opus_encode_decode_roundtrip(tmp_path, rng):
    t = np.arange(48000) / 48000
    sig = (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32) * 0.5
    path = tmp_path / "t.opus"
    encode_audio(path, 48000, sig)
    sr, back = read_audio(path)
    assert sr == 48000
    # sample-exact: the encoder flushes its lookahead (review r3 — the
    # unflushed tail lost ~preskip samples) and the decoder's granule
    # trim recovers exactly n samples
    assert len(back) == len(sig)
    corr = np.corrcoef(sig, back)[0, 1]
    assert corr > 0.99


def test_opus_tail_survives_lookahead(tmp_path, rng):
    """Review r3: with n a multiple of the 960-sample frame, the final
    preskip (~312) input samples used to stay in the encoder's lookahead
    buffer — the decoded tail must correlate with the real signal, not
    silence."""
    sig = (rng.standard_normal(960 * 150) * 0.2).astype(np.float32) * 0.5
    path = tmp_path / "tail.opus"
    encode_audio(path, 48000, sig)
    sr, back = read_audio(path)
    assert sr == 48000 and len(back) == len(sig)
    tail = slice(len(sig) - 312, len(sig))
    corr = np.corrcoef(sig[tail], back[tail])[0, 1]
    # opus is lossy on noise, but the unflushed-lookahead bug decoded
    # this region as pure silence (corr ~0)
    assert corr > 0.4, corr
    assert float(np.abs(back[tail]).max()) > 0.01  # not silence


def test_prefetch_wire_dtype(tmp_path, rng):
    """Workers emit staging-wire samples (streaming decode→stage): int16
    straight from the decoder, μ-law companded in the worker — and a
    sample-rate mismatch stays int16 so the resample path gets raw
    samples."""
    from audio_matcher_tpu.models.matcher import quantize_wire

    mono = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    a = tmp_path / "a.wav"
    b = tmp_path / "b.wav"  # mismatched rate
    write_wav(a, 8000, mono)
    write_wav(b, 4000, mono)
    for wire, dtype in (("int16", np.int16), ("mulaw8", np.uint8),
                        ("float32", np.float32)):
        out = list(
            decode_prefetched([a, b], wire_dtype=wire, expect_sr=8000)
        )
        assert out[0].samples.dtype == dtype
        if wire == "mulaw8":
            # matched-rate file companded; mismatched stays int16
            assert out[1].samples.dtype == np.int16
            from audio_matcher_tpu.hostio.decode import read_audio_int16

            _, i16 = read_audio_int16(a)
            np.testing.assert_array_equal(
                out[0].samples, quantize_wire(i16, "mulaw8")
            )


def test_mp3_duration_probe_no_decode(tmp_path, rng):
    """Native frame-header duration probe (the reference's mp3-duration
    crate stage) agrees with the full decode within one frame."""
    from audio_matcher_tpu.hostio.decode import (
        audio_duration,
        encode_audio,
        mp3_duration_probe,
        native_available,
        read_audio,
    )

    if not native_available("mp3_encode") or not native_available(
        "mp3_duration"
    ):
        import pytest

        pytest.skip("native mp3 encode/duration unavailable")
    sr = 44100
    mono = (rng.standard_normal(10 * sr) * 0.1).astype(np.float32)
    p = tmp_path / "d.mp3"
    encode_audio(p, sr, mono)
    want_sr, samples = read_audio(p)
    want = len(samples) / want_sr
    got = mp3_duration_probe(p)
    assert abs(got - want) < 1152 / sr  # one mpeg frame
    # audio_duration's cold-cache path uses the probe, then caches the tag
    d1 = audio_duration(p)
    assert abs(d1 - want) < 1152 / sr


def test_prefetch_byte_budget_caps_submissions(tmp_path, rng, monkeypatch):
    """Review r3: the budget must bound SUBMITTED work, not just
    completed results — the first refill used to submit the full depth
    while queued_bytes() was still 0, so a stalled consumer accumulated
    depth× episodes of host RAM."""
    import time

    from audio_matcher_tpu.hostio import prefetch as pf

    paths = []
    for i in range(8):
        p = tmp_path / f"h{i}.wav"
        write_wav(
            p, 8000, (rng.standard_normal(5000) * 0.1).astype(np.float32)
        )
        paths.append(p)
    calls = []
    real = pf.read_audio

    def counting(path, *a, **kw):
        calls.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pf, "read_audio", counting)
    # every file (20 kB) exceeds the 10 kB budget alone; workers=2 →
    # at most 2 undone submissions may ever be in flight
    gen = pf.decode_prefetched(paths, depth=8, workers=2, max_bytes=10_000)
    next(gen)
    time.sleep(0.3)  # let any (wrongly) over-submitted decodes complete
    assert len(calls) <= 4, calls  # 1 consumed + ≤2 in flight + slack
    assert len(list(gen)) == 7  # completeness unchanged


def test_labels_skip_spectral_selection_lines(tmp_path):
    """Review r3: Audacity spectral-selection exports carry a
    '\\<lo>\\t<hi>' frequency line per label — not a label."""
    p = tmp_path / "spec.txt"
    p.write_text("1.0\t2.0\tseg\n\\\t400.0\t800.0\n3.0\t4.0\tseg2\n")
    labels = read_labels(p)
    assert [(lb.start, lb.name) for lb in labels] == [
        (1.0, "seg"), (3.0, "seg2"),
    ]


def test_timelabel_from_peaks_never_inverts():
    """Review r3: peaks closer than the start delay must not produce a
    start > end label (Audacity rejects those)."""
    sr = 10
    peaks = [Peak(1000, 1.0, 1.0), Peak(1050, 1.0, 1.0)]  # 5 s apart
    labels = timelabel_from_peaks(peaks, sr, 7.0, "Segment #")
    assert labels[0].start == labels[0].end == 105.0
