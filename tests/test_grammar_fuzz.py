"""Property/fuzz tests for the label-name and duration grammars."""

import random
import string

import pytest

from audio_matcher_tpu.archive.data import (
    ChapterNumber,
    build_timelabel_name,
    parse_line,
)
from audio_matcher_tpu.utils.durations import NoMatchError, parse_duration


def test_parse_line_never_crashes():
    rng = random.Random(0)
    alphabet = string.printable
    for _ in range(2000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        parse_line(s)  # must not raise


def test_build_parse_roundtrip():
    rng = random.Random(1)
    for _ in range(500):
        series = "".join(
            rng.choice(string.ascii_letters + " ")
            for _ in range(rng.randint(1, 12))
        ).strip() or "S"
        nr = ChapterNumber(
            rng.randint(1, 999), rng.random() < 0.3, rng.random() < 0.3
        )
        part = rng.choice([None, rng.randint(1, 9)])
        chapter = rng.choice([None, "Kapitel X", "Mit 3 Zahlen 7"])
        name = build_timelabel_name(series, nr, part, chapter)
        parsed = parse_line(name)
        assert parsed is not None, name
        got_series, got_nr, got_part, got_chapter = parsed
        # the grammar is non-greedy on series — a series ending in digits
        # can merge into the number; skip those pathological names like the
        # reference grammar would misparse them too
        if series[-1:].isdigit():
            continue
        assert got_series == series
        assert got_nr == nr
        assert got_part == part
        assert got_chapter == chapter


def test_chapter_number_roundtrip():
    rng = random.Random(2)
    for _ in range(500):
        nr = ChapterNumber(
            rng.randint(0, 10_000), rng.random() < 0.5, rng.random() < 0.5
        )
        assert ChapterNumber.parse(str(nr)) == nr


def test_parse_duration_fuzz_never_hangs_or_crashes():
    rng = random.Random(3)
    alphabet = "0123456789hmsec "
    ok = 0
    for _ in range(2000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        try:
            val = parse_duration(s)
            assert val >= 0.0
            ok += 1
        except NoMatchError:
            pass
    assert ok > 0  # some random strings do parse


def test_duration_roundtrip_seconds():
    for secs in (0, 1, 59, 60, 3599, 3600, 86399):
        h, rem = divmod(secs, 3600)
        m, s = divmod(rem, 60)
        text = f"{h}h{m}m{s}s" if h else (f"{m}m{s}s" if m else f"{s}s")
        assert parse_duration(text) == float(secs)


def test_parse_duration_model_differential_fuzz():
    """Generate strings FROM the grammar (random unit subsets, long/short
    suffix forms) and check the parsed value against an independent model
    computing the reference's nested (h·60+m)·60+s ·1000+ms chain
    (reference src/args.rs:80-121)."""
    rng = random.Random(11)
    suffix = {
        "hour": ["h", "hour", "hours"],
        "min": ["m", "min"],
        "sec": ["s", "sec"],
        "msec": ["ms", "msec"],
    }
    for _ in range(500):
        parts = {
            k: rng.randint(0, 500)
            for k in ("hour", "min", "sec", "msec")
            if rng.random() < 0.6
        }
        if not parts:
            continue
        text = "".join(
            f"{parts[k]}{rng.choice(suffix[k])}"
            for k in ("hour", "min", "sec", "msec")
            if k in parts
        )
        want = (
            (
                (parts.get("hour", 0) * 60 + parts.get("min", 0)) * 60
                + parts.get("sec", 0)
            )
            * 1000
            + parts.get("msec", 0)
        ) / 1000.0
        assert parse_duration(text) == want, text


def test_parse_duration_rejects_out_of_order_units():
    for bad in (
        "1m2h", "5s1m", "100ms5s", "1s1h", "3ms2m",
        "h", "m", "s", "ms", "1h2h", "1.5s", "-3s", "1 h", "hms",
    ):
        with pytest.raises(NoMatchError):
            parse_duration(bad)
