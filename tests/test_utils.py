"""Utility-layer tests: duration grammar, config, string metric, progress bar.

Duration cases mirror the reference's doctests (src/args.rs:66-79).
"""

import io

import pytest

from audio_matcher_tpu.utils.config import dumps_toml, load_config, save_config
from audio_matcher_tpu.utils.durations import (
    NoMatchError,
    fmt_hms,
    fmt_hmsm,
    parse_duration,
)
from audio_matcher_tpu.utils.progressbar import Progress
from audio_matcher_tpu.utils.strmetric import Levenshtein, levenshtein, sort_with


class TestParseDuration:
    @pytest.mark.parametrize(
        "text,want",
        [
            ("17", 17.0),          # blank seconds
            ("58sec", 58.0),       # seconds with identifier
            ("1m", 60.0),          # minutes without seconds
            ("100ms", 0.1),        # milliseconds
            ("1hour1m1s", 3661.0),  # hours, minutes and seconds
            ("3h5m17s", 3 * 3600 + 5 * 60 + 17.0),
            ("2h", 7200.0),
        ],
    )
    def test_ok(self, text, want):
        assert parse_duration(text) == want

    @pytest.mark.parametrize("text", ["", "3abc", "3s5m"])
    def test_fail(self, text):
        with pytest.raises(NoMatchError):
            parse_duration(text)


def test_fmt_hms():
    assert fmt_hms(0) == "00:00:00"
    assert fmt_hms(21.9) == "00:00:21"
    assert fmt_hms(16 * 60 + 43) == "00:16:43"
    assert fmt_hms(3 * 3600 + 20 * 60 + 55) == "03:20:55"


def test_fmt_hmsm():
    assert fmt_hmsm(1250.372) == "00:20:50.372"
    assert fmt_hmsm(0) == "00:00:00.000"


class TestConfig:
    def test_roundtrip(self, tmp_path):
        path = tmp_path / "worker.toml"
        save_config("worker", {"genre": "Hörbuch", "n": 3, "flag": True}, path)
        cfg = load_config("worker", path)
        assert cfg == {"genre": "Hörbuch", "n": 3, "flag": True}

    def test_missing_file_is_empty(self, tmp_path):
        assert load_config("worker", tmp_path / "nope.toml") == {}

    def test_none_values_skipped(self):
        assert "x" not in dumps_toml({"x": None, "y": 1})

    def test_escaping(self, tmp_path):
        path = tmp_path / "cfg.toml"
        save_config("x", {"path": 'a"b\\c'}, path)
        assert load_config("x", path)["path"] == 'a"b\\c'


class TestStrMetric:
    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0

    def test_sort_with_ranks_best_first(self):
        metric = Levenshtein(True)
        items = ["Gruselkabinett", "Sherlock Holmes", "Terra Mortis"]
        ranked = sort_with(metric, items, "grusel")
        assert ranked[0] == "Gruselkabinett"
        ranked = sort_with(metric, items, "sherlok holms")
        assert ranked[0] == "Sherlock Holmes"


def test_progress_bar_two_phase():
    stream = io.StringIO()
    bar = Progress(4, stream=stream, enabled=True)
    bar.max_len = 60
    for _ in bar.wrap(range(4)):
        pass
    out = stream.getvalue()
    assert "4/4" in out
    assert out.endswith("\n")


def test_progress_bar_fancy_arrow():
    stream = io.StringIO()
    bar = Progress(2, fancy=True, stream=stream, enabled=True)
    bar.start()
    bar.finish()
    bar.start()
    bar.finish()
    assert "█" in stream.getvalue()


def test_progress_bar_estimate_overshoot_and_close():
    """Review r3: the total is duration-estimated — overshooting finishes
    must clamp (one newline total, counter never above total), and
    close() terminates an under-run bar exactly once."""
    import io

    from audio_matcher_tpu.utils.progressbar import Progress

    out = io.StringIO()
    bar = Progress(3, stream=out, enabled=True)
    for _ in range(5):
        bar.start()
        bar.finish()
    s = out.getvalue()
    assert s.count("\n") == 1
    assert "3/3" in s and "4/3" not in s and "5/3" not in s
    # under-run + close
    out2 = io.StringIO()
    bar2 = Progress(10, stream=out2, enabled=True)
    bar2.start()
    bar2.finish()
    assert out2.getvalue().count("\n") == 0
    bar2.close()
    bar2.close()  # idempotent
    assert out2.getvalue().count("\n") == 1


def test_config_toml_control_char_round_trip(tmp_path):
    """Review r3: control characters (\\r, ESC) in saved strings must
    escape into valid TOML — an unescaped one makes every later
    load_config raise."""
    import tomllib

    from audio_matcher_tpu.utils.config import dumps_toml

    data = {"path": "C:\\x\r", "esc": "a\x1bb", "nl": "x\ny\tz"}
    assert tomllib.loads(dumps_toml(data)) == data
