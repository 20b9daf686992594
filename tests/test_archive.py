"""Archive model + label grammar tests (parity: archive/data.rs:668-902)."""

import datetime

import pytest

from audio_matcher_tpu.archive.data import (
    Archive,
    Chapter,
    ChapterNumber,
    Series,
    Source,
    build_timelabel_name,
    parse_line,
)
from audio_matcher_tpu.hostio.labels import TimeLabel


class TestParseLine:
    def test_full_match(self):
        got = parse_line("Gruselkabinett 6.2 Das verfluchte Haus")
        assert got == (
            "Gruselkabinett", ChapterNumber(6), 2, "Das verfluchte Haus",
        )

    def test_partial_match(self):
        got = parse_line("Gruselkabinett 6")
        assert got == ("Gruselkabinett", ChapterNumber(6), None, None)

    def test_extra_number_goes_to_chapter(self):
        got = parse_line("Gruselkabinett 6 Multipart 1")
        assert got == ("Gruselkabinett", ChapterNumber(6), None, "Multipart 1")

    def test_markers(self):
        got = parse_line("Serie 3?- Kapitel")
        assert got[1] == ChapterNumber(3, is_maybe=True, is_partial=True)

    def test_no_match(self):
        assert parse_line("nonumberhere") is None


class TestChapterNumber:
    @pytest.mark.parametrize(
        "text,want",
        [
            ("3?", ChapterNumber(3, True, False)),
            ("3", ChapterNumber(3, False, False)),
            ("003?", ChapterNumber(3, True, False)),
            (" 3 ", ChapterNumber(3, False, False)),
            ("003?-", ChapterNumber(3, True, True)),
            (" 3- ", ChapterNumber(3, False, True)),
        ],
    )
    def test_parse(self, text, want):
        assert ChapterNumber.parse(text) == want

    def test_display_formats(self):
        nr = ChapterNumber(3, is_maybe=True)
        assert nr.display(None, False) == "3?"
        assert nr.display((4, True), False) == "0003?"
        nr = ChapterNumber(3)
        assert nr.display((3, False), True) == "  3  "
        assert nr.display((4, True), True) == "0003  "
        nr30 = ChapterNumber(30, is_maybe=True)
        assert nr30.display(None, False) == "30?"
        assert nr30.display((4, False), False) == "  30?"
        assert nr30.display(None, True) == "30? "

    def test_next(self):
        assert ChapterNumber(3, True).next() == ChapterNumber(4, True)


class TestSource:
    def test_roundtrip(self):
        s = Source.parse("abc-2023_07_13")
        assert str(s) == "abc - 2023-07-13"
        assert s.to_file_name() == "abc-2023_07_13"

    def test_from_path(self):
        s = Source.from_path("/89.0rtl-2023_06_17.mp3")
        assert s == Source("89.0rtl", datetime.date(2023, 6, 17))

    def test_errors(self):
        with pytest.raises(Source.InvalidSeparator):
            Source.parse("2023_07_13")
        with pytest.raises(Source.InvalidDate):
            Source.parse("abc-2023-07-13")
        with pytest.raises(Source.InvalidDate):
            Source.parse("abc-2023_07")


def test_build_timelabel_name():
    nr = ChapterNumber(4)
    assert build_timelabel_name("Serie", nr, 2, "Kap") == "Serie 4.2 Kap"
    assert build_timelabel_name("Serie", nr, None, None) == "Serie 4"
    assert build_timelabel_name(None, nr, 1, None) == "4.1"


class TestSeriesDisplay:
    def test_format(self):
        ser = Series("gute show")
        ser.chapters.append(Chapter(ChapterNumber(5, True), "unbekannt"))
        ser.chapters.append(Chapter(ChapterNumber(6), "bekannt"))
        assert (
            ser.display(".", True, False)
            == "gute show\n.5?  - unbekannt []\n.6   - bekannt []"
        )
        assert ser.display(".", True, True) == (
            "gute show\n.1   - []\n.2   - []\n.3   - []\n.4   - []"
            "\n.5?  - unbekannt []\n.6   - bekannt []"
        )


class TestChapterDisplay:
    def test_with_parts(self):
        ch = Chapter(ChapterNumber(15))
        ch.parts[Source.parse("station-2023_1_1")] = 2
        assert ch.display() == "15 - [station - 2023-01-01]"
        ch.parts[Source.parse("station-2023_1_2")] = 2
        assert (
            ch.display()
            == "15 - [station - 2023-01-01, station - 2023-01-02]"
        )

    def test_with_name(self):
        ch = Chapter(ChapterNumber(15), "chapter name")
        assert ch.display() == "15 - chapter name []"


def _make_archive(tmp_path):
    labels = [
        TimeLabel(0, 10, "Serie A 1.1 Auftakt"),
        TimeLabel(10, 20, "Serie A 1.2 Auftakt"),
        TimeLabel(20, 30, "Serie B 4 Anderes"),
        TimeLabel(30, 40, "#kommentar 5"),
        TimeLabel(40, 50, "unparseable"),
    ]
    f = tmp_path / "radio-2023_06_17.txt"
    f.write_text("".join(lb.to_line() + "\n" for lb in labels))
    (tmp_path / "badname.txt").write_text("0\t1\tSerie C 1\n")
    return Archive.read(tmp_path)


def test_archive_read_aggregates(tmp_path):
    archive = _make_archive(tmp_path)
    names = [s.name for s in archive.data]
    assert names == ["Serie A", "Serie B"]  # bad source + comments skipped
    serie_a = archive.data[0]
    assert len(serie_a.chapters) == 1
    src = Source.parse("radio-2023_06_17")
    assert serie_a.chapters[0].parts[src] == 2  # two parts, one source


def test_archive_get_element(tmp_path):
    archive = _make_archive(tmp_path)
    assert archive.get_element("Serie B").name == "Serie B"
    assert archive.get_element("1").name == "Serie A"
    chapter = archive.get_element("2.4")
    assert isinstance(chapter, Chapter)
    assert chapter.nr.nr == 4
    assert archive.get_element("2.9") is None
    assert archive.get_element("2.4", just_series=True).name == "Serie B"


def test_archive_display_index_padding(tmp_path):
    archive = _make_archive(tmp_path)
    out = archive.display("\t", print_index=True)
    assert out.splitlines()[0].startswith("[1] ")


def test_series_display_terminates_with_zero_chapter():
    """Review r3: a chapter numbered 0 (valid per the \\d+ grammar) used
    to spin Series.display forever (the 1-based grid never consumed it)."""
    s = Series("Foo")
    s.chapters.append(Chapter(ChapterNumber(0), "Pilot"))
    s.chapters.append(Chapter(ChapterNumber(2), "Zwei"))
    out = s.display("\t", print_chapters=True, print_missing=True)
    lines = out.splitlines()
    assert lines[0] == "Foo"
    assert any("Pilot" in ln for ln in lines)
    assert any("Zwei" in ln for ln in lines)
    # chapter 1 synthesized as missing between them
    assert sum("<missing>" in ln or "?" not in ln for ln in lines) >= 1


def test_rename_element_rejects_comment_prefix(tmp_path):
    """Review r3: a new series name starting with '#' would turn every
    rewritten label into a comment — the series would silently vanish."""
    from audio_matcher_tpu.hostio.labels import write_labels

    write_labels(
        [TimeLabel(0.0, 1.0, "Serie 1 Kap")],
        tmp_path / "radio-2024_01_06.txt",
    )
    archive = Archive.read(tmp_path)
    with pytest.raises(ValueError, match="comment"):
        archive.rename_element(tmp_path, "Serie", "#archived Serie")
