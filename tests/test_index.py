"""Index/MultiIndex tests (parity: worker/index.rs:527-829 test suite)."""

import pytest

from audio_matcher_tpu.meta.index import (
    ChapterEntry,
    Index,
    MultiIndex,
    NoIndexFile,
    ParseError,
    SeriesNotFound,
    split_pattern,
)


def test_multipattern():
    assert split_pattern("path/*.{toml, txt}") == ["path/*.toml", "path/*.txt"]
    assert split_pattern("plain/*.txt") == ["plain/*.txt"]


def test_filter_comments():
    data = ["first element", "second element", "# some comment", "third element"]
    index = Index.from_lines(data, "not used", "no")
    assert index.get(1).title == "first element"
    assert index.get(2).title == "second element"
    assert index.get(3).title == "third element"
    assert index.try_get(4) is None


def test_detect_comments_with_whitespace():
    data = [
        "# some comment",
        "first element",
        "     # comment with some spaces",
        "\t# comment with tabs",
        "   \t  \t # comment with spaces and tabs",
        "second element - with author",
    ]
    assert Index.from_lines(data, "not used", "try").main_len() == 2


def test_rename_empty():
    data = ["", "first element", "", "# some comment", ""]
    index = Index.from_lines(data, "series", "no")
    assert index.get(1).title == "series 1"
    assert index.get(2).title == "first element"
    assert index.get(3).title == "series 3"
    assert index.get(4).title == "series 4"
    assert index.try_get(5) is None


def test_read_with_artist():
    data = ["first element - author 1", "second element - author 2",
            "# some comment", "third element - some extra - author 1"]
    index = Index.from_lines(data, "not used", "yes")
    assert index.get(1) == ChapterEntry("first element", "author 1")
    assert index.get(2) == ChapterEntry("second element", "author 2")
    # rsplit: only the last " - " separates the artist
    assert index.get(3) == ChapterEntry("third element - some extra", "author 1")


def test_fail_to_read_without_artist():
    data = ["# some comment", "first element", "second element - with author"]
    with pytest.raises(ParseError):
        Index.from_lines(data, "not used", "yes")


def test_toml_with_one_artist():
    index = Index.from_toml_str(
        """
        artist = "artist"
        chapters.main = [
            "chapter 1", "chapter 2", ["chapter 3", "other artist"]
        ]
        """,
        "not used",
    )
    assert index.get(1) == ChapterEntry("chapter 1", "artist")
    assert index.get(2) == ChapterEntry("chapter 2", "artist")
    assert index.get(3) == ChapterEntry("chapter 3", "other artist")
    assert index.try_get(4) is None


def test_toml_dates():
    index = Index.from_toml_str(
        """
        artist = "artist"
        release = 2000
        chapters.main = [
            "chapter 1",
            ["chapter 2", 2001],
            ["chapter 3", 2002-02-02],
            ["chapter 4", "other artist", 2003-03-03],
        ]
        """,
        "not used",
    )
    assert index.get(1).release_year() == 2000
    assert index.get(2).release_year() == 2001
    assert index.get(3).release_year() == 2002
    assert index.get(4).release_year() == 2003
    assert index.get(4).artist == "other artist"


def test_toml_subseries_flattened(tmp_path):
    (tmp_path / "Serie").mkdir()
    (tmp_path / "Serie" / "index.toml").write_text(
        """
        artist = "main artist"
        [[subseries]]
        name = "Staffel 1"
        chapters = ["a", "b"]
        [[subseries]]
        name = "Staffel 2"
        chapters = [["c", "guest"]]
        """
    )
    m = MultiIndex(tmp_path)
    assert m.get_possible() == ["Serie: Staffel 1", "Serie: Staffel 2"]
    idx = m.get_known_index("Serie: Staffel 1")
    assert idx.get(2) == ChapterEntry("b", "main artist")
    idx2 = m.get_known_index("Serie: Staffel 2")
    assert idx2.get(1) == ChapterEntry("c", "guest")


def test_multiindex_naming_and_precedence(tmp_path):
    # standalone txt keeps its filename; index.toml takes the directory name
    (tmp_path / "Krimis.txt").write_text("fall 1\nfall 2\n")
    sdir = tmp_path / "SciFi"
    sdir.mkdir()
    (sdir / "index.toml").write_text('chapters.main = ["ep 1"]\n')
    (sdir / "index.txt").write_text("shadowed\n")
    m = MultiIndex(tmp_path)
    assert set(m.get_possible()) >= {"Krimis", "SciFi"}
    assert m.get_index("Krimis").main_len() == 2
    assert m.get_index("SciFi").get(1).title == "ep 1"


def test_try_read_index_precedence(tmp_path):
    base = tmp_path / "Serie"
    base.mkdir()
    (base / "index.txt").write_text("only txt\n")
    idx = Index.try_read_index(tmp_path, "Serie")
    assert idx.get(1).title == "only txt"
    (base / "index_full.txt").write_text("full - author\n")
    idx = Index.try_read_index(tmp_path, "Serie")
    assert idx.get(1) == ChapterEntry("full", "author")
    (base / "index.toml").write_text('chapters.main = ["toml wins"]\n')
    idx = Index.try_read_index(tmp_path, "Serie")
    assert idx.get(1).title == "toml wins"


def test_missing_series_and_index(tmp_path):
    with pytest.raises(SeriesNotFound):
        Index.try_read_index(tmp_path, "nope")
    (tmp_path / "Empty").mkdir()
    with pytest.raises(NoIndexFile):
        Index.try_read_index(tmp_path, "Empty")


def test_multiindex_full_txt_precedence_deterministic(tmp_path):
    """Review r3: a dir holding BOTH index_full.txt and index.txt must
    resolve full→txt regardless of filesystem glob order, with the same
    parser modes as try_read_index (an index.txt title containing ' - '
    stays one title)."""
    d = tmp_path / "Serie"
    d.mkdir()
    (d / "index_full.txt").write_text("Eins - Wer\n")
    (d / "index.txt").write_text("Two - Face\n")
    m = MultiIndex(tmp_path)
    idx = m.get_index("Serie")
    entry = idx.try_get(1)
    assert (entry.title, entry.artist) == ("Eins", "Wer")
    # index.txt alone: 'no' parser keeps " - " inside the title
    (d / "index_full.txt").unlink()
    m.reload()
    entry = m.get_index("Serie").try_get(1)
    assert (entry.title, entry.artist) == ("Two - Face", None)


def test_multiindex_lazy_subseries_no_cache_pollution(tmp_path):
    """Review r3: a cache-miss read of a subseries-layout index must not
    cache the raw container under the main name (its try_get can't serve
    chapters) — the flattened 'main: sub' keys register instead."""
    d = tmp_path / "Main"
    d.mkdir()
    (d / "index.toml").write_text(
        '[[subseries]]\nname = "Sub"\nchapters = ["Eins"]\n'
    )
    m = MultiIndex(tmp_path / "empty_does_not_exist_yet")
    (tmp_path / "empty_does_not_exist_yet").mkdir(exist_ok=True)
    m.folder = tmp_path  # cold cache, then lazy read of Main
    raw = m.get_index("Main")
    assert raw.subseries is not None
    assert not m.has_index("Main")  # container NOT cached
    assert m.has_index("Main: Sub")
    assert m.get_index("Main: Sub").try_get(1).title == "Eins"
