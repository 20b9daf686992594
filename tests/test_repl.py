"""Archive REPL command parsing + execution (parity: archive/mod.rs)."""

import pytest

from audio_matcher_tpu.archive.repl import (
    CommandError,
    Holder,
    parse_command,
)
from audio_matcher_tpu.hostio.labels import TimeLabel, write_labels


def test_parse_commands():
    assert parse_command("exit").command == "exit"
    ns = parse_command("list")
    assert (ns.command, ns.indent, ns.print_all, ns.print_missing) == (
        "list", "\t", False, False,
    )
    ns = parse_command('list "  " -c -m')
    assert (ns.indent, ns.print_all, ns.print_missing) == ("  ", True, True)
    ns = parse_command("reload /some/path")
    assert str(ns.path) == "/some/path"
    ns = parse_command('rename "Serie" "Die Serie" -n')
    assert (ns.command, ns.which, ns.new_name, ns.dry_run) == (
        "rename", "Serie", "Die Serie", True,
    )
    with pytest.raises(CommandError):
        parse_command("rename")  # selector + new name required


def test_parse_rejects_unknown():
    with pytest.raises(CommandError):
        parse_command("frobnicate")


def _archive_dir(tmp_path):
    write_labels(
        [TimeLabel(0, 1, "Serie 1.1 Kap"), TimeLabel(1, 2, "Serie 2.1 Zwei")],
        tmp_path / "radio-2024_01_06.txt",
    )
    return tmp_path


def test_list_command_prints(tmp_path, capsys):
    holder = Holder(_archive_dir(tmp_path))
    assert holder.work_command(parse_command("list -c")) is True
    out = capsys.readouterr().out
    assert "Serie" in out
    assert "1 - Kap" in out


def test_exit_stops_loop(tmp_path):
    holder = Holder(_archive_dir(tmp_path))
    assert holder.work_command(parse_command("exit")) is False


def test_reload_rereads(tmp_path, capsys):
    holder = Holder(_archive_dir(tmp_path))
    write_labels(
        [TimeLabel(0, 1, "Neu 1 X")], tmp_path / "radio-2024_01_07.txt"
    )
    holder.work_command(parse_command("reload"))
    holder.work_command(parse_command("list"))
    assert "Neu" in capsys.readouterr().out


def _multi_archive(tmp_path):
    write_labels(
        [
            TimeLabel(0, 1, "Serie 1.1 Kap"),
            TimeLabel(1, 2, "Andere 3 Drittes"),
            TimeLabel(2, 3, "# skipped 1"),
            TimeLabel(3, 4, "not parseable"),
        ],
        tmp_path / "radio-2024_01_06.txt",
    )
    write_labels(
        [TimeLabel(0, 1, "Serie 2? Zwei")],
        tmp_path / "radio-2024_01_13.txt",
    )
    # a non-archive txt must never be touched
    (tmp_path / "notes.txt").write_text("keep me\n")
    return tmp_path


def test_rename_series_across_files(tmp_path, capsys):
    """rename is real here (the reference stubs it): series rename rewrites
    every matching label on disk, leaves skipped/unparsable labels and
    non-archive files alone, and reloads the archive."""
    from audio_matcher_tpu.hostio.labels import read_labels

    holder = Holder(_multi_archive(tmp_path))
    assert holder.work_command(
        parse_command('rename "Serie" "Die Serie"')
    ) is True
    assert "renamed 2 label(s) across 2 file(s)" in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names == [
        "Die Serie 1.1 Kap", "Andere 3 Drittes", "# skipped 1",
        "not parseable",
    ]
    names2 = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_13.txt")]
    assert names2 == ["Die Serie 2? Zwei"]  # ?-marker survives
    assert (tmp_path / "notes.txt").read_text() == "keep me\n"
    # the in-memory archive reloaded under the new name
    assert holder.archive.get_series_by_name("Die Serie") is not None
    assert holder.archive.get_series_by_name("Serie") is None


def test_rename_chapter_title_and_dry_run(tmp_path, capsys):
    from audio_matcher_tpu.hostio.labels import read_labels

    holder = Holder(_multi_archive(tmp_path))
    # numeric selector: series 2 = "Serie" (sorted: Andere, Serie);
    # chapter 1 gets a new title — dry-run first changes nothing
    assert holder.work_command(parse_command('rename 2.1 "Kapitel" -n'))
    assert "would rename 1 label(s)" in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names[0] == "Serie 1.1 Kap"
    assert holder.work_command(parse_command('rename 2.1 "Kapitel"'))
    assert "renamed 1 label(s) across 1 file(s)" in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names[0] == "Serie 1.1 Kapitel"


def test_rename_unknown_selector_warns(tmp_path, capsys, caplog):
    holder = Holder(_multi_archive(tmp_path))
    assert holder.work_command(parse_command('rename "Nope" "X"')) is True
    # nothing written, loop continues
    assert "renamed" not in capsys.readouterr().out


def test_rename_exact_name_beats_numeric_selector(tmp_path, capsys):
    """A series literally named "7" resolves by exact name before the
    numeric "series index 7" interpretation kicks in."""
    from audio_matcher_tpu.hostio.labels import read_labels

    write_labels(
        [TimeLabel(0, 1, "7 1 Eins")], tmp_path / "radio-2024_01_06.txt"
    )
    holder = Holder(tmp_path)
    assert holder.archive.get_series_by_name("7") is not None
    assert holder.work_command(parse_command('rename "7" "Sieben"'))
    assert "renamed 1 label(s) across 1 file(s)" in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names == ["Sieben 1 Eins"]


def test_rename_rejects_grammar_breaking_series_name(tmp_path, capsys, caplog):
    """A new series name the label grammar would mis-split (trailing
    digits swallow into the chapter number) is refused before any file is
    touched."""
    import logging

    from audio_matcher_tpu.hostio.labels import read_labels

    holder = Holder(_multi_archive(tmp_path))
    with caplog.at_level(logging.WARNING, logger="audio_matcher.archive"):
        assert holder.work_command(parse_command('rename "Serie" "Neu 3"'))
    assert "does not survive the label grammar" in caplog.text
    assert "renamed" not in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names[0] == "Serie 1.1 Kap"


def test_rename_rejects_grammar_breaking_chapter_title(tmp_path, caplog):
    import logging

    from audio_matcher_tpu.hostio.labels import read_labels

    holder = Holder(_multi_archive(tmp_path))
    # an empty title renders "Serie 1 " which the grammar cannot re-parse
    with caplog.at_level(logging.WARNING, logger="audio_matcher.archive"):
        assert holder.work_command(parse_command('rename 2.1 ""'))
    assert "does not survive the label grammar" in caplog.text
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names[0] == "Serie 1.1 Kap"


def test_rename_chapter_marker_variants_stay_distinct(tmp_path, capsys):
    """"3" and "3?" are distinct chapters in the tree; re-titling the
    plain one must not touch the ?-marked twin."""
    from audio_matcher_tpu.hostio.labels import read_labels

    write_labels(
        [TimeLabel(0, 1, "S 3 A"), TimeLabel(1, 2, "S 3? B")],
        tmp_path / "radio-2024_01_06.txt",
    )
    holder = Holder(tmp_path)
    # selector 1.3 resolves to the plain chapter 3 (sorts before 3?)
    assert holder.work_command(parse_command('rename 1.3 "Neu"'))
    assert "renamed 1 label(s) across 1 file(s)" in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names == ["S 3 Neu", "S 3? B"]


def test_rename_rejects_digit_bearing_nonmatching_name(tmp_path, capsys):
    """An identifier with digits that is neither an exact series name nor
    a pure numeric selector must NOT fall through to get_element's lax
    digit search (which would rewrite an unrelated series on disk)."""
    from audio_matcher_tpu.hostio.labels import read_labels

    labels = [
        TimeLabel(i, i + 1, f"S{chr(ord('a') + i)} 1 Kap") for i in range(8)
    ]
    write_labels(labels, tmp_path / "radio-2024_01_06.txt")
    holder = Holder(tmp_path)
    assert len(holder.archive.data) == 8
    # "folge 7" contains a 7 but names nothing: refuse, don't touch #7
    assert holder.work_command(parse_command('rename "folge 7" "X"'))
    assert "renamed" not in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names == [lb.name for lb in labels]


def test_rename_marker_selector_addresses_variant(tmp_path, capsys):
    """"s.c?" / "s.c-" select exactly the marked chapter variant; a bare
    "s.c" prefers the unmarked one."""
    from audio_matcher_tpu.hostio.labels import read_labels

    write_labels(
        [
            TimeLabel(0, 1, "S 3 A"),
            TimeLabel(1, 2, "S 3? B"),
            TimeLabel(2, 3, "S 3- C"),
        ],
        tmp_path / "radio-2024_01_06.txt",
    )
    holder = Holder(tmp_path)
    assert holder.work_command(parse_command('rename "1.3?" "Neu"'))
    assert "renamed 1 label(s)" in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names == ["S 3 A", "S 3? Neu", "S 3- C"]
    assert holder.work_command(parse_command('rename "1.3-" "Drei"'))
    capsys.readouterr()
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names == ["S 3 A", "S 3? Neu", "S 3- Drei"]


def test_rename_bare_selector_falls_back_to_marked_variant(tmp_path, capsys):
    from audio_matcher_tpu.hostio.labels import read_labels

    write_labels(
        [TimeLabel(0, 1, "S 3? B")], tmp_path / "radio-2024_01_06.txt"
    )
    holder = Holder(tmp_path)
    assert holder.work_command(parse_command('rename 1.3 "Neu"'))
    assert "renamed 1 label(s)" in capsys.readouterr().out
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names == ["S 3? Neu"]


def test_rename_write_failure_skips_file(tmp_path, capsys, caplog, monkeypatch):
    """A file that fails to write is logged and skipped; the rest of the
    archive still renames, and counts reflect only what was written."""
    import logging

    import audio_matcher_tpu.hostio.labels as labels_mod
    from audio_matcher_tpu.hostio.labels import read_labels

    holder = Holder(_multi_archive(tmp_path))
    real = labels_mod.write_labels
    bad = str(tmp_path / "radio-2024_01_06.txt")

    def flaky(labels, path, *args, **kwargs):
        if str(path) == bad:
            raise OSError("disk full")
        return real(labels, path, *args, **kwargs)

    monkeypatch.setattr(labels_mod, "write_labels", flaky)
    with caplog.at_level(logging.WARNING, logger="audio_matcher.archive"):
        assert holder.work_command(parse_command('rename "Serie" "Neu"'))
    assert "failed to write" in caplog.text
    assert "renamed 1 label(s) across 1 file(s)" in capsys.readouterr().out
    # the failing file kept its old labels; the other file renamed
    names = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_06.txt")]
    assert names[0] == "Serie 1.1 Kap"
    names2 = [lb.name for lb in read_labels(tmp_path / "radio-2024_01_13.txt")]
    assert names2 == ["Neu 2? Zwei"]


def test_reload_adopts_new_path_for_rename(tmp_path, capsys):
    """reload <path> must re-point the holder so later rename writes land
    in the directory the user is actually looking at."""
    from audio_matcher_tpu.hostio.labels import read_labels

    dir_a = tmp_path / "a"
    dir_b = tmp_path / "b"
    dir_a.mkdir()
    dir_b.mkdir()
    write_labels([TimeLabel(0, 1, "Alt 1 X")], dir_a / "radio-2024_01_06.txt")
    write_labels([TimeLabel(0, 1, "Beta 1 Y")], dir_b / "radio-2024_01_07.txt")
    holder = Holder(dir_a)
    holder.work_command(parse_command(f"reload {dir_b}"))
    assert holder.path == dir_b
    assert holder.work_command(parse_command('rename "Beta" "Neu"'))
    assert "renamed 1 label(s)" in capsys.readouterr().out
    names_a = [lb.name for lb in read_labels(dir_a / "radio-2024_01_06.txt")]
    assert names_a == ["Alt 1 X"]  # untouched
    names_b = [lb.name for lb in read_labels(dir_b / "radio-2024_01_07.txt")]
    assert names_b == ["Neu 1 Y"]


def test_repl_unmatched_quote_warns_not_crashes(tmp_path, caplog):
    """Review r3: shlex's ValueError (unmatched quote) must surface as a
    warning, not kill the REPL."""
    import logging as _logging

    from audio_matcher_tpu.archive.repl import CommandError, parse_command

    with pytest.raises(CommandError, match="quotation"):
        parse_command('rename "My Series 7')


def test_archive_cli_dry_run_blocks_writes(tmp_path, monkeypatch, capsys):
    """Review r3: the top-level --dry-run must gate the config save and
    force REPL renames into dry-run."""
    from audio_matcher_tpu.cli import archive_cli
    from audio_matcher_tpu.hostio.labels import read_labels, write_labels
    from audio_matcher_tpu.hostio.labels import TimeLabel

    write_labels(
        [TimeLabel(0.0, 1.0, "Serie 1 Kap")],
        tmp_path / "radio-2024_01_06.txt",
    )
    cfgfile = tmp_path / "cfg.toml"
    monkeypatch.setattr(
        "sys.stdin", __import__("io").StringIO('rename "Serie" "Neu"\nexit\n')
    )
    rc = archive_cli.main(
        [str(tmp_path), "-i", "--dry-run", "--config", str(cfgfile),
         "-y", "--silent"]
    )
    assert rc == 0
    assert "would rename" in capsys.readouterr().out
    labels = read_labels(tmp_path / "radio-2024_01_06.txt")
    assert labels[0].name == "Serie 1 Kap"  # untouched
    assert not cfgfile.exists()  # config save skipped
