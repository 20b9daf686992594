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
