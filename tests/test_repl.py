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
    assert parse_command("rename").command == "rename"


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


def test_rename_stub(tmp_path, capsys):
    holder = Holder(_archive_dir(tmp_path))
    holder.work_command(parse_command("rename"))
    assert "coming soon" in capsys.readouterr().out
