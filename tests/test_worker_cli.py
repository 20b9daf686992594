"""audio-worker CLI arg surface + config consent (worker/args.rs parity)."""

from pathlib import Path

from audio_matcher_tpu.cli import worker_cli
from audio_matcher_tpu.utils import config as cfgmod


def test_parser_surface():
    ns = worker_cli.build_parser().parse_args(
        [
            "a.mp3", "b.mp3",
            "--index-folder", "/idx",
            "--timeout", "3h5m17s",
            "--export-ext", "opus",
            "--skip-load", "--skip-name", "--dry-run", "-y",
        ]
    )
    assert [p.name for p in ns.audio_paths] == ["a.mp3", "b.mp3"]
    assert ns.index_folder == Path("/idx")
    assert ns.timeout == 3 * 3600 + 5 * 60 + 17
    assert ns.export_ext == "opus"
    assert ns.skip_load and ns.skip_name and ns.dry_run and ns.yes


def test_config_consent_saves_index_folder(tmp_path, monkeypatch):
    cfg_path = tmp_path / "worker.toml"
    # -y consents to persisting the index folder; run_worker fails fast on
    # the missing audio file, which is fine — we only check the config
    rc = worker_cli.main(
        [
            str(tmp_path / "missing.mp3"),
            "--index-folder", str(tmp_path),
            "--config", str(cfg_path),
            "-y", "--silent",
        ]
    )
    del rc
    saved = cfgmod.load_config("worker", cfg_path)
    assert saved["index_folder"] == str(tmp_path)
    assert saved["genre"] == "Hörbuch"


def test_config_no_consent(tmp_path):
    cfg_path = tmp_path / "worker.toml"
    worker_cli.main(
        [
            str(tmp_path / "missing.mp3"),
            "--index-folder", str(tmp_path),
            "--config", str(cfg_path),
            "-n", "--silent",
        ]
    )
    assert not cfg_path.exists()
