"""FancyNamer in-loop commands: join / resize / reload (worker/mod.rs:1068-1118)."""

import pytest

from audio_matcher_tpu.cli.common import Inputs
from audio_matcher_tpu.meta.index import MultiIndex
from audio_matcher_tpu.worker.rename import FancyNamer


@pytest.fixture
def setup(tmp_path, monkeypatch):
    from audio_matcher_tpu.worker.audacity import AudacityApi
    from audio_matcher_tpu.worker.fake_audacity import FakeAudacity

    pipe_dir = tmp_path / "pipes"
    monkeypatch.setenv("AUDACITY_PIPE_DIR", str(pipe_dir))
    server = FakeAudacity(pipe_dir)
    api = AudacityApi(timeout=5)
    api.import_audio("/tmp/ep.mp3")  # track 0 = wave, track 1 = labels
    api.write_assume_empty("NewLabelTrack:")
    for start, end in [(0.0, 10.0), (12.0, 20.0), (22.0, 30.0)]:
        api.select_time(start, end)
        api.write_assume_empty("AddLabel:")
    d = tmp_path / "Serie"
    d.mkdir()
    (d / "index.txt").write_text("Eins\nZwei\nDrei\n")
    m_index = MultiIndex(tmp_path)
    yield api, m_index, server
    api.close()
    server.stop()


def test_join_merges_into_predecessor(setup):
    api, m_index, _ = setup
    inputs = Inputs(script=["Serie 1", "> join", "Serie 2", ""])
    namer = FancyNamer(api, m_index, inputs)
    namer.rename()
    labels = api.get_label_info()[1]
    # label 2 was joined into label 1: two labels remain
    assert len(labels) == 2
    assert labels[0].name == "Serie 1.1 Eins"
    assert labels[0].end == 20.0  # extended over the joined label
    assert labels[1].name == "Serie 2.1 Zwei"


def test_resize_restarts_numbering(setup):
    api, m_index, _ = setup
    inputs = Inputs(
        script=["Serie 1", "Serie 1", "> resize",
                "Serie 2", "Serie 2", "Serie 2", ""]
    )
    namer = FancyNamer(api, m_index, inputs)
    namer.rename()
    labels = api.get_label_info()[1]
    assert [lb.name for lb in labels] == [
        "Serie 2.1 Zwei", "Serie 2.2 Zwei", "Serie 2.3 Zwei",
    ]


def test_unknown_command_reprompts(setup, capsys):
    api, m_index, _ = setup
    inputs = Inputs(
        script=["> frobnicate", "Serie 1", "Serie 1", "Serie 1", ""]
    )
    FancyNamer(api, m_index, inputs).rename()
    assert "unknown command" in capsys.readouterr().out
    labels = api.get_label_info()[1]
    assert labels[0].name == "Serie 1.1 Eins"


def test_reload_index_picks_up_new_series(setup, tmp_path):
    api, m_index, _ = setup
    d = tmp_path / "Neu"
    d.mkdir()
    (d / "index.txt").write_text("Anders\n")
    inputs = Inputs(
        script=["> reload_index", "Neu 1", "Neu 1", "Neu 1", ""]
    )
    FancyNamer(api, m_index, inputs).rename()
    labels = api.get_label_info()[1]
    assert labels[0].name == "Neu 1.1 Anders"


def test_join_targets_real_label_track(tmp_path, monkeypatch):
    """Review r3: `join` must SplitDelete on the actual label track —
    with two wave tracks the label track is #2, and hardcoding track 1
    would cut audio instead of removing the label."""
    from audio_matcher_tpu.worker.audacity import AudacityApi
    from audio_matcher_tpu.worker.fake_audacity import FakeAudacity

    pipe_dir = tmp_path / "pipes2"
    monkeypatch.setenv("AUDACITY_PIPE_DIR", str(pipe_dir))
    server = FakeAudacity(pipe_dir)
    api = AudacityApi(timeout=5)
    api.import_audio("/tmp/a.mp3")
    api.import_audio("/tmp/b.mp3")  # label track will be #2
    api.write_assume_empty("NewLabelTrack:")
    for start, end in [(0.0, 10.0), (12.0, 20.0)]:
        api.select_time(start, end)
        api.write_assume_empty("AddLabel:")
    d = tmp_path / "Serie"
    d.mkdir()
    (d / "index.txt").write_text("Eins\n")
    inputs = Inputs(script=["Serie 1", "> join", ""])
    namer = FancyNamer(api, MultiIndex(tmp_path), inputs)
    namer.rename()
    labels = api.get_label_info()[2]
    assert len(labels) == 1
    assert labels[0].end == 20.0
    # the local copy followed the extension (next gap zoom uses it)
    assert namer.labels[0].end == 20.0
    api.close()
    server.stop()
