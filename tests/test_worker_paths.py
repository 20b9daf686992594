"""Worker state-machine branch coverage: skip flags + resume states."""

import pytest

from audio_matcher_tpu.cli.common import Inputs
from audio_matcher_tpu.hostio.labels import TimeLabel, write_labels
from audio_matcher_tpu.meta.progress import Progress, State
from audio_matcher_tpu.worker.pipeline import WorkerArgs, run_worker


@pytest.fixture
def fake_audacity(tmp_path, monkeypatch):
    from audio_matcher_tpu.worker.fake_audacity import FakeAudacity

    pipe_dir = tmp_path / "pipes"
    monkeypatch.setenv("AUDACITY_PIPE_DIR", str(pipe_dir))
    server = FakeAudacity(pipe_dir)
    yield server
    server.stop()


@pytest.fixture
def episode(tmp_path):
    work = tmp_path / "work"
    work.mkdir()
    audio = work / "radio-2024_02_03.mp3"
    audio.write_bytes(b"\xff\xfbdata")
    write_labels(
        [TimeLabel(0.0, 10.0, "Serie 1.1 Kap"),
         TimeLabel(20.0, 30.0, "Serie 1.2 Kap")],
        audio.with_suffix(".txt"),
    )
    return audio


def test_skip_load_requires_single_audio(episode):
    args = WorkerArgs(audio_paths=[episode, episode], skip_load=True)
    with pytest.raises(ValueError):
        run_worker(args, inputs=Inputs(script=[]))


def test_named_state_skips_renaming(fake_audacity, episode):
    # state Named → jumps straight to merge/export. Resume assumes the
    # Audacity session still holds the project (as in the reference), so
    # preload the renamed labels into the fake.
    from audio_matcher_tpu.worker.audacity import AudacityApi
    from audio_matcher_tpu.worker.pipeline import prepare_project

    pre = AudacityApi(timeout=5)
    prepare_project(pre, episode, episode.with_suffix(".txt"))
    pre.close()
    Progress(episode.parent / ".done.txt").append(episode.name, State.NAMED)
    preload_len = len(fake_audacity.command_log)
    args = WorkerArgs(audio_paths=[episode], skip_load=True)
    run_worker(args, inputs=Inputs(script=[""]))
    cmds = fake_audacity.command_log[preload_len:]
    # the renaming phase (which zooms per label gap) never ran; only the
    # merge phase issued commands
    assert not any(c.startswith("ZoomSel") for c in cmds)
    assert any(c.startswith("RemoveTracks") for c in cmds)  # merge ran
    assert Progress(episode.parent / ".done.txt").get(episode.name) == State.DONE


def test_skip_name_flag(fake_audacity, episode):
    args = WorkerArgs(audio_paths=[episode], skip_name=True)
    run_worker(args, inputs=Inputs(script=[""]))
    assert (
        Progress(episode.parent / ".done.txt").get(episode.name) == State.DONE
    )
    # merge still ran: a merged label track was created
    assert any("NewLabelTrack" in c for c in fake_audacity.command_log)


def test_exit_sent_for_last_file(fake_audacity, episode):
    Progress(episode.parent / ".done.txt").append(episode.name, State.DONE)
    run_worker(
        WorkerArgs(audio_paths=[episode]), inputs=Inputs(script=[])
    )
    assert fake_audacity.command_log[-1].startswith("Exit")
