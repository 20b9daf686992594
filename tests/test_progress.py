"""Progress-store tests.

Parity: the reference's progress unit tests (worker/mod.rs:338-393) against
a fixture equivalent to res/progress.txt, regenerated here (tmp-copy
pattern, SURVEY.md §4).
"""

from audio_matcher_tpu.meta.progress import Progress, State

FIXTURE = (
    "element 1 Loaded\n"
    "element 2 Loaded\n"
    "element 1 Done\n"  # duplicate: later occurrence wins
    "garbage-line-without-state\n"
    "element 3 done\n"  # case-insensitive parse
    "element 4 Named\n"
)


def make(tmp_path):
    p = tmp_path / ".done.txt"
    p.write_text(FIXTURE)
    return Progress(p)


def test_read_dedups_and_tolerates_garbage(tmp_path):
    data = make(tmp_path)
    assert data.content == [
        ("element 2", State.LOADED),
        ("element 1", State.DONE),
        ("element 3", State.DONE),
        ("element 4", State.NAMED),
    ]


def test_get(tmp_path):
    data = make(tmp_path)
    assert data.get("element 1") == State.DONE
    assert data.get("element 2") == State.LOADED
    assert data.get("element 4") == State.NAMED
    assert data.get("element 5") is None


def test_append_last_entry_truncates_in_place(tmp_path):
    data = make(tmp_path)
    data.append("element 4", State.DONE)
    assert data.get("element 4") == State.DONE
    reread = Progress(tmp_path / ".done.txt")
    assert reread.get("element 4") == State.DONE
    assert reread.content[-1] == ("element 4", State.DONE)


def test_append_new_entry(tmp_path):
    data = make(tmp_path)
    data.append("element 9", State.LOADED)
    reread = Progress(tmp_path / ".done.txt")
    assert reread.get("element 9") == State.LOADED


def test_append_middle_entry_moves_to_end(tmp_path):
    data = make(tmp_path)
    data.append("element 2", State.NAMED)
    reread = Progress(tmp_path / ".done.txt")
    assert reread.content[-1] == ("element 2", State.NAMED)
    assert reread.get("element 2") == State.NAMED


def test_state_ordering():
    assert State.LOADED < State.NAMED < State.DONE


def test_truncate_and_delete(tmp_path):
    data = make(tmp_path)
    data.truncate(2)
    reread = Progress(tmp_path / ".done.txt")
    assert len(reread.content) == 2
    reread.delete()
    assert not (tmp_path / ".done.txt").exists()
