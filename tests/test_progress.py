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


# ---------------------------------------------------------------------------
# model-based fuzz: the append path has three distinct fast paths (append
# one line / truncate + rewrite the last line / move-to-end full rewrite)
# plus deferred saves — random op sequences must keep the FILE equal to a
# plain ordered-list model


def _model_append(model, name, state):
    idx = next((i for i, (n, _) in enumerate(model) if n == name), None)
    if idx is not None:
        del model[idx]
    model.append((name, state))


def test_progress_fuzz_matches_model(tmp_path):
    import random

    rng = random.Random(20260817)
    names = ["ep one", "ep two", "n3", "ümlaut ép", "x(1)", "l" + "a" * 50]
    states = list(State)

    # phase A: append/truncate only — every op persists immediately, so a
    # fresh reader must agree WITHOUT an intervening save()
    path = tmp_path / "a.done.txt"
    p = Progress(path)
    model = []
    for step in range(300):
        if rng.random() < 0.1:
            k = rng.randrange(0, len(model) + 1)
            p.truncate(k)
            del model[k:]
        else:
            name, state = rng.choice(names), rng.choice(states)
            p.append(name, state)
            _model_append(model, name, state)
        if rng.random() < 0.15:
            p = Progress(path)  # fresh read of the on-disk bytes
            assert p.content == model, step
    assert Progress(path).content == model

    # phase B: mixed set/remove (deferred) + append/truncate; compare the
    # in-memory view continuously and the disk view after save()
    path = tmp_path / "b.done.txt"
    p = Progress(path)
    model = []
    for step in range(300):
        r = rng.random()
        name, state = rng.choice(names), rng.choice(states)
        if r < 0.35:
            p.append(name, state)
            _model_append(model, name, state)
        elif r < 0.6:
            p.set(name, state)
            idx = next(
                (i for i, (n, _) in enumerate(model) if n == name), None
            )
            if idx is None:
                model.append((name, state))
            else:
                model[idx] = (name, state)
        elif r < 0.8:
            got = p.remove(name)
            idx = next(
                (i for i, (n, _) in enumerate(model) if n == name), None
            )
            assert (got is None) == (idx is None), step
            if idx is not None:
                assert got == model[idx]
                del model[idx]
        else:
            k = rng.randrange(0, len(model) + 1)
            p.truncate(k)
            del model[k:]
        assert p.content == model, step
        assert p.get(name) == next(
            (s for n, s in model if n == name), None
        ), step
        if rng.random() < 0.12:
            p.save()
            p = Progress(path)
            assert p.content == model, step


def test_newline_and_empty_names_survive_reload(tmp_path):
    """Review r3: the store is line-oriented — names with newlines (legal
    in filenames) must not split into bogus entries on reload."""
    p = tmp_path / ".done.txt"
    pr = Progress(p)
    pr.append("ep\n01.mp3", State.DONE)
    pr.append("", State.LOADED)
    back = Progress(p)
    assert back.get("ep\n01.mp3") == State.DONE  # same key, normalized
    assert back.get("") == State.LOADED
    assert len(back.content) == 2
