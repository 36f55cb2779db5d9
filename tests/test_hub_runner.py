"""Hub + runner contracts: idempotence, atomicity, mark-after-upload
ordering, failure isolation, resume (SURVEY §4 implication (d))."""

import json
import os

import pytest

from tokenize_audio_tpu.hub import LocalHub, open_hub
from tokenize_audio_tpu.runner import ShardProgress, ShardRunner, WorkUnit, atomic_write_json, read_json


def _write(tmp_path, name, content="x"):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_local_hub_roundtrip(tmp_path):
    hub = LocalHub(str(tmp_path / "hub"))
    src = _write(tmp_path, "a.txt", "hello")
    assert not hub.exists("data/a.txt")
    hub.upload_file(src, "data/a.txt")
    assert hub.exists("data/a.txt")
    assert hub.list_files("data/") == ["data/a.txt"]
    dst = str(tmp_path / "back.txt")
    hub.download("data/a.txt", dst)
    assert open(dst).read() == "hello"
    with pytest.raises(ValueError, match="escapes"):
        hub.exists("../outside")


def test_open_hub_spec(tmp_path):
    assert isinstance(open_hub(str(tmp_path / "h")), LocalHub)
    assert isinstance(open_hub(f"dir:{tmp_path}/h2"), LocalHub)


def test_atomic_write_and_torn_read(tmp_path):
    p = str(tmp_path / "x.json")
    atomic_write_json(p, {"a": 1})
    assert read_json(p) == {"a": 1}
    with open(p, "w") as f:
        f.write('{"a": 1')  # torn write
    assert read_json(p, default={}) == {}


def test_append_jsonl_and_torn_tail(tmp_path):
    from tokenize_audio_tpu.runner import append_jsonl, read_jsonl

    p = str(tmp_path / "x.jsonl")
    assert read_jsonl(p) is None  # missing -> default
    append_jsonl(p, [{"id": 1}, {"id": 2}])
    append_jsonl(p, [])  # no-op
    append_jsonl(p, [{"id": 3}])
    assert read_jsonl(p) == [{"id": 1}, {"id": 2}, {"id": 3}]
    with open(p, "a") as f:
        f.write('{"id": 4')  # crash mid-append: torn LAST line
    assert read_jsonl(p) == [{"id": 1}, {"id": 2}, {"id": 3}]
    # appending after a torn tail heals it: the fragment is terminated
    # into its own (dropped) line, and the new records survive intact
    append_jsonl(p, [{"id": 5}])
    assert read_jsonl(p) == [{"id": 1}, {"id": 2}, {"id": 3}, {"id": 5}]


def test_progress_ledger(tmp_path):
    prog = ShardProgress(str(tmp_path), "en001")
    prog.mark_failed("u1")
    prog.mark_completed("u2")
    # reload from disk
    prog2 = ShardProgress(str(tmp_path), "en001")
    assert prog2.failed == ["u1"]
    assert prog2.is_completed("u2")
    prog2.mark_completed("u1")  # retry succeeded
    prog3 = ShardProgress(str(tmp_path), "en001")
    assert prog3.failed == []
    assert set(prog3.completed) == {"u1", "u2"}


def test_runner_end_to_end(tmp_path):
    hub = LocalHub(str(tmp_path / "hub"))
    calls = []

    def process(unit):
        calls.append(unit.unit_id)
        local = _write(tmp_path, f"{unit.unit_id}.json", json.dumps({"id": unit.unit_id}))
        return [(local, f"data/{unit.unit_id}.json")]

    units = [WorkUnit(f"u{i}", done_markers=(f"data/u{i}.json",)) for i in range(5)]
    runner = ShardRunner("s0", hub, str(tmp_path / "prog"), process, upload_batch_size=2)
    rep = runner.run(units)
    assert rep.processed == 5 and rep.skipped == 0 and rep.uploaded_files == 5
    assert hub.list_files("data/") == [f"data/u{i}.json" for i in range(5)]
    # local artifacts deleted after upload
    assert not os.path.exists(str(tmp_path / "u0.json"))

    # idempotent rerun: everything skipped, nothing reprocessed
    calls.clear()
    runner2 = ShardRunner("s0", hub, str(tmp_path / "prog"), process)
    rep2 = runner2.run(units)
    assert rep2.skipped == 5 and rep2.processed == 0
    assert calls == []


def test_runner_adopts_hub_state(tmp_path):
    """Fresh progress dir + artifacts already on hub -> skip (hub is the
    durable completion ledger, emilia-mimi/process_shard.py:270-290)."""
    hub = LocalHub(str(tmp_path / "hub"))
    hub.upload_file(_write(tmp_path, "pre.json"), "data/u0.json")

    def process(unit):
        raise AssertionError("must not process a hub-complete unit")

    runner = ShardRunner(
        "s0", hub, str(tmp_path / "prog_fresh"), process
    )
    rep = runner.run([WorkUnit("u0", done_markers=("data/u0.json",))])
    assert rep.skipped == 1


def test_runner_hub_exists_wins_over_retry(tmp_path):
    """A unit marked failed locally whose artifacts ARE on the hub (crash
    between upload and mark-completed) adopts instead of re-encoding —
    hub-exists has precedence over the retry set, like the yodas2 plan."""
    hub = LocalHub(str(tmp_path / "hub"))
    hub.upload_file(_write(tmp_path, "pre.json"), "data/u0.json")
    prog_dir = str(tmp_path / "prog")
    ShardProgress(prog_dir, "s0").mark_failed("u0")

    def process(unit):
        raise AssertionError("must not re-process a hub-complete unit")

    runner = ShardRunner("s0", hub, prog_dir, process)
    rep = runner.run([WorkUnit("u0", done_markers=("data/u0.json",))])
    assert rep.skipped == 1 and rep.failed == 0
    assert runner.progress.is_completed("u0")


def test_runner_failure_isolation_and_resume(tmp_path):
    hub = LocalHub(str(tmp_path / "hub"))
    attempts = {"u1": 0}

    def process(unit):
        if unit.unit_id == "u1":
            attempts["u1"] += 1
            if attempts["u1"] == 1:
                raise RuntimeError("boom")
        local = _write(tmp_path, f"{unit.unit_id}.out", "ok")
        return [(local, f"data/{unit.unit_id}.out")]

    units = [WorkUnit(f"u{i}", done_markers=(f"data/u{i}.out",)) for i in range(3)]
    runner = ShardRunner("s1", hub, str(tmp_path / "prog"), process)
    rep = runner.run(units)
    assert rep.failed == 1 and rep.processed == 2

    # restart: failed unit is retried, completed ones skipped
    runner2 = ShardRunner("s1", hub, str(tmp_path / "prog"), process)
    rep2 = runner2.run(units)
    assert rep2.processed == 1 and rep2.skipped == 2
    assert hub.exists("data/u1.out")


def test_runner_aborts_on_consecutive_failures(tmp_path):
    hub = LocalHub(str(tmp_path / "hub"))

    def process(unit):
        raise RuntimeError("always")

    runner = ShardRunner(
        "s2", hub, str(tmp_path / "prog"), process, max_consecutive_failures=3
    )
    units = [WorkUnit(f"u{i}") for i in range(10)]
    with pytest.raises(RuntimeError, match="consecutive"):
        runner.run(units)
