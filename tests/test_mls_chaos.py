"""SIGKILL chaos test for the MLS two-stage path (SURVEY §4 implication
(d)): the stage-1 processor (index progress + content-addressed
skip-if-exists JSONs, mls-en-mimi-pretrain/process_shard.py:211-230) and
the stage-2 merger (skip-if-uploaded, stage2/merge_and_upload.py:384-397)
are hard-killed at arbitrary moments, then simply rerun — and the final
stage-1 tree and hub parquets must equal an uninterrupted run's. This
also exercises batch-composition independence: a rerun re-encodes the
remaining entries in different device-batch groupings, and the codes
must still match bit for bit.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from tokenize_audio_tpu.datasets.parquet_utils import read_parquet

CHILD = os.path.join(os.path.dirname(__file__), "mls_chaos_child.py")


def _run_child(out1, prog, hub, work2, kill_after=None, timeout=600):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    p = subprocess.Popen(
        [sys.executable, CHILD, out1, prog, hub, work2],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    if kill_after is None:
        out, _ = p.communicate(timeout=timeout)
        return p.returncode, out
    deadline = time.time() + timeout
    line = ""
    while time.time() < deadline:
        line = p.stdout.readline()
        if "READY" in line or not line:
            break
    # arm the timer from the first evidence of WORK, not from READY —
    # otherwise every kill can land in the post-READY compile window and
    # the resume machinery is never actually exercised
    while time.time() < deadline and p.poll() is None:
        if _stage1_tree(out1):
            break
        time.sleep(0.05)
    time.sleep(kill_after)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=30)
        p.stdout.read()
        return -9, ""
    out = p.stdout.read()
    return p.returncode, line + out


def _stage1_tree(out1):
    """{spk/book/file: entry-json} for every stage-1 output."""
    got = {}
    for root, _, files in os.walk(out1):
        for f in files:
            if f.endswith(".json"):
                rel = os.path.relpath(os.path.join(root, f), out1)
                with open(os.path.join(root, f)) as fh:
                    got[rel] = json.load(fh)
    return got


def _hub_docs(hub):
    base = os.path.join(hub, "data")
    docs = {}
    for f in sorted(os.listdir(base)):
        for d in read_parquet(os.path.join(base, f)):
            docs[f"{f}:{d['id']}"] = d["text"]
    return docs


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path):
    clean = [str(tmp_path / f"clean_{d}") for d in ("s1", "prog", "hub", "w2")]
    rc, out = _run_child(*clean)
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref_tree = _stage1_tree(clean[0])
    assert len(ref_tree) == 40
    ref_docs = _hub_docs(clean[2])
    # 2 batches (speakers_per_batch=1) x 2 books x 2 segments x 2 types
    assert len(ref_docs) == 16

    ch = [str(tmp_path / f"chaos_{d}") for d in ("s1", "prog", "hub", "w2")]
    delays = [0.2, 0.8, 1.6, 3.0]
    kills = midwork_kills = 0
    rc = -1
    for attempt in range(10):
        kill_after = delays[min(attempt, len(delays) - 1)] if attempt < 6 else None
        rc, out = _run_child(*ch, kill_after=kill_after)
        if rc == 0 and "DONE" in out:
            break
        kills += 1
        if _stage1_tree(ch[0]) or os.path.isdir(os.path.join(ch[2], "data")):
            midwork_kills += 1
    assert rc == 0, f"never completed after {kills} kills"
    # a machine fast enough to finish before the first kill timer proves
    # nothing — only require mid-work evidence when kills happened
    assert kills == 0 or midwork_kills >= 1, "kills never landed after work started"

    got_tree = _stage1_tree(ch[0])
    assert set(got_tree) == set(ref_tree)
    for rel in ref_tree:
        assert got_tree[rel] == ref_tree[rel], rel
    assert _hub_docs(ch[2]) == ref_docs
