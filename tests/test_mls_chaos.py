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

import pytest

from tests.chaos_utils import kill_anywhere, run_child
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet

CHILD = os.path.join(os.path.dirname(__file__), "mls_chaos_child.py")


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


def _stage1_any(out1):
    """Cheap work-evidence probe: ANY stage-1 json exists. run_child polls
    evidence every 20 ms — walking + json-parsing the whole tree there
    (O(published data) per tick) would steal the CPU the child needs and
    skew kill timing (see test_corpus_chaos.py's cheap-evidence note)."""
    for root, _, files in os.walk(out1):
        if any(f.endswith(".json") for f in files):
            return True
    return False


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
    rc, out, _ = run_child([CHILD, *clean])
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref_tree = _stage1_tree(clean[0])
    assert len(ref_tree) == 40
    ref_docs = _hub_docs(clean[2])
    # 2 batches (speakers_per_batch=1) x 2 books x 2 segments x 2 types
    assert len(ref_docs) == 16

    ch = [str(tmp_path / f"chaos_{d}") for d in ("s1", "prog", "hub", "w2")]
    kill_anywhere(
        lambda k: run_child([CHILD, *ch], kill_after=k, evidence=lambda: _stage1_any(ch[0])),
        midwork=lambda: _stage1_any(ch[0])
        or os.path.isdir(os.path.join(ch[2], "data")),
        delays=[0.2, 0.8, 1.6, 3.0],
    )
    got_tree = _stage1_tree(ch[0])
    assert set(got_tree) == set(ref_tree)
    for rel in ref_tree:
        assert got_tree[rel] == ref_tree[rel], rel
    assert _hub_docs(ch[2]) == ref_docs
