"""SIGKILL chaos test for the ShardRunner-based processor families
(SURVEY §4 implication (d)): the LibriSpeech chunked-train layout
(chunk-level resume + batched uploads + the crash-between-upload-and-mark
adoption window, librispeech-mimi/process_librispeech_train.py:123-176)
and the parquet-corpus template (shard-grain skip-if-on-hub,
libritts-r-mimi/process_libritts_r.py:318-327) are hard-killed at
arbitrary moments, then simply rerun — and the final hub artifacts must
equal an uninterrupted run's bit for bit. Reruns regroup the remaining
work into different device batches, so this also re-exercises
batch-composition independence of the codes.
"""

import os

import pytest

from tests.chaos_utils import kill_anywhere, run_child
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet

CHILD = os.path.join(os.path.dirname(__file__), "runner_chaos_child.py")


def _work_evidence(base):
    """True once either family has produced progress or hub output."""
    for d in ("ls_hub", "ls_prog", "pc_hub", "pc_prog"):
        p = os.path.join(base, d)
        if os.path.isdir(p) and any(os.scandir(p)):
            return True
    return False


def _hub_docs(base):
    """{hub/file:id -> text} across both output hubs."""
    docs = {}
    for hub in ("ls_hub", "pc_hub"):
        data = os.path.join(base, hub, "data")
        if not os.path.isdir(data):
            continue
        for f in sorted(os.listdir(data)):
            for d in read_parquet(os.path.join(data, f)):
                docs[f"{hub}/{f}:{d['id']}"] = d["text"]
    return docs


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path):
    clean = str(tmp_path / "clean")
    rc, out, _ = run_child([CHILD, clean])
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref_docs = _hub_docs(clean)
    # librispeech: 12 utts x 2 rows over 6 chunks; corpus: 3 shards x 6 x 2
    assert len(ref_docs) == 24 + 36
    assert len(os.listdir(os.path.join(clean, "ls_hub", "data"))) == 6

    chaos = str(tmp_path / "chaos")
    kill_anywhere(
        lambda k: run_child(
            [CHILD, chaos], kill_after=k, evidence=lambda: _work_evidence(chaos)
        ),
        midwork=lambda: _work_evidence(chaos),
        delays=[0.2, 0.8, 1.6, 3.0],
    )
    assert _hub_docs(chaos) == ref_docs
