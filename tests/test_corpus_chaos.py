"""SIGKILL chaos test for the parquet-corpus family (SURVEY §4
implication (d)): the generic template behind LibriTTS-R / Common Voice /
People's Speech is hard-killed at arbitrary moments mid-run, then simply
rerun — and the published target parquets must equal an uninterrupted
run's, bit for bit at the document level. The resume grain is per-shard
(skip-if-on-hub + progress, the reference's check at
common-voice-mimi/process_common_voice.py:150-165), so a rerun re-encodes
any killed shard from scratch with identical batch composition — the
kill windows exercised are fetch/decode/encode, the upload-verify gap,
and the upload→mark_completed gap (hub-as-ledger adoption).
"""

import os

import pytest

from tests.chaos_utils import kill_anywhere, run_child
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet

CHILD = os.path.join(os.path.dirname(__file__), "corpus_chaos_child.py")


def _hub_docs(dst):
    base = os.path.join(dst, "en")
    if not os.path.isdir(base):
        return {}
    docs = {}
    for f in sorted(os.listdir(base)):
        if not f.endswith(".parquet"):
            continue
        for d in read_parquet(os.path.join(base, f)):
            docs[f"{f}:{d['id']}"] = d["text"]
    return docs


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path):
    clean = [str(tmp_path / f"clean_{d}") for d in ("src", "dst", "work", "prog")]
    rc, out, _ = run_child([CHILD, *clean])
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref_docs = _hub_docs(clean[1])
    assert len(ref_docs) == 24  # 3 shards x 4 rows x (type1 + type2)

    ch = [str(tmp_path / f"chaos_{d}") for d in ("src", "dst", "work", "prog")]

    def started():
        # cheap existence checks only — this is polled every 20 ms while a
        # kill is armed; parsing published parquets here would be
        # O(published data) per tick. The work dir fills first (the source
        # parquet downloads into it before any encode).
        return any(
            os.path.isdir(d) and bool(os.listdir(d)) for d in (ch[2], ch[3], os.path.join(ch[1], "en"))
        )

    kill_anywhere(
        lambda k: run_child([CHILD, *ch], kill_after=k, evidence=started),
        midwork=started,
        delays=[0.2, 0.8, 1.6, 3.0],
    )
    assert _hub_docs(ch[1]) == ref_docs
