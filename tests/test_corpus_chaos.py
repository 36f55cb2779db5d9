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
import signal
import subprocess
import sys
import time

import pytest

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


def _run_child(src, dst, work, prog, kill_after=None, timeout=600):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    p = subprocess.Popen(
        [sys.executable, CHILD, src, dst, work, prog],
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
    # arm the timer from the first evidence of WORK (a published shard or
    # progress state), not from READY — otherwise every kill can land in
    # the post-READY compile window and resume is never exercised
    while time.time() < deadline and p.poll() is None:
        if _hub_docs(dst) or (os.path.isdir(prog) and os.listdir(prog)):
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


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path):
    clean = [str(tmp_path / f"clean_{d}") for d in ("src", "dst", "work", "prog")]
    rc, out = _run_child(*clean)
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref_docs = _hub_docs(clean[1])
    assert len(ref_docs) == 24  # 3 shards x 4 rows x (type1 + type2)

    ch = [str(tmp_path / f"chaos_{d}") for d in ("src", "dst", "work", "prog")]
    delays = [0.2, 0.8, 1.6, 3.0]
    kills = midwork_kills = 0
    rc = -1
    for attempt in range(10):
        kill_after = delays[min(attempt, len(delays) - 1)] if attempt < 6 else None
        rc, out = _run_child(*ch, kill_after=kill_after)
        if rc == 0 and "DONE" in out:
            break
        kills += 1
        if _hub_docs(ch[1]) or (os.path.isdir(ch[3]) and os.listdir(ch[3])):
            midwork_kills += 1
    assert rc == 0, f"never completed after {kills} kills"
    # a machine fast enough to finish before the first kill timer proves
    # nothing — only require mid-work evidence when kills happened
    assert kills == 0 or midwork_kills >= 1, "kills never landed after work started"
    assert _hub_docs(ch[1]) == ref_docs
