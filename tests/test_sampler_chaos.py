"""SIGKILL chaos test for the BPE corpus sampler (SURVEY §2.1 #20): the
sampler is hard-killed mid-sweep, then simply rerun — and the final
.npy training corpus must equal an uninterrupted run's, array for
array. The resume grain is the fsync'd append-only progress file
(sample_yodas2_codes_from_hf.py:266-302); kill windows exercised
include download/parse, the np.save window (torn .npy must be
rewritten because its key was never marked), and mid-append progress
lines (a torn trailing line must not match any key).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

CHILD = os.path.join(os.path.dirname(__file__), "sampler_chaos_child.py")


def _npy_corpus(outdir):
    """{file: [list-of-(K,T)-arrays-as-lists]} for comparison."""
    got = {}
    if not os.path.isdir(outdir):
        return got
    for f in sorted(os.listdir(outdir)):
        if f.endswith(".npy"):
            arrays = np.load(os.path.join(outdir, f), allow_pickle=True)
            got[f] = [a.tolist() for a in arrays]
    return got


def _progress_started(outdir):
    return os.path.isfile(os.path.join(outdir, "sampling_progress.txt"))


def _run_child(src, out, kill_after=None, timeout=300):
    p = subprocess.Popen(
        [sys.executable, CHILD, src, out],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    if kill_after is None:
        outtxt, _ = p.communicate(timeout=timeout)
        return p.returncode, outtxt
    deadline = time.time() + timeout
    line = ""
    while time.time() < deadline:
        line = p.stdout.readline()
        if "READY" in line or not line:
            break
    # arm from first evidence of WORK (a marked sub-shard), not READY
    while time.time() < deadline and p.poll() is None:
        if _progress_started(out):
            break
        time.sleep(0.01)
    time.sleep(kill_after)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=30)
        p.stdout.read()
        return -9, ""
    outtxt = p.stdout.read()
    return p.returncode, line + outtxt


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path):
    clean_src, clean_out = str(tmp_path / "clean_src"), str(tmp_path / "clean_out")
    rc, out = _run_child(clean_src, clean_out)
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref = _npy_corpus(clean_out)
    assert len(ref) == 120  # 3 shards x per_shard=40 picks

    src, outdir = str(tmp_path / "chaos_src"), str(tmp_path / "chaos_out")
    delays = [0.05, 0.1, 0.2, 0.4]
    kills = midwork_kills = 0
    rc = -1
    for attempt in range(10):
        kill_after = delays[min(attempt, len(delays) - 1)] if attempt < 6 else None
        rc, out = _run_child(src, outdir, kill_after=kill_after)
        if rc == 0 and "DONE" in out:
            break
        kills += 1
        if _progress_started(outdir):
            midwork_kills += 1
    assert rc == 0, f"never completed after {kills} kills"
    assert kills == 0 or midwork_kills >= 1, "kills never landed after work started"
    assert _npy_corpus(outdir) == ref
