"""SIGKILL chaos test for the token estimator's checkpoint/resume
(SURVEY §2.1 #21): the `analytics.estimate_tokens --output` CLI is
hard-killed mid-sweep, then simply rerun — and the final report must
equal an uninterrupted run's, group for group. The resume grain is the
atomically-checkpointed output JSON (finished groups skipped on
restart); per-GROUP seeded rngs mean a resumed run samples exactly like
a clean one, so the estimates are identical, not merely plausible.
Replaces the reference's 145 fanned-out per-language jobs +
check_token_estimation_progress.sh with one crash-safe process.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "estimate_chaos_child.py")


def _report(outpath):
    try:
        with open(outpath) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def _run_child(src, out, tokdir, kill_after=None, timeout=300):
    p = subprocess.Popen(
        [sys.executable, CHILD, src, out, tokdir],
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
    # arm from first evidence of WORK (a checkpointed group), not READY
    while time.time() < deadline and p.poll() is None:
        if _report(out):
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
    tokdir = str(tmp_path / "tok")  # shared: tokenizer build is idempotent
    clean_src, clean_out = str(tmp_path / "clean_src"), str(tmp_path / "clean.json")
    rc, out = _run_child(clean_src, clean_out, tokdir)
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref = _report(clean_out)
    assert len([k for k in ref if not k.startswith("_")]) == 24
    assert all(v["estimated_total_tokens"] > 0 for k, v in ref.items() if not k.startswith("_"))

    src, outpath = str(tmp_path / "chaos_src"), str(tmp_path / "chaos.json")
    delays = [0.05, 0.15, 0.3, 0.6]
    kills = midwork_kills = 0
    rc = -1
    for attempt in range(10):
        kill_after = delays[min(attempt, len(delays) - 1)] if attempt < 6 else None
        rc, out = _run_child(src, outpath, tokdir, kill_after=kill_after)
        if rc == 0 and "DONE" in out:
            break
        kills += 1
        if _report(outpath):
            midwork_kills += 1
    assert rc == 0, f"never completed after {kills} kills"
    assert kills == 0 or midwork_kills >= 1, "kills never landed after work started"
    got = _report(outpath)
    # _config carries the run fingerprint; estimates must match exactly
    assert {k: v for k, v in got.items() if k != "_config"} == {
        k: v for k, v in ref.items() if k != "_config"
    }
