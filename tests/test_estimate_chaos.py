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

import pytest

from tests.chaos_utils import kill_anywhere, run_child

CHILD = os.path.join(os.path.dirname(__file__), "estimate_chaos_child.py")


def _report(outpath):
    try:
        with open(outpath) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path):
    tokdir = str(tmp_path / "tok")  # shared: tokenizer build is idempotent
    clean_src, clean_out = str(tmp_path / "clean_src"), str(tmp_path / "clean.json")
    rc, out, _ = run_child([CHILD, clean_src, clean_out, tokdir])
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref = _report(clean_out)
    assert len([k for k in ref if not k.startswith("_")]) == 24
    assert all(v["estimated_total_tokens"] > 0 for k, v in ref.items() if not k.startswith("_"))

    src, outpath = str(tmp_path / "chaos_src"), str(tmp_path / "chaos.json")

    def started():
        return bool(_report(outpath))

    kill_anywhere(
        lambda k: run_child(
            [CHILD, src, outpath, tokdir], kill_after=k, evidence=started, timeout=300
        ),
        midwork=started,
        delays=[0.05, 0.15, 0.3, 0.6],
    )
    got = _report(outpath)
    # _config carries the run fingerprint; estimates must match exactly
    assert {k: v for k, v in got.items() if k != "_config"} == {
        k: v for k, v in ref.items() if k != "_config"
    }
