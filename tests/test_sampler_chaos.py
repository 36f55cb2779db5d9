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

import numpy as np
import pytest

from tests.chaos_utils import kill_anywhere, run_child

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


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path):
    clean_src, clean_out = str(tmp_path / "clean_src"), str(tmp_path / "clean_out")
    rc, out, _ = run_child([CHILD, clean_src, clean_out])
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref = _npy_corpus(clean_out)
    assert len(ref) == 120  # 3 shards x per_shard=40 picks

    src, outdir = str(tmp_path / "chaos_src"), str(tmp_path / "chaos_out")

    def started():
        return os.path.isfile(os.path.join(outdir, "sampling_progress.txt"))

    kill_anywhere(
        lambda k: run_child([CHILD, src, outdir], kill_after=k, evidence=started, timeout=300),
        midwork=started,
        delays=[0.05, 0.1, 0.2, 0.4],
    )
    assert _npy_corpus(outdir) == ref
