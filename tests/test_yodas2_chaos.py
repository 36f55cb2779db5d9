"""SIGKILL chaos test for the flagship YODAS2 path (SURVEY §4 implication
(d), taken past enumerated crash windows): the shard processor is
hard-killed at arbitrary moments mid-run, then simply rerun — and the
final hub artifacts must equal an uninterrupted run's, entry for entry,
code for code. This is the reference's operational contract ("crash
anywhere, rerun the same command") proven with real process kills.
"""

import json
import os

import numpy as np
import pytest

from tests.chaos_utils import kill_anywhere, run_child
from tests.test_yodas2 import build_corpus

CHILD = os.path.join(os.path.dirname(__file__), "yodas2_chaos_child.py")


def _hub_contents(hub_dir):
    """{repo_path: {audio_id: {chunk_id: codes-list}}} for every data JSON."""
    out = {}
    base = os.path.join(hub_dir, "data", "en000")
    for f in sorted(os.listdir(base)):
        with open(os.path.join(base, f)) as fh:
            entries = json.load(fh)
        out[f] = {
            e["audio_id"]: {k: np.asarray(v) for k, v in e["codes"].items()}
            for e in entries
        }
    return out


@pytest.mark.slow
def test_kill_anywhere_rerun_converges(tmp_path, rng):
    mirror = build_corpus(str(tmp_path / "mirror"), rng, subshards=3, audios_per=2)

    # uninterrupted reference run
    clean = {d: str(tmp_path / f"clean_{d}") for d in ("work", "prog", "hub")}
    rc, out, _ = run_child([CHILD, mirror, clean["work"], clean["prog"], clean["hub"]])
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref = _hub_contents(clean["hub"])
    assert len(ref) == 3

    # chaos runs: SIGKILL at staggered offsets after the first evidence of
    # work (fetch/extract into the work dir), then rerun until completion
    ch = {d: str(tmp_path / f"chaos_{d}") for d in ("work", "prog", "hub")}

    def started():
        return os.path.isdir(ch["work"]) and bool(os.listdir(ch["work"]))

    kill_anywhere(
        lambda k: run_child(
            [CHILD, mirror, ch["work"], ch["prog"], ch["hub"]],
            kill_after=k,
            evidence=started,
        ),
        midwork=started,
        delays=[0.2, 1.0, 2.5, 5.0],
    )
    got = _hub_contents(ch["hub"])
    assert set(got) == set(ref)
    for f in ref:
        assert set(got[f]) == set(ref[f]), f
        for aid in ref[f]:
            assert set(got[f][aid]) == set(ref[f][aid]), (f, aid)
            for cid in ref[f][aid]:
                assert (got[f][aid][cid] == ref[f][aid][cid]).all(), (f, aid, cid)
