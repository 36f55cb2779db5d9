"""Fleet integration: the pod runner fans the REAL flagship processor out
over multiple shards concurrently (L3 orchestration driving L2 workers,
SURVEY §1) — shard lists, throttle, per-shard logs, progress ledgers, and
hub outputs all through the production entry points, then a rerun skips
everything via the completed ledgers."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_yodas2 import build_corpus
from tokenize_audio_tpu.runner.pod_runner import main as pod_main

CHILD = os.path.join(os.path.dirname(__file__), "yodas2_chaos_child.py")


@pytest.mark.slow
def test_pod_runner_drives_real_shards_concurrently(tmp_path, rng):
    mirror = str(tmp_path / "mirror")
    for shard in ("en000", "en001"):
        build_corpus(mirror, rng, shard=shard, subshards=2, audios_per=2)
    hub = str(tmp_path / "hub")
    prog = str(tmp_path / "prog")
    shard_list = tmp_path / "shards.txt"
    shard_list.write_text("en000\nen001\n")

    rc = pod_main(
        [
            "run",
            "--shard-list", str(shard_list),
            "--max-concurrent", "2",
            "--poll-seconds", "0.2",
            "--chips", "0",  # CPU children; no chip isolation env
            "--run-dir", str(tmp_path / "run"),
            "--log-dir", str(tmp_path / "logs"),
            "--wait",
            "--",
            sys.executable, CHILD, mirror,
            str(tmp_path / "work"), prog, hub, "{shard}",
        ]
    )
    assert rc == 0
    for shard in ("en000", "en001"):
        log = open(tmp_path / "logs" / f"{shard}.log").read()
        assert "DONE" in log, log[-2000:]
        # hub holds both sub-shard code files, every entry encoded
        for i in range(2):
            p = os.path.join(hub, "data", shard, f"{i:08d}.json")
            entries = json.load(open(p))
            assert len(entries) == 2
            assert all("codes" in e and e["codes"] for e in entries)
        # progress ledger marks the shard resumable-complete
        state = json.load(open(os.path.join(prog, f"{shard}_progress.json")))
        assert len(state["completed"]) == 2

    # a rerun launches the children again; their hub-as-ledger resume
    # must skip all sub-shards (skipped=2 in each report)
    rc = pod_main(
        [
            "run",
            "--shard-list", str(shard_list),
            "--max-concurrent", "2",
            "--poll-seconds", "0.2",
            "--chips", "0",
            "--run-dir", str(tmp_path / "run2"),
            "--log-dir", str(tmp_path / "logs2"),
            "--wait",
            "--",
            sys.executable, CHILD, mirror,
            str(tmp_path / "work_rerun"), prog, hub, "{shard}",
        ]
    )
    assert rc == 0
    for shard in ("en000", "en001"):
        log = open(tmp_path / "logs2" / f"{shard}.log").read()
        rep = json.loads(log.rsplit("DONE ", 1)[1].splitlines()[0])
        assert rep["skipped"] == 2 and rep["processed"] == 0
