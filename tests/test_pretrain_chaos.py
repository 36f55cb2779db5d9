"""SIGKILL chaos test for the pretrain converter — the repo's most
intricate resume machinery (accumulation checkpoint + persisted parquet
counter + orphan requeue + mark-after-upload). Kill the real CLI at
arbitrary points, rerun it unchanged, and the UNION of uploaded rows must
equal the clean run's: every id exactly once, with identical text.
(File boundaries may legally differ across crash schedules; the row set
may not.)
"""

import json
import os

import pytest

from tests.chaos_utils import kill_anywhere, run_child
from tokenize_audio_tpu.hub import LocalHub

N_SUB = 10
ENTRIES_PER = 400  # enough rows that processing spans seconds: kills must
# be able to land mid-work, not just during interpreter startup


def build_source(tmp_path, rng):
    """Synthetic YODAS2-stage output: {shard}/{sid}.json code files."""
    hub = LocalHub(str(tmp_path / "src"))
    for s in range(N_SUB):
        sid = f"{s:08d}"
        entries = []
        for a in range(ENTRIES_PER):
            aid = f"vid-{sid}-{a}"
            codes = rng.integers(0, 2048, size=(8, 12)).tolist()
            entries.append(
                {
                    "audio_id": aid,
                    "text": {f"{aid}-00000-00000000-00000100": f"text {sid} {a}"},
                    "codes": {f"{aid}-00000-00000000-00000100": codes},
                }
            )
        p = tmp_path / "tmp.json"
        p.write_text(json.dumps(entries))
        hub.upload_file(str(p), f"en000/{sid}.json")  # CLI uses no source prefix
    return str(tmp_path / "src")


# The converter is CPU-only today, but if any transitive import ever
# grows a jax backend touch, the env var alone would NOT stop the
# sitecustomize-forced axon platform from claiming the real chip
# (CLAUDE.md) — pin CPU via jax.config.update like the sibling chaos
# children do.
_CLI = (
    "import jax; jax.config.update('jax_platforms', 'cpu'); import sys; "
    "from tokenize_audio_tpu.datasets.pretrain_converter import main; "
    "sys.exit(main(sys.argv[1:]))"
)


def run_cli(src, dst, work, prog, kill_after=None, evidence=None):
    sids = ",".join(f"{s:08d}" for s in range(N_SUB))
    argv = [
        "-c", _CLI,
        "--shard-id", "en000",
        "--subshard-ids", sids,
        "--source-hub", f"dir:{src}",
        "--target-hub", f"dir:{dst}",
        "--work-dir", work,
        "--progress-dir", prog,
        "--parquet-rows", "100",
    ]
    # the CLI prints no READY marker — the evidence predicate alone arms
    # the kill timer (work starts right after interpreter+import startup)
    return run_child(argv, kill_after=kill_after, timeout=300, evidence=evidence, wait_ready=False)


def uploaded_rows(dst):
    from tokenize_audio_tpu.datasets.parquet_utils import read_parquet

    rows = {}
    base = os.path.join(dst, "data")  # converter uploads flat data/{name}.parquet
    for f in sorted(os.listdir(base)):
        for r in read_parquet(os.path.join(base, f)):
            assert r["id"] not in rows, f"duplicate id {r['id']} in {f}"
            rows[r["id"]] = r["text"]
    return rows


@pytest.mark.slow
def test_kill_anywhere_row_set_converges(tmp_path, rng):
    src = build_source(tmp_path, rng)

    rc, out, _ = run_cli(src, str(tmp_path / "clean"), str(tmp_path / "cw"), str(tmp_path / "cp"))
    assert rc == 0, out[-2000:]
    ref = uploaded_rows(str(tmp_path / "clean"))
    # N_SUB subshards x ENTRIES_PER entries x 2 row types
    assert len(ref) == N_SUB * ENTRIES_PER * 2

    dst, work, prog = (str(tmp_path / d) for d in ("chaos", "w", "p"))

    def state_sig():
        """Progress mtime + work-dir listing: changes whenever the run
        makes forward progress (the progress JSON is rewritten per
        sub-shard; work files appear and rotate)."""
        pf = os.path.join(prog, "pretrain_en000_progress.json")
        mtime = os.path.getmtime(pf) if os.path.exists(pf) else None
        listing = tuple(sorted(os.listdir(work))) if os.path.isdir(work) else ()
        return (mtime, listing)

    # evidence must be CHANGE-since-spawn, not mere existence: from the
    # second attempt on, state from the previous kill is already on disk
    # at child spawn, and an existence check would arm the kill timer
    # during interpreter startup instead of after resumed work
    snap = []

    def run(k):
        snap[:] = [state_sig()]
        return run_cli(
            src, dst, work, prog, kill_after=k, evidence=lambda: state_sig() != snap[0]
        )

    kill_anywhere(
        run,
        midwork=lambda: state_sig() != snap[0],
        # armed from first work evidence (not process start as before), so
        # the old 2.0-5.2 s ladder would overshoot the run's tail
        delays=[0.3, 0.8, 1.5, 2.5, 3.5],
        done_token=None,  # the CLI prints a JSON report, not DONE
    )
    got = uploaded_rows(dst)
    assert set(got) == set(ref)
    for rid, text in ref.items():
        assert got[rid] == text, rid
