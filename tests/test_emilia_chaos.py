"""SIGKILL chaos test for the Emilia processor: hard-kill mid-shard
(download/extract/encode/cache/group/upload windows), rerun unchanged,
and the uploaded parquet must equal an uninterrupted run's rows exactly —
including utterance ORDER inside each speaker document (the sorted-uid
determinism a resume bug once broke, NOTES r2)."""

import json
import os
import tarfile

import numpy as np
import pytest

from tests.chaos_utils import kill_anywhere, run_child
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet
from tokenize_audio_tpu.hub import LocalHub
from tokenize_audio_tpu.io import write_wav

CHILD = os.path.join(os.path.dirname(__file__), "emilia_chaos_child.py")
SR = 24_000


def build_source(tmp_path, rng, speakers=6, utts_per=4):
    """A bigger Emilia tar than test_emilia's: enough encode work that
    kills can land mid-shard."""
    shard = "EN_B00000"
    src_dir = tmp_path / "tar_src"
    src_dir.mkdir()
    for spk in range(1, speakers + 1):
        for w in range(utts_per):
            uid = f"{shard}_S{spk:05d}_W{w:06d}"
            audio = (rng.standard_normal(int(SR * 0.5)) * 0.2).astype(np.float32)
            write_wav(str(src_dir / f"{uid}.wav"), audio, SR)
            json.dump(
                {"text": f"utt {spk}-{w}", "speaker": f"SPEAKER_{spk:02d}"},
                open(src_dir / f"{uid}.json", "w"),
            )
    tar_path = tmp_path / f"{shard}.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(src_dir, arcname=shard)
    hub = LocalHub(str(tmp_path / "source_hub"))
    hub.upload_file(str(tar_path), f"Emilia/EN/{shard}.tar")
    return str(tmp_path / "source_hub")


def rows_of(dst):
    """Full rows keyed by id — conversational adds speaker_ids/speaker_count
    columns whose values must also survive kill/resume."""
    rows = read_parquet(os.path.join(dst, "Emilia", "EN", "EN_B00000.parquet"))
    return {
        r["id"]: {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in r.items()}
        for r in rows
    }


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["standard", "conversational"])
def test_kill_anywhere_rerun_converges(tmp_path, rng, mode):
    src = build_source(tmp_path, rng)
    extra = ["conversational"] if mode == "conversational" else []

    rc, out, _ = run_child([CHILD, src, str(tmp_path / "clean"), str(tmp_path / "cw"), *extra])
    assert rc == 0 and "DONE" in out, out[-3000:]
    ref = rows_of(str(tmp_path / "clean"))
    if mode == "standard":
        assert len(ref) == 6 * 2  # speakers x (type1, type2)
    else:
        assert len(ref) == 6  # type1 only (process_shard_conversational.py)
        assert all(r["speaker_count"] >= 1 for r in ref.values())

    dst, work = str(tmp_path / "chaos"), str(tmp_path / "w")

    def started():  # tar fetch/extract into the work dir counts as work
        return os.path.isdir(work) and bool(os.listdir(work))

    kill_anywhere(
        lambda k: run_child([CHILD, src, dst, work, *extra], kill_after=k, evidence=started),
        midwork=started,
        delays=[0.2, 0.8, 1.6, 3.0],
    )
    got = rows_of(dst)
    # ids, texts, speaker columns, and in-document utterance order — the
    # sorted-uid determinism a resume bug once broke (NOTES r2)
    assert got == ref
