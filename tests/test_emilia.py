"""Emilia processor: tar -> speaker documents -> parquet, standard and
conversational variants, audio_str cache resume."""

import json
import os
import tarfile

import numpy as np
import pytest

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.datasets.emilia import (
    EmiliaShardProcessor,
    build_rows,
    group_documents,
    speaker_document_id,
)
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet
from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import LocalHub
from tokenize_audio_tpu.io import write_wav

SR = 24_000


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def make_engine(tiny_oracle):
    _, params, cfg = tiny_oracle
    return MimiEncoderEngine(
        params, cfg, EngineConfig(batch_size=2, min_bucket_seconds=0.25, max_chunk_seconds=2.0)
    )


def test_grouping():
    assert speaker_document_id("EN_B00000_S00040_W000004") == "EN_B00000_S00040"
    docs = group_documents(
        ["EN_B0_S1_W000", "EN_B0_S1_W001", "EN_B0_S2_W000"]
    )
    assert docs == {
        "EN_B0_S1": ["EN_B0_S1_W000", "EN_B0_S1_W001"],
        "EN_B0_S2": ["EN_B0_S2_W000"],
    }


def test_build_rows_standard_and_conversational():
    utts = {
        "EN_B0_S1_W000": {"audio_str": "A", "transcript": "one", "speaker": "SPEAKER_07"},
        "EN_B0_S1_W001": {"audio_str": "B", "transcript": "two", "speaker": "SPEAKER_03"},
    }
    rows = build_rows(utts, "Emilia", "EN_B0", conversational=False)
    assert [r["id"] for r in rows] == ["EN_B0_S1_type1", "EN_B0_S1_type2"]
    assert rows[0]["split"] == "Emilia-EN_B0"
    assert (
        rows[0]["text"]
        == "<|begin_of_text|><|text_start|>one<|text_end|><|audio_start|>A<|audio_end|>"
        "<|text_start|>two<|text_end|><|audio_start|>B<|audio_end|><|end_of_text|>"
    )

    conv = build_rows(utts, "Emilia", "EN_B0", conversational=True)
    assert len(conv) == 1
    assert conv[0]["id"] == "EN_B0_S1"
    assert conv[0]["speaker_ids"] == [0, 1]  # first-appearance order
    assert conv[0]["speaker_count"] == 2
    assert "<|text_start|>[0]one<|text_end|>" in conv[0]["text"]
    assert "<|text_start|>[1]two<|text_end|>" in conv[0]["text"]

    bad = {"X_W0": {"audio_str": "A", "transcript": "t", "speaker": "bob"}}
    with pytest.raises(ValueError, match="SPEAKER_"):
        build_rows(bad, "s", "x", conversational=True)


def build_tar(tmp_path, rng, lang="EN", shard="EN_B00000"):
    src_dir = tmp_path / "tar_src"
    src_dir.mkdir(exist_ok=True)
    for spk in (1, 2):
        for w in range(2):
            uid = f"{shard}_S{spk:05d}_W{w:06d}"
            audio = (rng.standard_normal(int(SR * 0.4)) * 0.2).astype(np.float32)
            write_wav(str(src_dir / f"{uid}.wav"), audio, SR)
            json.dump(
                {"text": f"utt {spk}-{w}", "speaker": f"SPEAKER_{spk:02d}"},
                open(src_dir / f"{uid}.json", "w"),
            )
    tar_path = tmp_path / f"{shard}.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(src_dir, arcname=shard)
    hub = LocalHub(str(tmp_path / "source_hub"))
    hub.upload_file(str(tar_path), f"Emilia/{lang}/{shard}.tar")
    return hub


def test_shard_end_to_end_and_skip(tmp_path, rng, tiny_oracle):
    src = build_tar(tmp_path, rng)
    dst = LocalHub(str(tmp_path / "target_hub"))
    proc = EmiliaShardProcessor(
        "Emilia",
        "EN",
        "EN_B00000",
        src,
        dst,
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
    )
    rep = proc.process()
    assert rep["status"] == "processed" and rep["rows"] == 4  # 2 speakers x 2 types
    rows = read_parquet(str(tmp_path / "target_hub" / "Emilia" / "EN" / "EN_B00000.parquet"))
    ids = sorted(r["id"] for r in rows)
    assert ids == [
        "EN_B00000_S00001_type1",
        "EN_B00000_S00001_type2",
        "EN_B00000_S00002_type1",
        "EN_B00000_S00002_type2",
    ]
    doc = [r for r in rows if r["id"] == "EN_B00000_S00001_type1"][0]["text"]
    assert doc.count("<|audio_start|>") == 2  # two utterances merged

    # skip on rerun
    proc2 = EmiliaShardProcessor(
        "Emilia",
        "EN",
        "EN_B00000",
        src,
        dst,
        make_engine(tiny_oracle),
        str(tmp_path / "work2"),
    )
    assert proc2.process()["status"] == "skipped"


def test_cache_resume_skips_encoded(tmp_path, rng, tiny_oracle):
    """Pre-seeded audio_str cache entries are not re-encoded (:456-461)."""
    src = build_tar(tmp_path, rng)
    dst = LocalHub(str(tmp_path / "dst2"))
    eng = make_engine(tiny_oracle)
    work = str(tmp_path / "work3")
    proc = EmiliaShardProcessor(
        "Emilia", "EN", "EN_B00000", src, dst, eng, work
    )
    os.makedirs(proc.work_dir, exist_ok=True)
    fake = {
        "EN_B00000_S00001_W000000": {
            "audio_str": "CACHED",
            "transcript": "from cache",
            "speaker": "SPEAKER_01",
        }
    }
    json.dump(fake, open(proc.cache_path, "w"))
    proc.process()
    rows = read_parquet(str(tmp_path / "dst2" / "Emilia" / "EN" / "EN_B00000.parquet"))
    doc = [r for r in rows if r["id"] == "EN_B00000_S00001_type1"][0]["text"]
    assert "CACHED" in doc and "from cache" in doc
    # resume ordering: W000000 came from the cache, W000001 was encoded and
    # APPENDED after it in completion order — the document must still be in
    # sorted-uid (chronological) order, with the cached utterance first
    assert doc.index("from cache") < doc.index("utt 1-1")


def test_resume_out_of_order_cache_keeps_uid_order(tmp_path, rng, tiny_oracle):
    """A cache whose entries were appended out of uid order (retried file
    landing last) must not permute document utterance order."""
    src = build_tar(tmp_path, rng)
    dst = LocalHub(str(tmp_path / "dst4"))
    proc = EmiliaShardProcessor(
        "Emilia", "EN", "EN_B00000", src, dst, make_engine(tiny_oracle),
        str(tmp_path / "work4"),
    )
    os.makedirs(proc.work_dir, exist_ok=True)
    # seed the LATER utterance only — the earlier one encodes afterwards,
    # appending to the cache behind it
    fake = {
        "EN_B00000_S00001_W000001": {
            "audio_str": "LATER",
            "transcript": "second",
            "speaker": "SPEAKER_01",
        }
    }
    json.dump(fake, open(proc.cache_path, "w"))
    proc.process()
    rows = read_parquet(str(tmp_path / "dst4" / "Emilia" / "EN" / "EN_B00000.parquet"))
    doc = [r for r in rows if r["id"] == "EN_B00000_S00001_type1"][0]["text"]
    assert doc.index("utt 1-0") < doc.index("second")
