"""MLS two-stage pipeline: content-addressed stage-1 JSONs, consecutive-
segment stage-2 merge."""

import json
import os

import numpy as np
import pytest

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.datasets.mls import (
    MLSStage1Processor,
    canonicalize,
    create_batch_lists,
    create_interleaved_documents,
    make_entry_id,
    merge_batch,
    split_consecutive_chunks,
    text_to_id,
)
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet
from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import LocalHub


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def test_content_id_deterministic():
    assert canonicalize("  Hello   WORLD ") == "hello world"
    a = text_to_id("Hello world")
    assert a == text_to_id("  hello   WORLD ")  # canonicalized
    assert a != text_to_id("other text")
    eid = make_entry_id("spk1", "bookA", 1.5, 3.25, "Hello world")
    assert eid == f"spk1-bookA-00000150-00000325-{a}"


def test_split_consecutive_chunks():
    es = [
        {"begin_time": 0.0, "end_time": 2.0},
        {"begin_time": 2.1, "end_time": 4.0},  # within 0.2 tolerance
        {"begin_time": 9.0, "end_time": 10.0},  # gap
    ]
    segs = split_consecutive_chunks(es)
    assert [len(s) for s in segs] == [2, 1]


def test_create_interleaved_documents():
    grouped = {
        "path/a.flac": [
            {
                "entry_id": "e0",
                "transcript": "one",
                "audio_str": "A",
                "begin_time": 0.0,
                "end_time": 1.0,
                "speaker_id": "s",
                "book_id": "b",
            },
            {
                "entry_id": "e1",
                "transcript": "two",
                "audio_str": "B",
                "begin_time": 5.0,
                "end_time": 6.0,
                "speaker_id": "s",
                "book_id": "b",
            },
        ]
    }
    docs = create_interleaved_documents(grouped)
    # 2 segments x 2 types, _seg suffixes because split
    assert sorted(d["id"] for d in docs) == [
        "e0_seg0_type1",
        "e0_seg0_type2",
        "e1_seg1_type1",
        "e1_seg1_type2",
    ]
    t1 = [d for d in docs if d["id"] == "e0_seg0_type1"][0]["text"]
    assert t1 == (
        "<|begin_of_text|><|text_start|>one<|text_end|>"
        "<|audio_start|>A<|audio_end|><|end_of_text|>"
    )


def test_stage1_and_stage2_end_to_end(tmp_path, rng, tiny_oracle):
    _, params, cfg = tiny_oracle
    engine = MimiEncoderEngine(
        params, cfg, EngineConfig(batch_size=2, min_bucket_seconds=0.25, max_chunk_seconds=2.0)
    )
    rows = []
    for i in range(3):
        audio = (rng.standard_normal(int(16_000 * 0.4)) * 0.2).astype(np.float32)
        rows.append(
            {
                "speaker_id": "spk1",
                "book_id": "bk1",
                "transcript": f"line {i}",
                "begin_time": i * 0.4,
                "end_time": (i + 1) * 0.4,
                "original_path": "orig/a.flac",
                "audio": {"array": audio, "sampling_rate": 16_000},
            }
        )
    out_dir = str(tmp_path / "stage1")
    proc = MLSStage1Processor(
        "sh0", engine, out_dir, str(tmp_path / "prog"), progress_save_interval=1
    )
    prog = proc.run(rows)
    assert prog["processed_count"] == 3
    jsons = os.listdir(os.path.join(out_dir, "spk1", "bk1"))
    assert len(jsons) == 3
    e = json.load(open(os.path.join(out_dir, "spk1", "bk1", jsons[0])))
    assert set(e) >= {"entry_id", "audio_str", "begin_time", "transcript"}

    # resume: index-based progress, nothing re-encoded (dir unchanged mtimes)
    prog2 = MLSStage1Processor("sh0", engine, out_dir, str(tmp_path / "prog")).run(rows)
    assert prog2["last_processed_index"] == 2

    # stage 2
    batches = create_batch_lists(out_dir, speakers_per_batch=50)
    assert batches == [[("spk1", "bk1")]]
    hub = LocalHub(str(tmp_path / "hub"))
    rep = merge_batch(out_dir, batches[0], "batch_000", hub, str(tmp_path / "w2"))
    assert rep["status"] == "processed" and rep["entries"] == 3
    docs = read_parquet(str(tmp_path / "hub" / "data" / "batch_000.parquet"))
    # all 3 utterances are consecutive -> one segment -> 2 docs
    assert sorted(d["id"] for d in docs)[0].endswith("_type1")
    assert len(docs) == 2
    assert docs[0]["text"].count("<|audio_start|>") == 3

    # skip-if-exists
    rep2 = merge_batch(out_dir, batches[0], "batch_000", hub, str(tmp_path / "w2"))
    assert rep2["status"] == "skipped"
