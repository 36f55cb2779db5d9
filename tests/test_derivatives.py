"""Derivative builders: string transforms + hub->hub shard processing."""

import numpy as np
import pytest

from tokenize_audio_tpu.config import CODEBOOK_SIZE, UNICODE_OFFSET_LARGE
from tokenize_audio_tpu.core.codes import codes_to_chars
from tokenize_audio_tpu.datasets.base import asr_document, tts_document
from tokenize_audio_tpu.datasets.derivatives import (
    extract_semantic_tokens,
    filter_type1,
    filter_type2,
    fix_text_whitespace,
    inject_speaker_tag,
    process_shards,
    remove_text_content,
    transform_rows,
)
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet, write_parquet
from tokenize_audio_tpu.hub import LocalHub


def make_audio_str(rng, frames=5):
    codes = rng.integers(0, CODEBOOK_SIZE, size=(8, frames), dtype=np.int64)
    return codes, codes_to_chars(codes, CODEBOOK_SIZE, unicode_offset=UNICODE_OFFSET_LARGE)


def test_filter_and_strip_suffix():
    rows = [
        {"id": "a_type1", "text": "t1"},
        {"id": "a_type2", "text": "t2"},
        {"id": "b_type2", "text": "t3"},
    ]
    assert filter_type2(rows) == [{"id": "a", "text": "t2"}, {"id": "b", "text": "t3"}]
    assert filter_type1(rows) == [{"id": "a", "text": "t1"}]


def test_remove_text_and_semantic(rng):
    codes, audio_str = make_audio_str(rng)
    doc = asr_document("hello", audio_str)
    stripped = remove_text_content(doc)
    assert "<|text_start|>" not in stripped and "hello" not in stripped
    assert audio_str in stripped
    sem = extract_semantic_tokens(stripped, "ex0")
    span = sem.split("<|audio_start|>")[1].split("<|audio_end|>")[0]
    # codebook-0 codes, one char per frame
    assert [ord(c) - UNICODE_OFFSET_LARGE for c in span] == codes[0].tolist()


def test_semantic_rejects_partial_frames():
    bad = "<|audio_start|>" + "" * 7 + "<|audio_end|>"
    with pytest.raises(ValueError, match="divisible"):
        extract_semantic_tokens(bad, "ex1")


def test_tts0_and_fix(rng):
    _, audio_str = make_audio_str(rng)
    doc = tts_document("hi there", audio_str)
    tagged = inject_speaker_tag(doc)
    assert "<|text_start|>[0]hi there<|text_end|>" in tagged
    dirty = doc.replace("<|text_start|>", "<|text_start|> ").replace(
        "<|text_end|>", " <|text_end|>"
    )
    assert fix_text_whitespace(dirty) == doc


def test_process_shards_hub_to_hub(tmp_path, rng):
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    _, audio_str = make_audio_str(rng)
    rows = [
        {"id": "u0_type1", "text": tts_document("a", audio_str)},
        {"id": "u0_type2", "text": asr_document("a", audio_str)},
    ]
    local = write_parquet(rows, str(tmp_path / "s0.parquet"))
    src.upload_file(local, "data/s0.parquet")

    rep = process_shards(
        "semantic", src, dst, str(tmp_path / "prog"), str(tmp_path / "work")
    )
    assert rep.processed == 1
    out = read_parquet(str(tmp_path / "dst" / "data" / "s0.parquet"))
    assert [r["id"] for r in out] == ["u0"]
    assert "<|text_start|>" not in out[0]["text"]
    span = out[0]["text"].split("<|audio_start|>")[1].split("<|audio_end|>")[0]
    assert len(span) == 5  # one semantic char per frame

    # idempotent rerun
    rep2 = process_shards(
        "semantic", src, dst, str(tmp_path / "prog"), str(tmp_path / "work")
    )
    assert rep2.skipped == 1


def test_transform_rows_fix_mode():
    rows = [{"id": "x_type1", "text": "<|text_start|> padded <|text_end|>"}]
    out = transform_rows(rows, "fix")
    assert out[0]["text"] == "<|text_start|>padded<|text_end|>"
    with pytest.raises(ValueError, match="unknown mode"):
        transform_rows(rows, "nope")
