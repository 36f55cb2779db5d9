"""Dataset validator: grammar and code-stream invariants."""

import numpy as np

from tokenize_audio_tpu.analytics.validate import main as validate_main, validate_document, validate_rows
from tokenize_audio_tpu.config import CODEBOOK_SIZE, UNICODE_OFFSET_LARGE
from tokenize_audio_tpu.core.codes import codes_to_chars
from tokenize_audio_tpu.datasets.base import asr_document, tts_document
from tokenize_audio_tpu.datasets.parquet_utils import write_parquet
from tokenize_audio_tpu.hub import LocalHub


def make_span(rng, frames=4):
    codes = rng.integers(0, CODEBOOK_SIZE, size=(8, frames))
    return codes_to_chars(codes, CODEBOOK_SIZE, unicode_offset=UNICODE_OFFSET_LARGE)


def test_valid_documents_pass(rng):
    span = make_span(rng)
    assert validate_document(tts_document("hello", span)) == []
    assert validate_document(asr_document("hi", span)) == []


def test_grammar_violations_detected(rng):
    span = make_span(rng)
    assert "missing bos" in validate_document(tts_document("x", span)[10:])
    assert "missing eos" in validate_document(tts_document("x", span)[:-5])
    nested = (
        "<|begin_of_text|><|audio_start|><|text_start|>x<|text_end|>"
        "<|audio_end|><|end_of_text|>"
    )
    assert any("nested" in p for p in validate_document(nested))
    unclosed = "<|begin_of_text|><|audio_start|>" + span + "<|end_of_text|>"
    assert any("unclosed" in p for p in validate_document(unclosed))


def test_code_invariants_detected(rng):
    span = make_span(rng)
    bad_len = tts_document("x", span[:-3])  # partial frame
    assert any("% 8 != 0" in p for p in validate_document(bad_len))
    # out-of-order codes inside a span: divisible length but invalid stream
    shuffled = span[8:16] + span[8:16][::-1]
    bad_codes = tts_document("x", shuffled)
    assert any("invalid codes" in p for p in validate_document(bad_codes))


def test_all_tag_problems_collected(rng):
    # forensics contract: a badly corrupted row reports EVERY violation,
    # not just the first (the scan recovers and keeps going)
    span = make_span(rng)
    doc = (
        "<|begin_of_text|>"
        "<|audio_start|><|text_start|>x<|text_end|>"  # nested at text_start
        "<|audio_end|>"
        "<|text_end|>"  # unmatched
        "<|audio_start|>" + span +  # unclosed at EOF
        "<|end_of_text|>"
    )
    probs = validate_document(doc)
    assert any("nested" in p for p in probs)
    assert any("unmatched" in p for p in probs)
    assert any("unclosed" in p for p in probs)

    # one stray close inside a correctly paired span counts as exactly ONE
    # violation — the span's own legitimate close must not be orphaned
    stray = (
        "<|begin_of_text|>"
        "<|audio_start|>" + span + "<|text_end|>" + "<|audio_end|>"
        "<|end_of_text|>"
    )
    probs = validate_document(stray)
    tag_probs = [p for p in probs if "matched" in p or "closed" in p or "nested" in p]
    assert len(tag_probs) == 1 and "unmatched text_end" in tag_probs[0]


def test_null_text_row_still_checked_for_duplicate_id(rng):
    span = make_span(rng)
    rows = [
        {"id": "a", "text": tts_document("ok", span)},
        {"id": "a", "text": None},  # null text AND duplicate id
    ]
    rep = validate_rows(rows)
    probs = rep["problems"]["a"]
    assert any("duplicate id" in p for p in probs)
    assert any("non-string text" in p for p in probs)


def test_validate_rows_and_cli(tmp_path, rng, capsys):
    span = make_span(rng)
    rows = [
        {"id": "a_type1", "text": tts_document("ok", span)},
        {"id": "a_type1", "text": tts_document("dup id", span)},
        {"id": "b", "text": "<|begin_of_text|>no eos"},
    ]
    rep = validate_rows(rows)
    assert rep["rows"] == 3 and rep["bad_rows"] == 2

    hub = LocalHub(str(tmp_path / "hub"))
    local = write_parquet(rows[:1], str(tmp_path / "good.parquet"))
    hub.upload_file(local, "data/good.parquet")
    assert validate_main(["--hub", f"dir:{tmp_path}/hub", "--prefix", "data/"]) == 0
    local2 = write_parquet(rows, str(tmp_path / "bad.parquet"))
    hub.upload_file(local2, "data/bad.parquet")
    assert validate_main(["--hub", f"dir:{tmp_path}/hub", "--prefix", "data/"]) == 1
