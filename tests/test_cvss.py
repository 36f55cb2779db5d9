"""CVSS combiner: 4-segment S2ST documents, per-split parquet."""

from tokenize_audio_tpu.datasets.cvss import LANGUAGES, combine_row, combine_split
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet, write_parquet
from tokenize_audio_tpu.hub import LocalHub


def test_language_list_matches_reference():
    assert len(LANGUAGES) == 21
    assert "sv-SE" in LANGUAGES and "zh-CN" in LANGUAGES


def test_combine_row():
    row = {
        "id": "x1",
        "original_text": "bonjour",
        "original_audio_str": "FR",
        "translated_text": "hello",
        "translated_audio_str": "EN",
    }
    t = combine_row(row, "fr")
    assert t == (
        "<|begin_of_text|>"
        "<|audio_start|>FR<|audio_end|>"
        "<|text_start|><language>fr</language>bonjour<|text_end|>"
        "<|text_start|><language>en</language>hello<|text_end|>"
        "<|audio_start|>EN<|audio_end|>"
        "<|end_of_text|>"
    )


def test_combine_split(tmp_path):
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    for lang in ("fr", "de"):
        rows = [
            {
                "id": f"{lang}-0",
                "original_text": "a",
                "original_audio_str": "A",
                "translated_text": "b",
                "translated_audio_str": "B",
            }
        ]
        local = write_parquet(rows, str(tmp_path / f"{lang}.parquet"))
        src.upload_file(local, f"{lang}/test.parquet")

    rep = combine_split("test", ["fr", "de", "ja"], src, dst, str(tmp_path / "w"))
    assert rep["status"] == "processed" and rep["rows"] == 2  # ja missing, skipped
    out = read_parquet(str(tmp_path / "dst" / "data" / "test.parquet"))
    assert sorted(r["lang"] for r in out) == ["de", "fr"]

    assert combine_split("test", ["fr"], src, dst, str(tmp_path / "w"))["status"] == "skipped"
