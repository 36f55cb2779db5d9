"""Parquet-corpus processors: libritts_r standard + tts0, common_voice,
with embedded-audio decode and skip-if-on-hub idempotence."""

import numpy as np
import pytest
import torch

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.datasets.parquet_corpus import (
    SPECS,
    encode_samples,
    process_shard,
    rows_tts0,
    rows_type12,
)
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet, write_parquet
from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import LocalHub


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def make_engine(tiny_oracle):
    _, params, cfg = tiny_oracle
    return MimiEncoderEngine(
        params, cfg, EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=2.0)
    )


def libritts_rows(rng, n=4):
    rows = []
    for i in range(n):
        audio = (rng.standard_normal(int(24_000 * 0.5)) * 0.3).astype(np.float32)
        rows.append(
            {
                "id": f"utt{i}",
                "text_normalized": f'"Sentence {i}."',
                "speaker_id": 100 + (i // 2),
                "chapter_id": 7,
                "audio": {"array": audio, "sampling_rate": 24_000},
            }
        )
    return rows


def test_encode_samples_and_type12(tmp_path, rng, tiny_oracle):
    model, _, _ = tiny_oracle
    spec = SPECS["libritts_r"]
    rows = libritts_rows(rng)
    samples = encode_samples(rows, spec, make_engine(tiny_oracle))
    assert len(samples) == 4
    # parity of the first sample's codes vs the torch oracle
    from tokenize_audio_tpu.core.codes import chars_to_codes

    got = np.array(
        chars_to_codes(samples[0]["audio_str"], 8, 2048, return_tensors="np", unicode_offset=0xE000)
    )
    with torch.no_grad():
        ref = (
            model.encode(torch.tensor(rows[0]["audio"]["array"])[None, None, :])
            .audio_codes[0, :8]
            .numpy()
        )
    assert (got == ref).all()

    out = rows_type12(samples, spec)
    assert len(out) == 8
    assert out[0]["id"] == "utt0_type1" and out[0]["speaker_id"] == 100
    assert out[1]["text"].startswith("<|begin_of_text|><|audio_start|>")


def test_rows_tts0_pairing(rng, tiny_oracle):
    spec = SPECS["libritts_r"]
    samples = encode_samples(libritts_rows(rng), spec, make_engine(tiny_oracle))
    pairs = rows_tts0(samples, spec)
    # groups: speaker 100 (utt0,utt1) and 101 (utt2,utt3) -> one pair each
    assert sorted(p["id"] for p in pairs) == ["utt0#utt1", "utt2#utt3"]
    p0 = [p for p in pairs if p["id"] == "utt0#utt1"][0]
    assert p0["text"].count("<|text_start|>[0]") == 2
    assert p0["text"].count("<|audio_start|>") == 2
    assert '"' not in p0["text"].split("<|text_start|>[0]")[1].split("<|text_end|>")[0]


def test_process_shard_and_skip(tmp_path, rng, tiny_oracle):
    spec = SPECS["common_voice"]
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    rows = []
    for i in range(3):
        audio = (rng.standard_normal(int(48_000 * 0.4)) * 0.2).astype(np.float32)
        rows.append(
            {
                "id": f"cv{i}",
                "sentence": f"phrase {i}",
                "client_id": f"spk{i}",
                "audio": {"array": audio, "sampling_rate": 48_000},
            }
        )
    local = write_parquet(rows, str(tmp_path / "shard0.parquet"))
    src.upload_file(local, "en/shard0.parquet")

    rep = process_shard(
        spec,
        "shard0",
        "en",
        src,
        dst,
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
    )
    assert rep["status"] == "processed" and rep["rows"] == 6
    out = read_parquet(str(tmp_path / "dst" / "en" / "shard0.parquet"))
    assert {r["id"] for r in out} == {f"cv{i}_type{t}" for i in range(3) for t in (1, 2)}

    rep2 = process_shard(
        spec,
        "shard0",
        "en",
        src,
        dst,
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
    )
    assert rep2["status"] == "skipped"
