"""Integration: LibriSpeech-style manifest -> parquet on a fake hub, with
kill/resume idempotence — SURVEY §4 implications (c) and (d)."""

import json

import numpy as np
import pytest
import torch

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.config import CODEBOOK_SIZE, UNICODE_OFFSET_LARGE, EngineConfig
from tokenize_audio_tpu.core.codes import chars_to_codes
from tokenize_audio_tpu.datasets.librispeech import build_rows, process_split
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet
from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import LocalHub
from tokenize_audio_tpu.io import write_wav


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def make_corpus(tmp_path, rng, n=6):
    manifest = []
    for i in range(n):
        dur = int(24_000 * (0.3 + 0.4 * (i % 3)))
        audio = (rng.standard_normal(dur) * 0.3).astype(np.float32)
        p = str(tmp_path / f"utt{i}.wav")
        write_wav(p, audio, 24_000)
        manifest.append({"id": f"dev-{i}", "audio": p, "text": f"transcript {i}"})
    return manifest


def engine_for(tiny_oracle):
    _, params, cfg = tiny_oracle
    return MimiEncoderEngine(
        params, cfg, EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=2.0)
    )


def test_end_to_end_rows_match_reference_codes(tmp_path, rng, tiny_oracle):
    model, _, _ = tiny_oracle
    manifest = make_corpus(tmp_path, rng)
    rows = build_rows(manifest, engine_for(tiny_oracle))
    assert len(rows) == 12  # type1 + type2 per utterance
    by_id = {r["id"]: r["text"] for r in rows}
    e0 = manifest[0]
    t2 = by_id["dev-0_type2"]
    assert t2.startswith("<|begin_of_text|><|audio_start|>")
    assert t2.endswith(f"<|text_start|>{e0['text']}<|text_end|><|end_of_text|>")
    # codes in the doc decode to the exact torch-reference codes (16-bit PCM in)
    audio_str = t2.split("<|audio_start|>")[1].split("<|audio_end|>")[0]
    got = np.array(
        chars_to_codes(
            audio_str, 8, CODEBOOK_SIZE, return_tensors="np", unicode_offset=UNICODE_OFFSET_LARGE
        )
    )
    from tokenize_audio_tpu.io import read_wav

    pcm, _ = read_wav(e0["audio"])
    with torch.no_grad():
        ref = model.encode(torch.from_numpy(pcm).float()[None, None, :]).audio_codes[0, :8].numpy()
    assert (got == ref).all()


def test_process_split_and_resume(tmp_path, rng, tiny_oracle):
    manifest = make_corpus(tmp_path, rng)
    hub = LocalHub(str(tmp_path / "hub"))
    eng = engine_for(tiny_oracle)
    rep = process_split(
        manifest,
        "dev-clean",
        eng,
        hub,
        str(tmp_path / "prog"),
        str(tmp_path / "work"),
        chunk_rows=4,  # 2 utterances per chunk -> 3 chunks
    )
    assert rep.processed == 3
    files = hub.list_files("data/")
    assert files == [
        "data/dev-clean-00000-of-00003.parquet",
        "data/dev-clean-00001-of-00003.parquet",
        "data/dev-clean-00002-of-00003.parquet",
    ]
    rows = read_parquet(str(tmp_path / "hub" / files[0]))
    assert {r["id"] for r in rows} == {
        "dev-0_type1",
        "dev-0_type2",
        "dev-1_type1",
        "dev-1_type2",
    }

    # resume: nothing reprocessed
    rep2 = process_split(
        manifest,
        "dev-clean",
        eng,
        hub,
        str(tmp_path / "prog"),
        str(tmp_path / "work"),
        chunk_rows=4,
    )
    assert rep2.skipped == 3 and rep2.processed == 0

    # fresh progress dir but artifacts on hub -> still skipped (hub ledger)
    rep3 = process_split(
        manifest,
        "dev-clean",
        eng,
        hub,
        str(tmp_path / "prog2"),
        str(tmp_path / "work"),
        chunk_rows=4,
    )
    assert rep3.skipped == 3


def test_cli_smoke(tmp_path, rng, tiny_oracle, monkeypatch):
    """Drive the CLI main() with a tiny oracle injected."""
    import tokenize_audio_tpu.datasets.librispeech as mod

    _, params, cfg = tiny_oracle
    manifest = make_corpus(tmp_path, rng, n=2)
    mpath = str(tmp_path / "manifest.json")
    json.dump(manifest, open(mpath, "w"))

    def fake_load_engine(args):
        return MimiEncoderEngine(
            params, cfg, EngineConfig(batch_size=2, min_bucket_seconds=0.25, max_chunk_seconds=2.0)
        )

    monkeypatch.setattr(mod, "_load_engine", fake_load_engine)
    mod.main(
        [
            "--manifest",
            mpath,
            "--split",
            "test-tiny",
            "--hub",
            f"dir:{tmp_path}/hub2",
            "--progress-dir",
            str(tmp_path / "prog3"),
            "--work-dir",
            str(tmp_path / "work2"),
        ]
    )
    hub = LocalHub(str(tmp_path / "hub2"))
    assert hub.list_files() == ["data/test-tiny-00000-of-00001.parquet"]


def test_devtest_layout(tmp_path, rng, tiny_oracle):
    """dev/test layout: separate {split}_asr / {split}_tts artifacts."""
    from tokenize_audio_tpu.datasets.librispeech import process_split_devtest

    manifest = make_corpus(tmp_path, rng, n=3)
    hub = LocalHub(str(tmp_path / "hub_dt"))
    rep = process_split_devtest(
        manifest,
        "dev-clean",
        engine_for(tiny_oracle),
        hub,
        str(tmp_path / "prog_dt"),
        str(tmp_path / "work_dt"),
    )
    assert rep.processed == 1
    assert hub.list_files() == [
        "data/dev-clean_asr.parquet",
        "data/dev-clean_tts.parquet",
    ]
    asr = read_parquet(str(tmp_path / "hub_dt" / "data" / "dev-clean_asr.parquet"))
    assert [r["id"] for r in asr] == ["dev-0", "dev-1", "dev-2"]
    assert asr[0]["text"].startswith("<|begin_of_text|><|audio_start|>")
    # idempotent rerun
    rep2 = process_split_devtest(
        manifest,
        "dev-clean",
        engine_for(tiny_oracle),
        hub,
        str(tmp_path / "prog_dt2"),
        str(tmp_path / "work_dt"),
    )
    assert rep2.skipped == 1
