"""Full-stack pipeline integration: one LocalHub tree carries artifacts
through every layer of SURVEY §1 — L2 encode (YODAS2 flagship) -> L4 format
conversion (pretrain parquet) -> L4 derivative builders (asr/acoustic/
semantic) -> L5 BPE (sampler + trainer) -> L5 analytics (validate,
estimate_tokens). Each stage consumes exactly what the previous stage
published, proving the emitted formats are mutually consumable — the
cross-layer contract the reference validates only operationally (its L4
stages read L2's real HF uploads, e.g. prepare_pretraining_data.py:381-398,
build_yodas2_mm_semantic.py, sample_yodas2_codes_from_hf.py:170-263).
"""

import json
import os

import numpy as np
import pytest

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tests.test_yodas2 import build_corpus
from tokenize_audio_tpu.analytics.estimate_tokens import TokenEstimator
from tokenize_audio_tpu.analytics.validate import validate_rows
from tokenize_audio_tpu.bpe.sampler import CodeSampler, pick_subshards
from tokenize_audio_tpu.bpe.trainer import CodecBPETrainer
from tokenize_audio_tpu.config import (
    CODEBOOK_SIZE,
    EngineConfig,
    NUM_CODEBOOKS,
    SPECIAL_TOKENS,
    UNICODE_OFFSET_LARGE,
)
from tokenize_audio_tpu.core.codes import codes_to_chars
from tokenize_audio_tpu.datasets.derivatives import process_shards
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet
from tokenize_audio_tpu.datasets.pretrain_converter import PretrainShardConverter
from tokenize_audio_tpu.datasets.yodas2 import LocalSource, Yodas2ShardProcessor
from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import LocalHub

AUDIO_SPAN_START, AUDIO_SPAN_END = SPECIAL_TOKENS["audio_start"], SPECIAL_TOKENS["audio_end"]


def _audio_spans(text):
    out, rest = [], text
    while AUDIO_SPAN_START in rest:
        _, rest = rest.split(AUDIO_SPAN_START, 1)
        span, rest = rest.split(AUDIO_SPAN_END, 1)
        out.append(span)
    return out


def _all_rows(hub, prefix, tmp_path):
    rows = []
    for f in sorted(hub.list_files(prefix)):
        if f.endswith(".parquet"):
            local = str(tmp_path / os.path.basename(f))
            hub.download(f, local)
            rows += read_parquet(local)
    return rows


@pytest.mark.slow
def test_full_stack_l2_to_l5(tmp_path, rng):
    subshards = ["00000000", "00000001"]

    # ---- L2: YODAS2 shard encode (raw code JSONs onto the hub) ----
    mirror = build_corpus(str(tmp_path / "mirror"), rng, subshards=2, audios_per=2)
    _, params, cfg = make_oracle(tiny_hf_config())
    engine = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=2.0),
        num_codebooks=12,  # raw stage stores all books (SURVEY §0)
    )
    hub = LocalHub(str(tmp_path / "hub"))
    rep = Yodas2ShardProcessor(
        "en000",
        LocalSource(mirror),
        hub,
        engine,
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        max_subshards=2,
        max_consecutive_missing=2,
        upload_batch_size=1,
        save_every=1,
    ).process()
    assert rep["processed"] == 2 and rep["failed"] == 0

    raw = {}  # audio_id -> {chunk_id: np.ndarray (K, T)} in emission order
    for sid in subshards:
        local = str(tmp_path / f"{sid}.json")
        hub.download(f"data/en000/{sid}.json", local)
        for entry in json.load(open(local)):
            raw[entry["audio_id"]] = {
                cid: np.asarray(c, dtype=np.int32)
                for cid, c in entry["codes"].items()
                if c
            }
    assert len(raw) == 4 and all(next(iter(v.values())).shape[0] == 12 for v in raw.values())

    # ---- L4: pretrain-format conversion (code JSON -> interleaved parquet) ----
    conv = PretrainShardConverter(
        "en000",
        hub,
        hub,
        str(tmp_path / "conv_work"),
        str(tmp_path / "conv_prog"),
        parquet_rows=5,  # force a mid-run rollover + a finalize flush
        upload_batch_size=1,
    )
    crep = conv.run(subshards, source_prefix="data/")
    assert crep == {"processed": 2, "skipped": 0, "failed": 0}

    pretrain_rows = _all_rows(hub, "data/", tmp_path / "dl")
    pretrain_rows = [r for r in pretrain_rows if r["id"].endswith(("_type1", "_type2"))]
    assert len(pretrain_rows) == 8  # 4 audios x (type1 + type2)

    # the QA gate passes on what the converter published
    qa = validate_rows(pretrain_rows, NUM_CODEBOOKS)
    assert qa["bad_rows"] == 0, qa

    # cross-layer consistency: every type2 document's audio spans decode to
    # exactly the raw stage's codes, first 8 books, chunk for chunk
    for r in pretrain_rows:
        if not r["id"].endswith("_type2"):
            continue
        audio_id = r["id"][: -len("_type2")]
        expect = [
            codes_to_chars(c[:NUM_CODEBOOKS], CODEBOOK_SIZE, unicode_offset=UNICODE_OFFSET_LARGE)
            for c in raw[audio_id].values()
        ]
        assert _audio_spans(r["text"]) == expect

    # ---- L4: derivative builders over the pretrain parquet ----
    derived = {}
    for mode in ("asr", "acoustic", "semantic"):
        dhub = LocalHub(str(tmp_path / f"hub_{mode}"))
        drep = process_shards(
            mode,
            hub,
            dhub,
            str(tmp_path / f"prog_{mode}"),
            str(tmp_path / f"work_{mode}"),
            prefix="data/",
            upload_batch_size=1,
        )
        assert drep.failed == 0 and drep.processed == 2
        derived[mode] = {r["id"]: r for r in _all_rows(dhub, "data/", tmp_path / f"dl_{mode}")}

    # builders keep only the _type2 rows, stripping the suffix from ids
    assert sorted(derived["asr"]) == sorted(
        r["id"][: -len("_type2")] for r in pretrain_rows if r["id"].endswith("_type2")
    )
    for rid, row in derived["acoustic"].items():
        assert SPECIAL_TOKENS["text_start"] not in row["text"]
        # semantic = codebook-0 char per frame: every 8th char of each span
        sem_spans = _audio_spans(derived["semantic"][rid]["text"])
        ac_spans = _audio_spans(row["text"])
        assert sem_spans == [s[::NUM_CODEBOOKS] for s in ac_spans]

    # ---- L5: BPE corpus sampling + tokenizer training on the raw codes ----
    picks = pick_subshards({"en000": subshards}, per_shard=2, seed=7)
    npy_dir = str(tmp_path / "npys")
    srep = CodeSampler(hub, npy_dir, num_codebooks=NUM_CODEBOOKS).sample(picks)
    assert srep["processed"] == 2

    trainer = CodecBPETrainer(
        NUM_CODEBOOKS,
        CODEBOOK_SIZE,
        vocab_size=NUM_CODEBOOKS * CODEBOOK_SIZE + 1,  # the 16k no-merge recipe
        eos_token=SPECIAL_TOKENS["eos"],
        max_token_codebook_ngrams=0,
        unicode_offset=UNICODE_OFFSET_LARGE,
    )
    tok = trainer.train(npy_dir)
    assert len(tok) == NUM_CODEBOOKS * CODEBOOK_SIZE + 1

    # every audio-span char of the published documents is a single known
    # token — the alphabet covers the corpus with no UNKs and no splits
    span = _audio_spans(pretrain_rows[0]["text"])[0]
    ids = tok.encode(span)
    assert len(ids) == len(span)
    assert tok.decode(ids) == span

    # ---- L5: analytics over the published parquet with the trained tokenizer ----
    est = TokenEstimator(tok).estimate_hub_dataset(hub, prefix="data/", sample_rows=64)
    assert est["all"]["total_rows"] == len(pretrain_rows)
    assert est["all"]["sampled_rows"] > 0
    assert est["all"]["estimated_total_tokens"] > 0
