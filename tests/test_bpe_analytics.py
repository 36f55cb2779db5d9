"""Codec-BPE training, tokenizer extension, sampler, and analytics."""

import json

import numpy as np
import pytest

from tokenize_audio_tpu.bpe.sampler import CodeSampler, codes_from_entries, pick_subshards
from tokenize_audio_tpu.bpe.trainer import CodecBPETrainer, extend_tokenizer, load_codes_file
from tokenize_audio_tpu.core.codes import codes_to_chars
from tokenize_audio_tpu.hub import LocalHub

K, S, OFF = 4, 16, 0xE000  # small codec for fast training


def make_npy(tmp_path, rng, name="codes_0.npy", n_utts=40, frames=64):
    arrays = [
        rng.integers(0, S, size=(K, frames), dtype=np.uint16) for _ in range(n_utts)
    ]
    # bias the data so BPE has frequent pairs to merge
    for a in arrays[: n_utts // 2]:
        a[:, ::2] = 3
    p = str(tmp_path / name)
    obj = np.empty(len(arrays), dtype=object)
    obj[:] = arrays
    np.save(p, obj, allow_pickle=True)
    return p, arrays


def test_load_codes_file_formats(tmp_path, rng):
    p, arrays = make_npy(tmp_path, rng, n_utts=3)
    loaded = load_codes_file(p)
    assert len(loaded) == 3
    np.testing.assert_array_equal(loaded[0], arrays[0])
    # single plain array
    single = rng.integers(0, S, size=(1, K, 10))
    p2 = str(tmp_path / "single.npy")
    np.save(p2, single)
    (got,) = load_codes_file(p2)
    assert got.shape == (K, 10)  # (1,K,T) squeezed


def test_trainer_no_merge_alphabet_only(tmp_path, rng):
    make_npy(tmp_path, rng)
    tr = CodecBPETrainer(
        K, S, vocab_size=K * S + 2, eos_token="<eos>", unk_token="<unk>",
        max_token_codebook_ngrams=0, unicode_offset=OFF,
    )
    tok = tr.train(str(tmp_path))
    # vocab = alphabet + specials, every token one char
    assert len(tok) == K * S + 2
    codes = rng.integers(0, S, size=(K, 5), dtype=np.int64)
    s = codes_to_chars(codes, S, unicode_offset=OFF)
    ids = tok.encode(s)
    assert len(ids) == K * 5  # no merges: one token per code char


def test_trainer_with_merges_and_ngram_cap(tmp_path, rng):
    make_npy(tmp_path, rng)
    tr = CodecBPETrainer(
        K, S, codec_framerate=12.5, chunk_size_secs=2,
        vocab_size=K * S + 64, min_frequency=2,
        eos_token="<eos>", unk_token="<unk>",
        max_token_codebook_ngrams=2, unicode_offset=OFF,
    )
    tok = tr.train(str(tmp_path))
    assert len(tok) > K * S + 2  # merges learned
    vocab = tok.get_vocab()
    assert max(len(t) for t in vocab if not t.startswith("<")) <= 2 * K
    # round-trip: decode(encode(s)) == s for a code stream
    codes = rng.integers(0, S, size=(K, 8), dtype=np.int64)
    s = codes_to_chars(codes, S, unicode_offset=OFF)
    assert tok.decode(tok.encode(s)) == s


def test_trainer_vocab_too_small():
    with pytest.raises(ValueError, match="minimum"):
        CodecBPETrainer(K, S, vocab_size=10, eos_token="<eos>")


def test_extend_tokenizer(tmp_path, rng):
    make_npy(tmp_path, rng)
    base = CodecBPETrainer(
        2, 4, vocab_size=2 * 4 + 1, eos_token="<eos>", max_token_codebook_ngrams=0,
        unicode_offset=0xF000,
    ).train(str(tmp_path))
    before = len(base)
    out = extend_tokenizer(
        base, num_codebooks=K, codebook_size=S, unicode_offset=OFF,
        special_tokens=["<|audio_start|>", "<|audio_end|>"],
    )
    assert len(out) == before + K * S + 2
    ids = out.encode(chr(OFF) + "<|audio_start|>")
    assert len(ids) == 2


def test_sampler(tmp_path, rng):
    hub = LocalHub(str(tmp_path / "hub"))
    for shard in ("en000", "en001"):
        for i in range(4):
            entries = [
                {
                    "audio_id": f"{shard}-a{i}",
                    "codes": {"c0": rng.integers(0, S, size=(32, 6)).tolist(), "c1": []},
                }
            ]
            p = tmp_path / "tmp.json"
            p.write_text(json.dumps(entries))
            hub.upload_file(str(p), f"data/{shard}/{i:08d}.json")

    shard_subs = {
        "en000": [f"{i:08d}" for i in range(4)],
        "en001": [f"{i:08d}" for i in range(4)],
    }
    picks = pick_subshards(shard_subs, per_shard=2, seed=7)
    assert len(picks) == 4
    assert picks == pick_subshards(shard_subs, per_shard=2, seed=7)  # deterministic

    out_dir = str(tmp_path / "npys")
    sampler = CodeSampler(hub, out_dir, num_codebooks=8)
    rep = sampler.sample(picks)
    assert rep["processed"] == 4
    loaded = load_codes_file(f"{out_dir}/{picks[0][0]}_{picks[0][1]}.npy")
    assert loaded[0].shape == (8, 6)  # 32 books sliced to 8, empty chunk dropped

    # append-only resume
    rep2 = sampler.sample(picks)
    assert rep2 == {"processed": 0, "skipped": 4, "failed": 0}


def test_codes_from_entries_slices():
    entries = [{"codes": {"a": [[1, 2], [3, 4], [5, 6]]}}]
    out = codes_from_entries(entries, num_codebooks=2)
    assert out[0].shape == (2, 2) and out[0].dtype == np.uint16


def test_analytics_count_and_estimate(tmp_path, rng):
    from tokenize_audio_tpu.analytics.count_rows import count_hub_dataset, stats_markdown
    from tokenize_audio_tpu.analytics.estimate_tokens import TokenEstimator
    from tokenize_audio_tpu.datasets.parquet_utils import write_parquet

    hub = LocalHub(str(tmp_path / "hub"))
    for grp, n in (("en", 3), ("de", 2)):
        rows = [{"id": f"{grp}{i}", "text": "ab " * (i + 1)} for i in range(n)]
        local = write_parquet(rows, str(tmp_path / f"{grp}.parquet"))
        hub.upload_file(local, f"{grp}/part0.parquet")

    groups = count_hub_dataset(hub, group_depth=1)
    assert groups["en"]["rows"] == 3 and groups["de"]["rows"] == 2
    md = stats_markdown(groups)
    assert "| **total** | 2 | 5 |" in md

    class WSTok:  # whitespace "tokenizer"
        def encode(self, t):
            return t.split()

    est = TokenEstimator(WSTok())
    result = est.estimate_hub_dataset(hub, group_depth=1, sample_rows=100)
    assert result["en"]["total_rows"] == 3
    assert result["en"]["estimated_total_tokens"] == 6  # 1+2+3 "ab" tokens
    strat = est.stratified_estimate({"en": ["a b", "c"]}, {"en": 10})
    assert strat["en"]["estimated_total_tokens"] == 15
    assert strat["_total"]["estimated_total_tokens"] == 15

    # resume: already-estimated groups are returned verbatim (not
    # recomputed), and on_group fires only for the fresh ones — the
    # per-group checkpoint grain behind the CLI's --output resume
    sentinel = {"estimated_total_tokens": -1}
    seen = []
    result2 = est.estimate_hub_dataset(
        hub,
        group_depth=1,
        sample_rows=100,
        resume={"en": sentinel},
        on_group=lambda k, s: seen.append(k),
    )
    assert result2["en"] is sentinel
    assert seen == ["de"]
    assert result2["de"] == result["de"]


def test_range_reader_footer_only_counting(tmp_path, rng):
    """count_parquet_rows_remote reads only the footer: a few KB of ranged
    reads regardless of data size (count_dataset_rows.py:66-88 contract)."""
    from tokenize_audio_tpu.analytics.count_rows import (
        RangeReader,
        count_parquet_rows_remote,
    )
    from tokenize_audio_tpu.datasets.parquet_utils import write_parquet

    hub = LocalHub(str(tmp_path / "hub"))
    rows = [
        {"id": f"r{i}", "text": rng.bytes(2000).hex()} for i in range(500)
    ]  # incompressible payload so the file is genuinely big on disk
    local = write_parquet(rows, str(tmp_path / "big.parquet"))
    hub.upload_file(local, "data/big.parquet")
    total = hub.size("data/big.parquet")
    assert total > 100_000  # the payload is actually big

    rd = RangeReader(hub, "data/big.parquet")
    import pyarrow.parquet as pq

    assert pq.ParquetFile(rd).metadata.num_rows == 500
    assert rd.bytes_read < 0.1 * total, (rd.bytes_read, total)
    assert count_parquet_rows_remote(hub, "data/big.parquet") == 500

    # RangeReader file-like semantics
    rd2 = RangeReader(hub, "data/big.parquet")
    rd2.seek(-4, 2)
    assert rd2.read() == b"PAR1"
    rd2.seek(0)
    assert rd2.read(4) == b"PAR1"


def test_estimate_tokens_partial_transfer(tmp_path, rng):
    """Sampling reads one row group's text column, not whole files."""
    from tokenize_audio_tpu.analytics import count_rows as cr
    from tokenize_audio_tpu.analytics.estimate_tokens import TokenEstimator
    from tokenize_audio_tpu.datasets.parquet_utils import write_parquet

    hub = LocalHub(str(tmp_path / "hub"))
    # two columns: small text + a fat payload column the estimator must skip
    rows = [
        {"id": f"r{i}", "text": "tok tok tok", "payload": rng.bytes(4000).hex()}
        for i in range(300)
    ]
    local = write_parquet(rows, str(tmp_path / "f.parquet"))
    hub.upload_file(local, "all/f.parquet")
    total = hub.size("all/f.parquet")

    transferred = []
    orig = cr.RangeReader

    class CountingReader(orig):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            transferred.append(self)

    import tokenize_audio_tpu.analytics.estimate_tokens as et

    old = et.RangeReader
    et.RangeReader = CountingReader
    try:
        class WSTok:
            def encode(self, t):
                return t.split()

        res = TokenEstimator(WSTok()).estimate_hub_dataset(hub, sample_rows=20)
    finally:
        et.RangeReader = old
    assert res["all"]["total_rows"] == 300
    assert res["all"]["mean_tokens_per_row"] == 3.0
    assert res["all"]["estimated_total_tokens"] == 900
    read = sum(r.bytes_read for r in transferred)
    assert read < 0.5 * total, (read, total)  # skipped the fat column


def test_estimate_with_rows_distribution(tmp_path, rng):
    """Stratified mode: known rows-by-group (count_rows output format)
    replaces footer counting (estimate_tokens_stratified.py semantics)."""
    from tokenize_audio_tpu.analytics.estimate_tokens import TokenEstimator
    from tokenize_audio_tpu.datasets.parquet_utils import write_parquet

    hub = LocalHub(str(tmp_path / "hub"))
    rows = [{"id": f"r{i}", "text": "a b"} for i in range(5)]
    local = write_parquet(rows, str(tmp_path / "f.parquet"))
    hub.upload_file(local, "en/f.parquet")

    class WSTok:
        def encode(self, t):
            return t.split()

    est = TokenEstimator(WSTok())
    res = est.estimate_hub_dataset(
        hub, group_depth=1, rows_distribution={"en": {"files": 99, "rows": 1000}}
    )
    assert res["en"]["total_rows"] == 1000
    assert res["en"]["estimated_total_tokens"] == 2000


def test_stats_markdown_with_tokens():
    """Num Tokens column merge: XXX for missing groups, total sums only
    existing estimates (update_stats_with_tokens.py semantics)."""
    from tokenize_audio_tpu.analytics.count_rows import stats_markdown

    groups = {
        "en": {"files": 2, "rows": 100},
        "de": {"files": 1, "rows": 50},
    }
    tokens = {"en": {"estimated_total_tokens": 1234}, "_total": {"estimated_total_tokens": 1234}}
    md = stats_markdown(groups, tokens)
    assert "| en | 2 | 100 | 1,234 |" in md
    assert "| de | 1 | 50 | XXX |" in md
    assert "| **total** | 3 | 150 | 1,234 |" in md
