"""Pretrain format converter: code JSON -> accumulated parquet with
checkpoint/resume and upload-before-complete ordering."""

import json
import os

import numpy as np
import pytest

from tokenize_audio_tpu.config import CODEBOOK_SIZE, UNICODE_OFFSET_LARGE
from tokenize_audio_tpu.core.codes import chars_to_codes
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet
from tokenize_audio_tpu.datasets.pretrain_converter import (
    PretrainShardConverter,
    document_to_rows,
)
from tokenize_audio_tpu.hub import LocalHub


def make_entry(rng, audio_id, n_chunks=2, frames=3, k=32):
    text, codes = {}, {}
    for c in range(n_chunks):
        cid = f"{audio_id}-{c:05d}-000-100"
        text[cid] = f"chunk text {c}"
        codes[cid] = rng.integers(0, CODEBOOK_SIZE, size=(k, frames)).tolist()
    return {"audio_id": audio_id, "text": text, "codes": codes}


def test_document_to_rows(rng):
    e = make_entry(rng, "vid0")
    r1, r2 = document_to_rows(e, "en000/00000000")
    assert r1["id"] == "vid0_type1" and r2["id"] == "vid0_type2"
    assert r1["split"] == "en000/00000000"
    # 32-codebook input sliced to 8: audio span decodes to the first 8 books
    span = r1["text"].split("<|audio_start|>")[1].split("<|audio_end|>")[0]
    got = np.array(
        chars_to_codes(span, 8, CODEBOOK_SIZE, return_tensors="np", unicode_offset=UNICODE_OFFSET_LARGE)
    )
    cid = next(iter(e["codes"]))
    ref = np.array(e["codes"][cid])[:8]
    np.testing.assert_array_equal(got, ref)
    # empty / missing codes -> (None, None)
    assert document_to_rows({"audio_id": "x", "text": {}, "codes": {}}, "s") == (None, None)
    assert document_to_rows({"audio_id": "x"}, "s") == (None, None)


def _put_subshards(src, tmp_path, rng, shard="en000", n=4, entries_per=3):
    for i in range(n):
        sid = f"{i:08d}"
        data = [make_entry(rng, f"{shard}-{sid}-a{j}") for j in range(entries_per)]
        p = str(tmp_path / f"{sid}.json")
        json.dump(data, open(p, "w"))
        src.upload_file(p, f"{shard}/{sid}.json")
    return [f"{i:08d}" for i in range(n)]


def test_converter_accumulates_and_uploads(tmp_path, rng):
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    sids = _put_subshards(src, tmp_path, rng)
    conv = PretrainShardConverter(
        "en000",
        src,
        dst,
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        parquet_rows=10,  # 6 rows per subshard -> rolls over mid-stream
        upload_batch_size=1,
        checkpoint_interval=1,
    )
    rep = conv.run(sids)
    assert rep == {"processed": 4, "skipped": 0, "failed": 0}
    files = dst.list_files("data/")
    assert files == [
        "data/en000-00000.parquet",
        "data/en000-00001.parquet",
        "data/en000-00002.parquet",
    ]
    total_rows = sum(len(read_parquet(str(tmp_path / "dst" / f))) for f in files)
    assert total_rows == 4 * 3 * 2  # subshards x entries x (type1+type2)

    # resume: all skipped, no new parquets, counter persisted
    conv2 = PretrainShardConverter(
        "en000", src, dst, str(tmp_path / "work"), str(tmp_path / "prog"), parquet_rows=10
    )
    rep2 = conv2.run(sids)
    assert rep2 == {"processed": 0, "skipped": 4, "failed": 0}
    assert dst.list_files("data/") == files


def test_converter_crash_resume_no_duplicates(tmp_path, rng):
    """Kill after 2 sub-shards (before any upload); restart must not
    duplicate rows (accumulation checkpoint semantics)."""
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    sids = _put_subshards(src, tmp_path, rng, n=3)

    conv = PretrainShardConverter(
        "en000",
        src,
        dst,
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        parquet_rows=1000,  # never rolls during the partial run
        upload_batch_size=99,
        checkpoint_interval=1,
    )
    # process only the first two subshards, then "crash" (no finalize)
    for sid in sids[:2]:
        local = str(tmp_path / "work" / f"{sid}.json")
        src.download(f"en000/{sid}.json", local)
        conv.add_subshard(sid, json.load(open(local)))
    assert dst.list_files("data/") == []  # nothing uploaded yet

    # restart picks up the checkpointed rows and skips checkpointed subshards
    conv2 = PretrainShardConverter(
        "en000",
        src,
        dst,
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        parquet_rows=1000,
        upload_batch_size=1,
    )
    rep = conv2.run(sids)
    assert rep["processed"] == 1 and rep["skipped"] == 2
    files = dst.list_files("data/")
    assert len(files) == 1
    rows = read_parquet(str(tmp_path / "dst" / files[0]))
    assert len(rows) == 3 * 3 * 2  # every subshard exactly once
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_converter_failed_subshard_isolated(tmp_path, rng):
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    sids = _put_subshards(src, tmp_path, rng, n=2)
    conv = PretrainShardConverter(
        "en000", src, dst, str(tmp_path / "work"), str(tmp_path / "prog"), upload_batch_size=1
    )
    rep = conv.run(sids + ["99999999"])  # missing subshard
    assert rep["processed"] == 2 and rep["failed"] == 1
    prog = json.load(open(str(tmp_path / "prog" / "pretrain_en000_progress.json")))
    assert prog["failed"] == ["99999999"]


def test_orphan_parquet_requeued(tmp_path, rng):
    """A parquet emitted before a crash (rows already trimmed from the
    accumulator) is uploaded on restart instead of silently lost."""
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    sids = _put_subshards(src, tmp_path, rng, n=2)
    conv = PretrainShardConverter(
        "en000", src, dst, str(tmp_path / "work"), str(tmp_path / "prog"),
        parquet_rows=6, upload_batch_size=99, checkpoint_interval=1,
    )
    # process both subshards (12 rows -> two 6-row parquets emitted) but
    # "crash" before any upload (batch size 99, no finalize)
    for sid in sids:
        local = str(tmp_path / "work" / f"{sid}.json")
        src.download(f"en000/{sid}.json", local)
        conv.add_subshard(sid, json.load(open(local)))
    assert dst.list_files("data/") == []
    emitted = [f for f in os.listdir(str(tmp_path / "work")) if f.endswith(".parquet")]
    assert emitted  # rows left the accumulator

    conv2 = PretrainShardConverter(
        "en000", src, dst, str(tmp_path / "work"), str(tmp_path / "prog"),
        parquet_rows=6, upload_batch_size=1,
    )
    rep = conv2.run(sids)
    assert rep["failed"] == 0
    files = dst.list_files("data/")
    rows = [r for f in files for r in read_parquet(str(tmp_path / "dst" / f))]
    assert len(rows) == 2 * 3 * 2  # nothing lost
    assert len({r["id"] for r in rows}) == len(rows)  # nothing duplicated


def test_post_checkpoint_orphan_discarded_no_duplicates(tmp_path, rng):
    """Crash between parquet write and checkpoint save: the orphan's rows
    are still in the accumulator, so it must be discarded (not requeued)."""
    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    sids = _put_subshards(src, tmp_path, rng, n=1)
    conv = PretrainShardConverter(
        "en000", src, dst, str(tmp_path / "work"), str(tmp_path / "prog"),
        parquet_rows=1000, upload_batch_size=99, checkpoint_interval=1,
    )
    local = str(tmp_path / "work" / f"{sids[0]}.json")
    src.download(f"en000/{sids[0]}.json", local)
    conv.add_subshard(sids[0], json.load(open(local)))  # 6 rows accumulated
    # simulate: parquet emitted (counter advanced) but crash before the
    # rows-trim + checkpoint save
    conv._emit_parquet(list(conv.rows))
    assert any(f.endswith(".parquet") for f in os.listdir(str(tmp_path / "work")))

    conv2 = PretrainShardConverter(
        "en000", src, dst, str(tmp_path / "work"), str(tmp_path / "prog"),
        parquet_rows=1000, upload_batch_size=1,
    )
    rep = conv2.run(sids)
    files = dst.list_files("data/")
    rows = [r for f in files for r in read_parquet(str(tmp_path / "dst" / f))]
    assert len(rows) == 1 * 3 * 2  # exactly once, no duplicates
    assert len({r["id"] for r in rows}) == len(rows)
