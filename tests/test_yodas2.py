"""YODAS2 flagship processor: tarball corpus -> code JSONs on a fake hub,
with chunk slicing, long-chunk split, resume, and missing-stop semantics."""

import json
import os
import tarfile

import numpy as np
import pytest
import torch

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import LocalHub
from tokenize_audio_tpu.io import write_wav
from tokenize_audio_tpu.datasets.yodas2 import (
    LocalSource,
    SubShardProcessor,
    Yodas2ShardProcessor,
    is_json_complete,
    parse_chunk_id,
    slice_chunks,
)

SR = 24_000


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def make_engine(tiny_oracle, cap_s=2.0):
    _, params, cfg = tiny_oracle
    return MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=cap_s),
        num_codebooks=12,  # store all books like the reference raw stage
    )


def build_corpus(root, rng, shard="en000", subshards=2, audios_per=2):
    """Synthetic YODAS2 mirror: {shard}/{sid}.tar.gz with wavs + {sid}.json."""
    for s in range(subshards):
        sid = f"{s:08d}"
        sdir = os.path.join(root, shard)
        os.makedirs(sdir, exist_ok=True)
        wav_dir = os.path.join(root, f"_build_{sid}")
        os.makedirs(wav_dir, exist_ok=True)
        meta = []
        for a in range(audios_per):
            audio_id = f"vid-{sid}-{a}"  # hyphens in audio_id, like real ids
            dur_s = 3.0 + a
            audio = (rng.standard_normal(int(SR * dur_s)) * 0.3).astype(np.float32)
            write_wav(os.path.join(wav_dir, f"{audio_id}.wav"), audio, SR)
            text = {
                f"{audio_id}-00000-00000000-00000100": "first second",  # 0-1 s
                f"{audio_id}-00001-00000100-00000250": "next 1.5 s",  # 1-2.5 s
                f"{audio_id}-00002-00000250-00000250": "degenerate",  # skipped
            }
            if a == 1:
                # 3.5 s chunk > 2 s cap: exercises split+concat
                text[f"{audio_id}-00003-00000050-00000400"] = "long chunk"
            meta.append({"audio_id": audio_id, "text": text})
        with tarfile.open(os.path.join(sdir, f"{sid}.tar.gz"), "w:gz") as tf:
            tf.add(wav_dir, arcname="audio")
        with open(os.path.join(sdir, f"{sid}.json"), "w") as f:
            json.dump(meta, f)
    return root


def test_parse_chunk_id():
    assert parse_chunk_id("vid-ab-00001-00000100-00000250") == (100, 250)
    assert parse_chunk_id("v-00000-00000050-00000050") is None  # degenerate
    with pytest.raises(ValueError):
        parse_chunk_id("bad")
    with pytest.raises(ValueError):
        parse_chunk_id("v-00000-00000200-00000100")  # start > end


def test_slice_chunks(rng):
    audio = rng.standard_normal(SR * 3).astype(np.float32)
    text = {
        "a-00000-00000000-00000100": "x",
        "a-00001-00000100-00000100": "degenerate",
        "a-00002-00027000-00029000": "past end",
    }
    ids, segs = slice_chunks(audio, text, SR)
    assert ids == ["a-00000-00000000-00000100"]
    assert len(segs[0]) == SR  # 100 cs = 1 s


def test_subshard_end_to_end(tmp_path, rng, tiny_oracle):
    model, _, _ = tiny_oracle
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=1)
    src = LocalSource(root)
    eng = make_engine(tiny_oracle)
    sub = SubShardProcessor(eng, str(tmp_path / "work"), save_every=1)
    tar, txt = src.fetch("en000", "00000000", str(tmp_path / "work"))
    out_path = str(tmp_path / "work" / "00000000.json")
    entries = sub.process(tar, txt, out_path)
    assert is_json_complete(out_path)
    assert len(entries) == 2

    # exact parity incl. the >cap split chunk: reference splits into cap
    # pieces, encodes each standalone, concatenates (process_shard.py:459-493)
    e1 = entries[1]
    long_id = [c for c in e1["codes"] if c.endswith("-00003-00000050-00000400")][0]
    audio, _ = __import__("tokenize_audio_tpu.io", fromlist=["read_wav"]).read_wav(
        os.path.join(root, "_build_00000000", f"{e1['audio_id']}.wav")
    )
    seg = audio[int(50 * SR / 100) : int(400 * SR / 100)]
    cap = int(2.0 * SR)
    refs = []
    for i in range(0, len(seg), cap):
        piece = seg[i : i + cap]
        with torch.no_grad():
            refs.append(
                model.encode(torch.from_numpy(piece).float()[None, None, :])
                .audio_codes[0, :12]
                .numpy()
            )
    ref = np.concatenate(refs, axis=1)
    got = np.array(e1["codes"][long_id])
    assert got.dtype != object
    assert (got == ref).all()


def test_shard_processor_full_run_and_resume(tmp_path, rng, tiny_oracle):
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=3)
    hub = LocalHub(str(tmp_path / "hub"))
    proc = Yodas2ShardProcessor(
        "en000",
        LocalSource(root),
        hub,
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        max_subshards=20,
        max_consecutive_missing=5,
        upload_batch_size=2,
    )
    rep = proc.process()
    assert rep["processed"] == 3
    assert rep["uploaded"] == 3
    assert rep["missing"] == 5  # stopped after 5 consecutive missing
    files = hub.list_files("data/en000/")
    assert files == [f"data/en000/{i:08d}.json" for i in range(3)]

    # resume: all skipped
    proc2 = Yodas2ShardProcessor(
        "en000",
        LocalSource(root),
        hub,
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        max_subshards=20,
        max_consecutive_missing=5,
    )
    rep2 = proc2.process()
    assert rep2["processed"] == 0 and rep2["skipped"] == 3


def test_fetch_ahead_matches_serial(tmp_path, rng, tiny_oracle):
    """The fetch/extract look-ahead thread must produce the exact same hub
    contents, report, and progress as the serial (fetch_ahead=0) path."""
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=3)
    reports, contents = [], []
    for ahead in (0, 2):
        hub = LocalHub(str(tmp_path / f"hub{ahead}"))
        proc = Yodas2ShardProcessor(
            "en000",
            LocalSource(root),
            hub,
            make_engine(tiny_oracle),
            str(tmp_path / f"work{ahead}"),
            str(tmp_path / f"prog{ahead}"),
            max_subshards=20,
            max_consecutive_missing=5,
            fetch_ahead=ahead,
        )
        reports.append(proc.process())
        contents.append(
            {f: hub.read_range(f, 0, hub.size(f)) for f in hub.list_files("data/en000/")}
        )
    assert reports[0] == reports[1]
    assert contents[0] == contents[1]


def test_fetch_ahead_actually_overlaps(tmp_path, rng, tiny_oracle):
    """At fetch_ahead=1 the NEXT sub-shard's fetch must start while the
    current one is still processing (depth must be fetch_ahead+1 —
    prefetch_map keeps one queue slot occupied by the item being handed
    to the consumer, so depth=1 would serialize completely)."""
    import threading

    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=2)
    fetch_started: dict = {}

    class LogSource(LocalSource):
        def fetch(self, shard_id, sid, dest):
            fetch_started.setdefault(sid, threading.Event()).set()
            return super().fetch(shard_id, sid, dest)

    proc = Yodas2ShardProcessor(
        "en000",
        LogSource(root),
        LocalHub(str(tmp_path / "hub")),
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        max_subshards=10,
        max_consecutive_missing=5,
        fetch_ahead=1,
    )
    orig_process = proc.sub.process_deferred
    overlap_seen = []

    def wrapped(tar_path, txt_path, out_path):
        if "00000000" in os.path.basename(tar_path):
            ev = fetch_started.setdefault("00000001", threading.Event())
            overlap_seen.append(ev.wait(timeout=30))
        return orig_process(tar_path, txt_path, out_path)

    proc.sub.process_deferred = wrapped
    rep = proc.process()
    assert rep["processed"] == 2
    assert overlap_seen == [True], "fetch of sub-shard 1 never overlapped processing of 0"


def test_subshard_completion_overlaps_next_dispatch(tmp_path, rng, tiny_oracle):
    """The shard loop dispatches sub-shard k+1 BEFORE completing k (drain/
    assemble/upload-queue), so k's tail drain overlaps k+1's decode and
    dispatch — the cross-sub-shard half of the write-behind design. The
    outputs must still be byte-identical to the eager path."""
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=3)
    proc = Yodas2ShardProcessor(
        "en000",
        LocalSource(root),
        LocalHub(str(tmp_path / "hub")),
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        max_subshards=10,
        max_consecutive_missing=5,
    )
    events = []
    orig = proc.sub.process_deferred

    def wrapped(tar_path, txt_path, out_path):
        sid = os.path.basename(tar_path).split(".")[0]
        events.append(("dispatch", sid))
        complete = orig(tar_path, txt_path, out_path)

        def logged_complete():
            events.append(("complete", sid))
            return complete()

        return logged_complete

    proc.sub.process_deferred = wrapped
    rep = proc.process()
    assert rep["processed"] == 3
    assert events == [
        ("dispatch", "00000000"),
        ("dispatch", "00000001"),
        ("complete", "00000000"),
        ("dispatch", "00000002"),
        ("complete", "00000001"),
        ("complete", "00000002"),
    ]


def test_fetch_ahead_failure_isolated(tmp_path, rng, tiny_oracle):
    """A fetch/extract failure in the look-ahead thread marks only that
    sub-shard failed; the rest of the shard still processes."""
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=3)

    class FlakySource(LocalSource):
        def fetch(self, shard_id, sid, dest):
            if sid == "00000001":
                raise OSError("simulated download failure")
            return super().fetch(shard_id, sid, dest)

    hub = LocalHub(str(tmp_path / "hub"))
    proc = Yodas2ShardProcessor(
        "en000",
        FlakySource(root),
        hub,
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
        max_subshards=20,
        max_consecutive_missing=5,
        fetch_ahead=1,
    )
    rep = proc.process()
    assert rep["processed"] == 2 and rep["failed"] == 1
    assert hub.list_files("data/en000/") == [
        "data/en000/00000000.json",
        "data/en000/00000002.json",
    ]
    assert list(proc.progress.failed) == ["00000001"]


def test_scan_and_queue_local(tmp_path, rng, tiny_oracle):
    """A complete local output left by a crash is uploaded without re-encode
    (process_shard.py:851-915)."""
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=1)
    hub = LocalHub(str(tmp_path / "hub"))
    work = str(tmp_path / "work")
    os.makedirs(os.path.join(work, "en000"), exist_ok=True)
    orphan = [{"audio_id": "vid-x", "text": {}, "codes": {"c": [[1, 2]]}}]
    with open(os.path.join(work, "en000", "00000005.out.json"), "w") as f:
        json.dump(orphan, f)
    with open(os.path.join(work, "en000", "00000006.out.json"), "w") as f:
        json.dump([{"audio_id": "vid-y", "text": {}}], f)  # incomplete: no codes

    proc = Yodas2ShardProcessor(
        "en000",
        LocalSource(root),
        hub,
        make_engine(tiny_oracle),
        work,
        str(tmp_path / "prog"),
        max_subshards=1,
        max_consecutive_missing=3,
    )
    proc.process()
    assert hub.exists("data/en000/00000005.json")
    assert not hub.exists("data/en000/00000006.json")
    # incomplete output stays local: it is the retry's resume set (only the
    # completeness gate keeps it off the hub)
    assert os.path.exists(os.path.join(work, "en000", "00000006.out.json"))


def test_url_source_head_and_stream(tmp_path):
    """UrlSource HEAD-checks availability and streams tar+json from raw
    URLs (process_shard.py:313-341, :944-985) — served by a loopback
    HTTP server."""
    import http.server
    import threading

    from tokenize_audio_tpu.datasets.yodas2 import UrlSource

    root = tmp_path / "www"
    (root / "en000").mkdir(parents=True)
    (root / "en000" / "00000000.tar.gz").write_bytes(b"TARBYTES")
    (root / "en000" / "00000000.json").write_bytes(b"{}")

    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(root), **k
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        src = UrlSource(base, max_retries=2, base_delay=0.01)
        assert src.available("en000", "00000000") is True
        assert src.available("en000", "00000001") is False
        tar, txt = src.fetch("en000", "00000000", str(tmp_path / "dl"))
        assert open(tar, "rb").read() == b"TARBYTES"
        assert open(txt, "rb").read() == b"{}"
    finally:
        srv.shutdown()


def test_partial_save_never_uploaded_as_complete(tmp_path, rng, tiny_oracle):
    """A crash between incremental saves leaves a .partial file, which the
    startup scan must NOT upload as a finished sub-shard (r2 review: the
    old prefix-write passed is_json_complete and permanently lost the
    tail); the rerun resumes from the partial and produces the full set."""
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=1, audios_per=2)
    hub = LocalHub(str(tmp_path / "hub"))

    def make_proc(engine):
        return Yodas2ShardProcessor(
            "en000",
            LocalSource(root),
            hub,
            engine,
            str(tmp_path / "work"),
            str(tmp_path / "prog"),
            max_subshards=1,
            save_every=1,  # save after every entry so a crash leaves a prefix
        )

    # crash after the first entry is processed (and incrementally saved)
    engine = make_engine(tiny_oracle)
    real = engine.encode_batch
    calls = {"n": 0}

    def crashing(*a, **k):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("simulated crash mid-sub-shard")
        return real(*a, **k)

    engine.encode_batch = crashing
    rep = make_proc(engine).process()
    assert rep["failed"] == 1 and rep["uploaded"] == 0
    work = tmp_path / "work" / "en000"
    assert any(f.name.endswith(".out.json.partial") for f in work.iterdir())
    assert not any(f.name.endswith(".out.json") for f in work.iterdir())
    assert hub.list_files("data/en000/") == []  # nothing truncated uploaded

    # rerun: completes from the partial without losing entries
    rep2 = make_proc(make_engine(tiny_oracle)).process()
    assert rep2["processed"] == 1 and rep2["uploaded"] == 1
    out = read_json_file(hub, "data/en000/00000000.json")
    assert len(out) == 2 and all("codes" in e for e in out)


def read_json_file(hub, path):
    import json as _json
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        local = os.path.join(td, "x.json")
        hub.download(path, local)
        return _json.load(open(local))


def test_failed_entries_block_upload_then_retry_succeeds(tmp_path, rng, tiny_oracle):
    """An entry whose audio cannot be decoded leaves the sub-shard output
    incomplete: it must NOT be uploaded/marked completed (r2 review); the
    restart retries just the failed entries and then uploads."""
    root = build_corpus(str(tmp_path / "mirror"), rng, subshards=1, audios_per=2)
    # corrupt one wav INSIDE the tarball
    import tarfile as _tar

    sdir = os.path.join(root, "en000")
    tar_path = os.path.join(sdir, "00000000.tar.gz")
    tmp_ex = tmp_path / "ex"
    with _tar.open(tar_path) as tf:
        tf.extractall(tmp_ex, filter="data")
    wavs = sorted((tmp_ex / "audio").glob("*.wav"))
    wavs[0].write_bytes(b"RIFFbroken")
    with _tar.open(tar_path, "w:gz") as tf:
        tf.add(tmp_ex / "audio", arcname="audio")

    hub = LocalHub(str(tmp_path / "hub"))

    def make_proc():
        return Yodas2ShardProcessor(
            "en000",
            LocalSource(root),
            hub,
            make_engine(tiny_oracle),
            str(tmp_path / "work"),
            str(tmp_path / "prog"),
            max_subshards=1,
            max_consecutive_missing=2,
        )

    rep = make_proc().process()
    assert rep["failed"] == 1 and rep["uploaded"] == 0
    assert hub.list_files("data/en000/") == []

    # repair the corpus (as if the transient read error cleared) and retry
    build_corpus(str(tmp_path / "mirror2"), rng, subshards=1, audios_per=2)
    import shutil as _sh

    _sh.copyfile(
        os.path.join(str(tmp_path / "mirror2"), "en000", "00000000.tar.gz"), tar_path
    )
    rep2 = make_proc().process()
    assert rep2["processed"] == 1 and rep2["uploaded"] == 1
    assert hub.exists("data/en000/00000000.json")


def test_entry_json_fast_path_parses_identically():
    """_entry_to_json's LUT fast path (io/jsonfast.py) must parse to
    exactly what the old tolist+json.dumps form produced — the uint16 JSON
    int-list format is the reference's storage contract
    (yodas2-mimi/process_shard.py:520-523)."""
    from tokenize_audio_tpu.datasets.yodas2 import _entry_to_json

    rng = np.random.default_rng(3)
    e = {
        "audio_id": "vid-x",
        "text": {"vid-x-00000-00000000-00000150": "hi"},
        "codes": {
            "vid-x-00000-00000000-00000150": rng.integers(
                0, 2048, size=(12, 17), dtype=np.uint16
            ),
            "empty": np.zeros((12, 0), dtype=np.uint16),
        },
    }
    legacy = json.dumps(
        {**e, "codes": {c: np.asarray(v).tolist() for c, v in e["codes"].items()}}
    )
    assert json.loads(_entry_to_json(e)) == json.loads(legacy)
    # codes-less entries (failed audio) serialize unchanged
    assert json.loads(_entry_to_json({"audio_id": "y"})) == {"audio_id": "y"}


def test_int_matrix_to_json_contract():
    """The fast serializer round-trips every shape/edge the pipeline can
    produce and falls back to json.dumps outside the uint16 range."""
    from tokenize_audio_tpu.io.jsonfast import int_matrix_to_json as f

    rng = np.random.default_rng(0)
    for a in (
        rng.integers(0, 65536, size=(8, 301), dtype=np.uint16),
        np.array([0, 9, 10, 99, 100, 65535], dtype=np.uint16),
        np.zeros((4, 0), dtype=np.uint16),
        np.zeros((0, 4), dtype=np.int32),
        np.zeros(0, dtype=np.uint16),
        np.array([[70000, -3]], dtype=np.int64),  # out of range: fallback
        np.array([1.5, 2.5]),  # non-integer: fallback
    ):
        assert json.loads(f(a)) == json.loads(json.dumps(np.asarray(a).tolist()))
