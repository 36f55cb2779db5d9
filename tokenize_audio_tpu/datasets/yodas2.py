"""YODAS2 web-scale shard processor — the flagship pipeline.

Capability equivalent of ``yodas2-mimi/process_shard.py`` (1169 lines):
per sub-shard, fetch an audio tarball + chunk-transcript JSON, slice each
audio by centisecond chunk ids ``{audio}-{idx:05d}-{start_cs:08d}-
{end_cs:08d}`` (:400-427), batch-encode all chunks (>60 s chunks split and
re-concatenated, :436-493), store ALL codebooks as uint16 lists in the
entry's ``codes`` field (:520-523 — the 8-book slice happens downstream in
the pretrain converter), save incrementally for mid-sub-shard resume
(:549-569), validate completeness before upload (:792-824), and at the
shard level enumerate sub-shards ``{i:08d}`` with availability checks and a
``max_consecutive_missing`` stop (:933-985, :1050-1069), progress JSON, and
batched hub uploads (:1002-1033).

Sources are pluggable: ``LocalSource`` reads ``{sid}.tar.gz`` + ``{sid}.json``
from a directory tree (tests, pre-mirrored corpora); ``HubSource`` pulls the
same layout from any ArtifactStore (incl. HFHub for the real corpus).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
import subprocess
import tarfile
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import wait as futures_wait
from typing import Dict, Iterator, List, Optional, Protocol, Tuple

import numpy as np

from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import open_hub
from tokenize_audio_tpu.io import decode_audio
from tokenize_audio_tpu.io.jsonfast import int_matrix_to_json
from tokenize_audio_tpu.io.prefetch import prefetch_map
from tokenize_audio_tpu.runner import (
    ShardProgress,
    append_jsonl_lines,
    atomic_write_text,
    read_json,
    read_jsonl,
)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------

class Yodas2Source(Protocol):
    def available(self, shard_id: str, subshard_id: str) -> bool: ...

    def fetch(self, shard_id: str, subshard_id: str, dest_dir: str) -> Tuple[str, str]:
        """Return (audio_tar_path, text_json_path) placed under dest_dir."""


class LocalSource:
    """Directory tree: {root}/{shard}/{subshard}.tar.gz + {subshard}.json."""

    def __init__(self, root: str):
        self.root = root

    def _paths(self, shard_id: str, subshard_id: str) -> Tuple[str, str]:
        base = os.path.join(self.root, shard_id, subshard_id)
        return f"{base}.tar.gz", f"{base}.json"

    def available(self, shard_id: str, subshard_id: str) -> bool:
        tar, txt = self._paths(shard_id, subshard_id)
        return os.path.exists(tar) and os.path.exists(txt)

    def fetch(self, shard_id: str, subshard_id: str, dest_dir: str) -> Tuple[str, str]:
        tar, txt = self._paths(shard_id, subshard_id)
        os.makedirs(dest_dir, exist_ok=True)
        dtar = os.path.join(dest_dir, os.path.basename(tar))
        dtxt = os.path.join(dest_dir, os.path.basename(txt))
        shutil.copyfile(tar, dtar)
        shutil.copyfile(txt, dtxt)
        return dtar, dtxt


class HubSource:
    """Same layout served from an ArtifactStore (e.g. hf:espnet/yodas2)."""

    def __init__(self, hub, prefix: str = ""):
        self.hub = hub
        self.prefix = prefix

    def _repo(self, shard_id: str, subshard_id: str) -> Tuple[str, str]:
        base = f"{self.prefix}{shard_id}/{subshard_id}"
        return f"{base}.tar.gz", f"{base}.json"

    def available(self, shard_id: str, subshard_id: str) -> bool:
        tar, txt = self._repo(shard_id, subshard_id)
        return self.hub.exists(tar) and self.hub.exists(txt)

    def fetch(self, shard_id: str, subshard_id: str, dest_dir: str) -> Tuple[str, str]:
        tar, txt = self._repo(shard_id, subshard_id)
        dtar = os.path.join(dest_dir, os.path.basename(tar))
        dtxt = os.path.join(dest_dir, os.path.basename(txt))
        self.hub.download(tar, dtar)
        self.hub.download(txt, dtxt)
        return dtar, dtxt


class UrlSource:
    """Raw-HTTP source: HEAD-checks availability and streams
    ``{base}/{shard}/{subshard}.tar.gz`` + ``.json`` straight from URLs with
    exponential backoff — the reference's direct download path
    (yodas2-mimi/process_shard.py:313-341 streaming with 2^k backoff,
    :944-985 HEAD availability with retries)."""

    def __init__(self, base_url: str, max_retries: int = 4, base_delay: float = 2.0):
        self.base_url = base_url.rstrip("/")
        self.max_retries = max_retries
        self.base_delay = base_delay

    def _urls(self, shard_id: str, subshard_id: str) -> Tuple[str, str]:
        base = f"{self.base_url}/{shard_id}/{subshard_id}"
        return f"{base}.tar.gz", f"{base}.json"

    def _retry(self, fn, what: str):
        from tokenize_audio_tpu.net import retry_with_backoff

        return retry_with_backoff(
            fn, what, max_retries=self.max_retries, base_delay=self.base_delay, log=logger
        )

    def available(self, shard_id: str, subshard_id: str) -> bool:
        import requests

        def head_ok(url: str) -> bool:
            r = requests.head(url, allow_redirects=True, timeout=30)
            if r.status_code == 404:
                return False
            r.raise_for_status()
            return True

        tar, txt = self._urls(shard_id, subshard_id)
        return self._retry(lambda: head_ok(tar), f"HEAD {tar}") and self._retry(
            lambda: head_ok(txt), f"HEAD {txt}"
        )

    def fetch(self, shard_id: str, subshard_id: str, dest_dir: str) -> Tuple[str, str]:
        import requests

        from tokenize_audio_tpu.net import stream_to_file

        os.makedirs(dest_dir, exist_ok=True)
        out = []
        for url in self._urls(shard_id, subshard_id):
            dest = os.path.join(dest_dir, os.path.basename(url))
            self._retry(
                lambda url=url, dest=dest: stream_to_file(
                    lambda: requests.get(url, stream=True, timeout=60), dest
                ),
                f"GET {url}",
            )
            out.append(dest)
        return out[0], out[1]


# ---------------------------------------------------------------------------
# Chunk parsing
# ---------------------------------------------------------------------------

def parse_chunk_id(chunk_id: str) -> Optional[Tuple[int, int]]:
    """`{audio}-{idx:05d}-{start_cs:08d}-{end_cs:08d}` -> (start_cs, end_cs)
    in centiseconds, or None for degenerate start==end segments
    (process_shard.py:400-421)."""
    parts = chunk_id.rsplit("-", 3)
    if len(parts) != 4:
        raise ValueError(f"Invalid chunk_id format: {chunk_id}")
    start_cs, end_cs = int(parts[2]), int(parts[3])
    if start_cs == end_cs:
        return None
    if start_cs > end_cs:
        raise ValueError(f"Invalid chunk_id format: {chunk_id}")
    return start_cs, end_cs


def slice_chunks(
    audio: np.ndarray, text_dict: Dict[str, str], sample_rate: int = 24_000
) -> Tuple[List[str], List[np.ndarray]]:
    """Slice the full audio array into per-chunk segments by centisecond
    bounds, skipping degenerate and empty segments (:423-435)."""
    ids, segments = [], []
    for chunk_id in text_dict:
        bounds = parse_chunk_id(chunk_id)
        if bounds is None:
            continue
        start_cs, end_cs = bounds
        seg = audio[int(start_cs * sample_rate / 100) : int(end_cs * sample_rate / 100)]
        if len(seg) == 0:
            continue  # transcript longer than the actual audio
        ids.append(chunk_id)
        segments.append(seg)
    return ids, segments


def _entry_to_json(e: Dict) -> str:
    """One entry -> compact JSON string; uint16 code ndarrays serialize
    via the LUT fast path (io/jsonfast.py — ~2.5x less writer-thread GIL
    time than tolist+dumps), spliced into the entry JSON. Deferred off the
    encode critical path into the write-behind serializer thread."""
    if "codes" not in e:
        return json.dumps(e)
    codes_json = (
        "{"
        + ",".join(
            f"{json.dumps(str(cid))}:{int_matrix_to_json(c)}"
            for cid, c in e["codes"].items()
        )
        + "}"
    )
    rest = json.dumps({k: v for k, v in e.items() if k != "codes"})
    if rest == "{}":
        return '{"codes":' + codes_json + "}"
    return rest[:-1] + ',"codes":' + codes_json + "}"


def is_json_complete(path: str) -> bool:
    """Every entry must carry a codes field before upload counts
    (process_shard.py:792-824)."""
    data = read_json(path)
    if not isinstance(data, list) or not data:
        return False
    return all("codes" in e for e in data)


# ---------------------------------------------------------------------------
# Sub-shard processing
# ---------------------------------------------------------------------------

class SubShardProcessor:
    def __init__(
        self,
        engine: MimiEncoderEngine,
        work_dir: str,
        save_every: int = 10,
        sample_rate: int = 24_000,
        num_workers: int = 2,
    ):
        self.engine = engine
        self.work_dir = work_dir
        self.save_every = save_every
        self.sample_rate = sample_rate
        self.num_workers = num_workers  # decode prefetch threads (reference
        # ThreadPoolExecutor role, process_shard.py:690-717)
        # optional SHARED single-thread writer executor (set by the shard
        # loop): collections from consecutive sub-shards then serialize on
        # one thread, which is what makes cross-sub-shard overlap safe —
        # finish() closures of different engine calls must never run
        # concurrently (the >60s streaming path shares carried-state
        # encoders). None => each process() call owns a private writer.
        self.writer: Optional[ThreadPoolExecutor] = None
        # processor-wide undrained write-behind groups (each pins its
        # in-flight device batches until collected) — the back-pressure
        # bound must span sub-shards when the writer is shared
        self._undrained: List = []

    def _extract_dir_for(self, tar_path: str) -> str:
        return os.path.join(
            self.work_dir, os.path.basename(tar_path).split(".")[0] + "_extracted"
        )

    def prepare(self, tar_path: str) -> None:
        """Extraction only (marker-idempotent) — callable from a look-ahead
        thread so the next sub-shard's tar is already extracted when
        ``process`` reaches it."""
        self._extract(tar_path, self._extract_dir_for(tar_path))

    def _extract(self, tar_path: str, extract_dir: str) -> None:
        marker = os.path.join(extract_dir, ".extraction_complete")
        if os.path.exists(marker):
            return
        if os.path.exists(extract_dir):
            shutil.rmtree(extract_dir)  # incomplete extraction: redo
        os.makedirs(extract_dir)
        # host_* stages run in worker threads concurrently with device
        # encode: seconds are summed THREAD time (can overlap / exceed
        # wall), the signal for which host stage dominates a pipeline run
        with self.engine.stats.stage("host_extract"):
            try:
                # system tar: a separate PROCESS, so gzip+unpack cost zero
                # GIL time while the main thread keeps the chip fed (the
                # dominant host stage of the r5 compare receipt). GNU tar
                # refuses '..'/absolute members with a failure status —
                # same safety class as tarfile's filter="data" below,
                # which stays as the no-tar-binary fallback.
                subprocess.run(
                    ["tar", "-xf", tar_path, "-C", extract_dir],
                    check=True,
                    capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                with tarfile.open(tar_path, "r:*") as tf:
                    tf.extractall(extract_dir, filter="data")
        open(marker, "w").close()

    def _find_audio(self, extract_dir: str, audio_id: str) -> Optional[str]:
        # one walk per extraction, then O(1) lookups — per-entry re-walks
        # were O(entries x files) in filesystem traversals
        index = getattr(self, "_audio_index", None)
        if index is None or index[0] != extract_dir:
            stems = {}
            for dirpath, _, files in os.walk(extract_dir):
                for f in files:
                    stems.setdefault(os.path.splitext(f)[0], os.path.join(dirpath, f))
            index = (extract_dir, stems)
            self._audio_index = index
        return index[1].get(audio_id)

    def _load_entry_audio(self, entry: Dict, extract_dir: str):
        """Host-side work suitable for prefetch threads: locate, decode,
        resample. Decode failures return None so one corrupt file degrades
        one entry, not the sub-shard (reference behavior,
        process_shard.py:388-394)."""
        path = self._find_audio(extract_dir, entry["audio_id"])
        if path is None:
            return None
        try:
            with self.engine.stats.stage("host_decode"):
                audio, sr = decode_audio(path, raw_int16=True)
                return np.asarray(self.engine.prepare_audio(audio, sr))
        except Exception:  # noqa: BLE001 — per-entry isolation
            logger.exception("Failed to load audio for %s", entry["audio_id"])
            return None

    def process_entries_deferred(self, batch: List[Tuple[Dict, Optional[np.ndarray]]]):
        """Slice + DISPATCH a group of entries' chunks in one deferred
        engine call; returns a zero-arg ``complete()`` that drains the
        in-flight batches and hands back the finished entry dicts.

        Per-call dispatch overhead dominates on network-attached chips
        (~200 ms/call through the tunnel), so chunks from ``save_every``
        entries batch together — the cross-file accumulate-to-batch role
        of the reference's loop (emilia-mimi/process_shard.py:473-537),
        here at the sub-shard level. The dispatch/collect split matters as
        much as the batching: collecting in the write-behind thread keeps
        the device dispatch stream continuous across groups instead of
        paying a full pipeline-drain barrier per group (the dominant term
        of the pipeline-vs-engine gap, BENCHMARKS r5). Entries whose audio
        failed to load are returned without a ``codes`` key (retried on
        restart)."""
        results: List[Dict] = []
        owners: List[Tuple[int, str]] = []
        segments: List[np.ndarray] = []
        for entry, audio24 in batch:
            if audio24 is None:
                logger.warning("Audio file not found for %s", entry["audio_id"])
                results.append(entry)
                continue
            with self.engine.stats.stage("host_slice"):
                ids, segs = slice_chunks(
                    audio24, entry.get("text", {}), self.sample_rate
                )
            e = dict(entry)
            e["codes"] = {}
            results.append(e)
            for cid, s in zip(ids, segs):
                owners.append((len(results) - 1, cid))
                segments.append(s)
        finish = (
            self.engine.encode_batch(segments, sr=self.sample_rate, defer=True)
            if segments
            else (lambda: [])
        )  # >cap chunks split+concat inside

        def complete() -> List[Dict]:
            for (ri, cid), codes in zip(owners, finish()):
                # kept as uint16 ndarrays here; the JSON int-list
                # conversion happens in the write-behind serializer
                # thread, off the encode critical path
                results[ri]["codes"][cid] = codes.astype(np.uint16)
            for e in results:
                if "codes" in e and not e["codes"]:
                    logger.warning(
                        "Audio %s has 0 valid chunks after filtering",
                        e["audio_id"],
                    )
            return results

        return complete

    def process_entries(self, batch: List[Tuple[Dict, Optional[np.ndarray]]]) -> List[Dict]:
        """Eager form of :meth:`process_entries_deferred` (dispatch and
        collect in the calling thread)."""
        return self.process_entries_deferred(batch)()

    def process(
        self, tar_path: str, text_json_path: str, output_path: str
    ) -> List[Dict]:
        """Eager form of :meth:`process_deferred` (drain, assemble, and
        clean up before returning)."""
        return self.process_deferred(tar_path, text_json_path, output_path)()

    def process_deferred(
        self, tar_path: str, text_json_path: str, output_path: str
    ):
        """Decode, slice, and DISPATCH every entry group of one sub-shard,
        returning a zero-arg ``complete()`` that drains the write-behind
        queue, assembles the final output, cleans up, and returns the
        entries. With a shared ``self.writer`` the shard loop calls
        ``process_deferred`` on sub-shard k+1 BEFORE ``complete()`` on k,
        so k's tail drain (a pipeline-depth of blocking tunnel RTTs, plus
        serialization and assembly) overlaps k+1's decode and dispatch —
        the last per-sub-shard barrier in the production path
        (pipeline-vs-engine receipt, BENCHMARKS r5)."""
        extract_dir = self._extract_dir_for(tar_path)
        self._extract(tar_path, extract_dir)
        with open(text_json_path) as f:
            metadata = json.load(f)

        # resume: adopt completed entries from an earlier output, or from
        # the mid-run partial file (:549-562). Incremental saves go to the
        # .partial name so a prefix of entries can NEVER be mistaken for a
        # finished sub-shard by the startup scan (a crash between saves
        # would otherwise upload a truncated output and permanently lose
        # the tail — the final name is written exactly once, when done).
        # The partial is APPEND-ONLY JSONL: rewriting the accumulated list
        # every save (the reference's save_incremental_output, :564-569) is
        # O(n^2) serialization — multi-GB of JSON churn on a 500-file
        # sub-shard; appending just the new group's entries is O(n). A
        # crash mid-append leaves at most one malformed last line, which
        # the reader drops (that group re-encodes on resume).
        partial_path = f"{output_path}.partial"
        existing = read_json(output_path, None)
        if existing is None:
            existing = read_jsonl(partial_path)
        # "codes" present counts as processed even when empty (all chunks
        # degenerate) — matches the reference resume set and avoids
        # re-decoding zero-chunk entries forever (process_shard.py:647-655)
        done = {e["audio_id"]: e for e in (existing or []) if "codes" in e}
        results_by_id: Dict[str, Dict] = dict(done)
        # serialized JSON per entry: built ONCE (in the writer thread for
        # new groups, here for resumed entries) and reused for both the
        # partial appends and the final output assembly — entry JSON is
        # never produced twice
        json_strs: Dict[str, str] = {aid: json.dumps(e) for aid, e in done.items()}
        todo = [e for e in metadata if e["audio_id"] not in done]
        loaded = prefetch_map(
            lambda e: (e, self._load_entry_audio(e, extract_dir)),
            iter(todo),
            workers=self.num_workers,
        )
        buf: List[Tuple[Dict, Optional[np.ndarray]]] = []
        buf_samples = 0
        # cap buffered decoded audio so long entries (hour-scale YouTube
        # videos) don't multiply host RAM by save_every — ~20 min of f32
        # 24 kHz audio ≈ 110 MB buffered worst case
        max_buf_samples = 20 * 60 * self.sample_rate

        # write-behind collector + serializer: ONE writer thread drains
        # each group's in-flight device batches (a pipeline-depth's worth
        # of blocking RTT fetches), converts codes to JSON, and does the
        # fsync'd append — while the main thread decodes, slices, and
        # DISPATCHES the next group. The device dispatch stream stays
        # continuous across groups instead of paying a drain barrier per
        # group. One thread => appends stay ordered; errors surface at
        # join (whole-sub-shard retry, same isolation as before). A
        # shard-loop-shared writer extends the same invariant across
        # sub-shards (see process_deferred docstring).
        own_writer = self.writer is None
        writer = ThreadPoolExecutor(max_workers=1) if own_writer else self.writer
        write_futures: List = []

        def collect_and_write(complete) -> None:
            group = complete()  # drain this group's in-flight batches
            for r in group:
                results_by_id[r["audio_id"]] = r
            with self.engine.stats.stage("host_serialize"):
                lines = []
                for r in group:
                    s = _entry_to_json(r)
                    json_strs[r["audio_id"]] = s
                    lines.append(s)
                append_jsonl_lines(partial_path, lines)

        def flush_group():
            nonlocal buf_samples
            # back-pressure: each queued group pins its undrained tail
            # batches on device, so bound the queue before dispatching
            # more. The bound must count PROCESSOR-wide undrained groups,
            # not just this call's: with the shared writer, sub-shard k
            # can end dispatch with groups still queued while k+1's
            # flush_group starts with an empty local list — counting only
            # locally would double the pinned-device-buffer bound at
            # every sub-shard boundary.
            self._undrained[:] = [f for f in self._undrained if not f.done()]
            if len(self._undrained) >= 3:
                self._undrained[0].result()
            complete = self.process_entries_deferred(buf)  # dispatches now
            buf.clear()
            buf_samples = 0
            fut = writer.submit(collect_and_write, complete)
            write_futures.append(fut)
            self._undrained.append(fut)

        try:
            for entry, audio24 in loaded:
                buf.append((entry, audio24))
                buf_samples += 0 if audio24 is None else len(audio24)
                if len(buf) >= self.save_every or buf_samples >= max_buf_samples:
                    flush_group()
            if buf:
                flush_group()
        except BaseException:
            # drain the write queue even when decode/dispatch raised (the
            # partial stays a valid resume set); writer errors are NOT
            # raised here so they can't mask the original exception. A
            # shared writer must survive for later sub-shards — wait on
            # this call's futures instead of shutting it down.
            if own_writer:
                writer.shutdown(wait=True)
            else:
                futures_wait(write_futures)
            raise

        def complete() -> List[Dict]:
            if own_writer:
                writer.shutdown(wait=True)
            for f in write_futures:
                f.result()  # blocks per future; propagates writer failures
            out_ids = [e["audio_id"] for e in metadata]
            with self.engine.stats.stage("host_assemble"):
                atomic_write_text(
                    output_path, "[" + ", ".join(json_strs[a] for a in out_ids) + "]"
                )
            try:
                os.unlink(partial_path)
            except FileNotFoundError:
                pass
            shutil.rmtree(extract_dir, ignore_errors=True)
            os.unlink(tar_path)
            return [results_by_id[a] for a in out_ids]

        return complete


# ---------------------------------------------------------------------------
# Shard orchestration
# ---------------------------------------------------------------------------

class Yodas2ShardProcessor:
    def __init__(
        self,
        shard_id: str,
        source: Yodas2Source,
        hub,
        engine: MimiEncoderEngine,
        work_dir: str,
        progress_dir: str,
        max_subshards: int = 1000,
        max_consecutive_missing: int = 10,
        upload_batch_size: int = 10,
        save_every: int = 10,
        output_prefix: str = "data",
        # sub-shards to fetch+extract ahead of processing (worker thread):
        # each look-ahead unit holds one extra tar + extraction on disk.
        # 0 = fully serial (reference behavior).
        fetch_ahead: int = 1,
    ):
        self.shard_id = shard_id
        self.source = source
        self.hub = hub
        self.work_dir = os.path.join(work_dir, shard_id)
        os.makedirs(self.work_dir, exist_ok=True)
        self.progress = ShardProgress(progress_dir, shard_id)
        self.sub = SubShardProcessor(engine, self.work_dir, save_every=save_every)
        self.max_subshards = max_subshards
        self.max_consecutive_missing = max_consecutive_missing
        self.upload_batch_size = upload_batch_size
        self.output_prefix = output_prefix
        self.fetch_ahead = fetch_ahead
        self._pending: List[Tuple[str, str, str]] = []  # (sid, local, repo)

    def _repo_path(self, subshard_id: str) -> str:
        return f"{self.output_prefix}/{self.shard_id}/{subshard_id}.json"

    def _flush(self) -> int:
        if not self._pending:
            return 0
        with self.sub.engine.stats.stage("hub_upload"):
            self.hub.upload_batch([(lp, rp) for _, lp, rp in self._pending])
        for sid, lp, _ in self._pending:
            self.progress.mark_completed(sid)
            try:
                os.unlink(lp)
            except FileNotFoundError:
                pass
        n = len(self._pending)
        self._pending.clear()
        return n

    def scan_and_queue_local(self) -> int:
        """Startup scan: queue complete local outputs that never uploaded
        (:851-915). Incomplete ones (failed entries) are LEFT in place —
        they are the resume set the sub-shard retry reads, and the
        completeness gate before upload keeps them off the hub."""
        queued = 0
        for f in sorted(os.listdir(self.work_dir)):
            if not f.endswith(".out.json") or ".tmp." in f:
                continue
            sid = f[: -len(".out.json")]
            local = os.path.join(self.work_dir, f)
            if self.progress.is_completed(sid) or self.hub.exists(self._repo_path(sid)):
                os.unlink(local)
                continue
            if is_json_complete(local):
                self._pending.append((sid, local, self._repo_path(sid)))
                queued += 1
        return queued

    def _plan(self, report: Dict) -> Iterator[str]:
        """Enumerate sub-shard ids that need fetching, applying the
        skip/adopt/missing bookkeeping as it advances. Runs on the MAIN
        thread — ``prefetch_map`` pulls its item iterator inline — just up
        to ``fetch_ahead`` decisions ahead of processing, so all progress
        mutations stay single-threaded. Look-ahead is safe: decisions
        depend only on startup progress state and the remote, never on the
        processing results of earlier sub-shards."""
        consecutive_missing = 0
        retry = set(self.progress.failed)
        for i in range(self.max_subshards):
            sid = f"{i:08d}"
            if self.progress.is_completed(sid) and sid not in retry:
                report["skipped"] += 1
                consecutive_missing = 0
                continue
            try:
                if self.hub.exists(self._repo_path(sid)):
                    self.progress.mark_completed(sid)
                    report["skipped"] += 1
                    consecutive_missing = 0
                    continue
                available = self.source.available(self.shard_id, sid)
            except Exception:  # noqa: BLE001 — network checks get the same
                # per-sub-shard isolation as fetch/process: one transient
                # outage surviving retries must not abort the shard (and
                # strand the pending upload batch)
                logger.exception("availability/exists check failed for %s", sid)
                self.progress.mark_failed(sid)
                report["failed"] += 1
                consecutive_missing = 0
                continue
            if not available:
                report["missing"] += 1
                consecutive_missing += 1
                if consecutive_missing >= self.max_consecutive_missing:
                    logger.info(
                        "%d consecutive missing sub-shards; stopping enumeration "
                        "(sparse tail, process_shard.py:1060-1069)",
                        consecutive_missing,
                    )
                    return
                continue
            consecutive_missing = 0
            yield sid

    def _fetch_prepared(self, sid: str):
        """Fetch + extract one sub-shard; runs in the look-ahead worker
        thread so the next sub-shard's download and tar/gzip extraction
        overlap the current one's encode (the reference serializes these,
        idling its GPU between sub-shards). The extraction marker makes
        the in-process ``_extract`` a no-op afterwards. Returns
        (sid, (tar, txt) | None, error | None) — exceptions stay isolated
        per sub-shard."""
        try:
            with self.sub.engine.stats.stage("source_fetch"):
                tar_path, txt_path = self.source.fetch(
                    self.shard_id, sid, self.work_dir
                )
            self.sub.prepare(tar_path)
            return sid, (tar_path, txt_path), None
        except Exception as e:  # noqa: BLE001 — surfaced to the main loop
            logger.exception("sub-shard %s fetch/extract failed", sid)
            return sid, None, e

    def _complete_one(self, item: Tuple, report: Dict) -> None:
        """Drain + assemble + queue-for-upload one dispatched sub-shard
        (the completion half of process_deferred). Failures keep the same
        per-sub-shard isolation as before: mark failed, retry on restart."""
        sid, complete, txt_path, out_path = item
        try:
            entries = complete()
            os.unlink(txt_path)
            # same completeness gate as is_json_complete, WITHOUT
            # re-parsing the (potentially hundreds-of-MB) file just
            # written — complete() returned the same entries (the helper
            # stays for scan_and_queue_local's cold-start path)
            if not entries or not all("codes" in e for e in entries):
                # entries whose audio failed to load lack a codes field;
                # validate-before-upload (process_shard.py:792-824) —
                # the output stays local as the resume set and the
                # sub-shard retries on restart instead of uploading a
                # permanently incomplete JSON marked completed
                raise RuntimeError("sub-shard output incomplete (failed entries)")
            self._pending.append((sid, out_path, self._repo_path(sid)))
            report["processed"] += 1
            if len(self._pending) >= self.upload_batch_size:
                report["uploaded"] += self._flush()
        except Exception:  # noqa: BLE001 — per-subshard isolation, retried on restart
            logger.exception("sub-shard %s failed", sid)
            self.progress.mark_failed(sid)
            report["failed"] += 1

    def process(self) -> Dict:
        report = {"processed": 0, "skipped": 0, "missing": 0, "failed": 0, "uploaded": 0}
        report["uploaded"] += 0 if not self.scan_and_queue_local() else self._flush()
        # depth = fetch_ahead + 1: prefetch_map only refills its future
        # queue when the consumer pulls, so one slot is always occupied by
        # the item being handed over — depth 1 would serialize completely
        fetched = prefetch_map(
            self._fetch_prepared,
            self._plan(report),
            workers=1 if self.fetch_ahead > 0 else 0,
            depth=self.fetch_ahead + 1,
        )
        # ONE writer thread shared across sub-shards: sub-shard k's tail
        # drain + serialization + assembly (complete()) overlaps k+1's
        # decode and dispatch, removing the per-sub-shard drain barrier
        # (the residual pipeline-vs-engine gap, BENCHMARKS r5). A single
        # thread serializes the finish() closures of consecutive engine
        # calls, which the engine requires (shared streaming encoders).
        writer = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ta-writer")
        self.sub.writer = writer
        pending_done: Optional[Tuple] = None  # dispatched, not yet completed
        try:
            for sid, paths, err in fetched:
                if err is not None:
                    self.progress.mark_failed(sid)
                    report["failed"] += 1
                    continue
                tar_path, txt_path = paths
                try:
                    out_path = os.path.join(self.work_dir, f"{sid}.out.json")
                    complete = self.sub.process_deferred(tar_path, txt_path, out_path)
                except Exception:  # noqa: BLE001 — per-subshard isolation
                    logger.exception("sub-shard %s failed", sid)
                    self.progress.mark_failed(sid)
                    report["failed"] += 1
                    continue
                # hand-off BEFORE completing the previous sub-shard: if a
                # BaseException (Ctrl-C mid-drain) lands inside
                # _complete_one, the finally must drain the NEWLY
                # dispatched sub-shard, not re-run the interrupted
                # completion (complete() is once-only: a second call
                # re-unlinks the tar)
                prev, pending_done = pending_done, (sid, complete, txt_path, out_path)
                if prev is not None:
                    self._complete_one(prev, report)
            if pending_done is not None:
                prev, pending_done = pending_done, None
                self._complete_one(prev, report)
        finally:
            if pending_done is not None:
                # an abnormal exit (e.g. upload raise) with a sub-shard
                # still dispatched: drain it so device buffers free and
                # its partial stays a valid resume set
                self._complete_one(pending_done, report)
            self.sub.writer = None
            writer.shutdown(wait=True)
        report["uploaded"] += self._flush()
        if report["failed"] == 0 and not self.progress.failed:
            # enumeration finished cleanly: mark the shard done so the
            # pod-runner/monitor skip it without expected-unit counts
            self.progress.meta["done"] = True
            self.progress.save()
        return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shard-id", required=True)
    ap.add_argument("--source", required=True, help="dir:/mirror, hf:org/repo, or https://base/url")
    ap.add_argument("--hub", required=True)
    ap.add_argument("--work-dir", default="/tmp/ta_yodas2")
    ap.add_argument("--progress-dir", required=True)
    ap.add_argument("--max-subshards", type=int, default=1000)
    ap.add_argument("--upload-batch-size", type=int, default=10)
    ap.add_argument(
        "--fetch-ahead",
        type=int,
        default=1,
        help="sub-shards to download+extract ahead of processing "
        "(each holds one extra tar+extraction on disk; 0 = serial)",
    )
    from tokenize_audio_tpu.cli import add_engine_args, engine_from_args

    add_engine_args(ap)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from tokenize_audio_tpu.mimi import MimiConfig

    # store ALL codebooks in the raw stage; the 8-book slice happens downstream
    engine = engine_from_args(args, num_codebooks=MimiConfig().num_quantizers)
    if args.source.startswith("dir:"):
        source: Yodas2Source = LocalSource(args.source[4:])
    elif args.source.startswith(("http:", "https:")):
        source = UrlSource(args.source)
    else:
        source = HubSource(open_hub(args.source))
    proc = Yodas2ShardProcessor(
        args.shard_id,
        source,
        open_hub(args.hub),
        engine,
        args.work_dir,
        args.progress_dir,
        max_subshards=args.max_subshards,
        upload_batch_size=args.upload_batch_size,
        fetch_ahead=args.fetch_ahead,
    )
    print(json.dumps(proc.process()))


if __name__ == "__main__":
    main()
