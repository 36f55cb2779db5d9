"""Length-bucketed Mimi batch-encode engine.

Drop-in capability replacement for the reference's ``MimiEncoder`` wrapper
(yodas2-mimi/process_shard.py:185-274 and its nine copy-paste sites):

  - ``encode_chunk(audio, sr)``  — one utterance -> (K, T) codes, splitting
    >60 s audio into independently-encoded pieces concatenated on the time
    axis (reference policy, process_shard.py:436-493).
  - ``encode_batch(audios, sr)`` — many utterances -> list of (K, T) codes,
    trimmed to ceil(len/1920) frames each (process_shard.py:262-274).

TPU-first differences from the reference:
  - pad-to-bucket over a static shape lattice instead of pad-to-longest, so
    XLA compiles a bounded set of programs and the MXU stays tiled;
  - masked padding semantics make every utterance's codes bit-identical to
    its standalone encode — batch composition cannot change codes (the
    reference's batched codes depend on the longest element);
  - on-device polyphase resampling instead of host librosa;
  - optional ``jax.sharding.Mesh``: the batch dimension is sharded over the
    mesh's ``data`` axis, params replicated.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.core.audio import (
    bucket_for_length,
    make_buckets,
    pad_to_bucket,
    pcm_to_float,
    resample,
    resample_many,
    split_long_audio_with_context,
)
from tokenize_audio_tpu.engine.metrics import EngineStats
from tokenize_audio_tpu.mimi.config import MimiConfig
from tokenize_audio_tpu.mimi.model import encode as mimi_encode

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("n",))
def _take_prefix(a: jax.Array, n: int) -> jax.Array:
    """First n rows of the compacted code buffer — the only bytes that
    cross the wire in "compact" transfer. The caller pads n up to a
    16-step lattice of the buffer size (<=16 compiled variants per buffer
    shape, <=1/16 overfetch; see _dispatch)."""
    return a[:n]


def _prune_for_encode(params, num_codebooks: int):
    """Drop the param subtrees the encode path never touches: the decoder
    stack (dec/dec_tfm/upsample), RVQ output projections, and acoustic
    codebooks beyond the requested depth."""
    keep = {
        k: v
        for k, v in params.items()
        if k in ("enc_in", "blocks", "enc_out", "tfm", "downsample", "rvq")
    }
    rvq = {}
    for head in ("semantic", "acoustic"):
        h = dict(params["rvq"][head])
        h.pop("out_proj", None)
        rvq[head] = h
    n_sem = rvq["semantic"]["embed"].shape[0]
    n_ac = max(0, num_codebooks - n_sem)
    rvq["semantic"]["embed"] = rvq["semantic"]["embed"][: min(n_sem, num_codebooks)]
    rvq["acoustic"]["embed"] = rvq["acoustic"]["embed"][:n_ac]
    keep["rvq"] = rvq
    return keep


class MimiEncoderEngine:
    def __init__(
        self,
        params,
        cfg: Optional[MimiConfig] = None,
        engine_cfg: Optional[EngineConfig] = None,
        mesh=None,
        num_codebooks: Optional[int] = None,
        masked: bool = True,
        # in-flight device batches: bounds host+device memory while hiding
        # per-call sync latency. On the tunneled v5e, interleaved A/B
        # (scripts/pipeline_depth_probe.py) medians: r2 (padded format)
        # depth 2 = 364x, 4 = 422-445x, 8 = 478-485x; r3 re-probe on the
        # packed format: 8 = 399x, 12 = 414x, 16 = 418x; r4 re-probe:
        # 12 = 341x, 18 = 558x, 24 = 425x (noisy fabric, but 18 >= 12 in
        # 3/5 rounds and 18 > 24 in 4/5), and the r4 autotune-on-real-data
        # run picked 18 over 12 and 6 (NOTES r4 item 5). Four independent
        # measurements agree the curve rises to ~16-18 then flattens or
        # declines, so 18 is the default; it is still <400 MB of device
        # buffers. Depth is transport-only — numerics are unaffected.
        pipeline_depth: int = 18,
    ):
        self.pipeline_depth = pipeline_depth
        self.last_autotune: dict = {}  # per-format median probe seconds
        self.last_autotune_depth: dict = {}  # per-depth median probe seconds
        self.last_autotune_drain: dict = {}  # per-policy median probe seconds
        self._pending_autotune: Optional[dict] = None
        self.cfg = cfg or MimiConfig()
        self.engine_cfg = engine_cfg or EngineConfig()
        self.num_codebooks = num_codebooks or self.engine_cfg.num_codebooks
        self.masked = masked
        self.stats = EngineStats()
        self._bucket_cache: dict = {}
        self.buckets = self._buckets_for(
            self.engine_cfg.sample_rate, self.cfg.samples_per_frame
        )
        fmt = self.engine_cfg.code_transfer_format
        if fmt not in ("padded", "packed", "compact"):
            raise ValueError(f"unknown code_transfer_format {fmt!r}")
        if self.engine_cfg.drain_policy not in ("fifo", "ready", "threaded"):
            raise ValueError(
                f"unknown drain_policy {self.engine_cfg.drain_policy!r}"
            )
        self._fetch_pool = None  # lazily built for drain_policy="threaded"
        if fmt != "padded" and self.num_codebooks % 2 != 0:
            if fmt == "compact":
                # compact is always an explicit opt-in (the default is
                # packed); silently downgrading a requested fetch
                # optimization would hide in shard logs — refuse like the
                # masked/mesh checks below do
                raise ValueError(
                    f"compact transfer packs code pairs; num_codebooks "
                    f"{self.num_codebooks} must be even"
                )
            # pair packing needs even K; an odd-codebook engine (e.g.
            # semantic-only K=1) must keep working under the packed
            # DEFAULT, so fall back instead of raising
            import logging

            logging.getLogger(__name__).warning(
                "code_transfer_format='packed' packs code pairs but "
                "num_codebooks %d is odd; falling back to 'padded'",
                self.num_codebooks,
            )
            fmt = "padded"
            self.engine_cfg = dataclasses.replace(
                self.engine_cfg, code_transfer_format="padded"
            )
        if fmt == "compact" and not self.masked:
            raise ValueError("compact transfer requires masked=True")
        if fmt == "compact" and mesh is not None:
            raise ValueError(
                "compact transfer is single-device (the compaction cumsum "
                "would gather across the batch sharding); use 'packed' or "
                "'padded' with a mesh"
            )
        self._batch_sharding = None
        self._multiprocess = False
        self._batch_multiple = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tokenize_audio_tpu.parallel.mesh import batch_sharding, replicate_params

            dp = mesh.shape.get("data", 1)
            # every batch must split evenly over the data axis (shard-
            # materializing upload and the per-row trim both assume uniform
            # row blocks); process count needs no extra constraint — the
            # multiprocess upload materializes addressable shards from the
            # full planned batch, valid for any (data, model) decomposition
            self._batch_multiple = dp
            if self.engine_cfg.batch_size % dp != 0:
                raise ValueError(
                    f"batch_size {self.engine_cfg.batch_size} must divide evenly "
                    f"over the data mesh axis ({dp} devices)"
                )
            params = _prune_for_encode(params, self.num_codebooks)
            params = replicate_params(params, mesh)
            self._batch_sharding = batch_sharding(mesh)
            # multi-process slice DP (parallel/multihost.py): every process
            # calls encode_batch with the SAME utterance list (deterministic
            # planning keeps the collective program launches SPMD-
            # consistent); each uploads only its own row span, and results
            # all-gather back over the mesh so every host returns the full
            # code list. Codes are ~200 B/s-of-audio, so the gather is
            # negligible next to the audio upload it avoids replicating.
            self._multiprocess = jax.process_count() > 1
            if self._multiprocess:
                self._gather = jax.jit(
                    lambda x: x, out_shardings=NamedSharding(mesh, P())
                )
        else:
            # place params on device once; passing host numpy params would
            # re-transfer ~80 MB of weights on every encode call. Pruning
            # first: the decoder stack and unused acoustic codebooks are
            # ~half the checkpoint and the encode path never reads them.
            params = jax.device_put(_prune_for_encode(params, self.num_codebooks))
        self.params = params
        self.mesh = mesh

    # -- internals ---------------------------------------------------------

    def _buckets_for(self, domain_sr: int, spf_io: int):
        """Bucket lattice in ``domain_sr``-samples (the fused-resample path
        buckets at the SOURCE rate so frames stay aligned end to end)."""
        key = (domain_sr, spf_io)
        if key not in self._bucket_cache:
            self._bucket_cache[key] = make_buckets(
                self.engine_cfg.min_bucket_seconds,
                self.engine_cfg.max_chunk_seconds
                + self.engine_cfg.split_context_seconds,
                self.engine_cfg.bucket_growth,
                domain_sr,
                spf_io,
            )
        return self._bucket_cache[key]

    def _device_batch(self, batch: np.ndarray, lengths: np.ndarray):
        if self._multiprocess:
            # every process holds the SAME planned full batch (SPMD-
            # consistent planning), so materialize exactly each device's
            # addressable shard from it — correct for ANY (data, model)
            # decomposition, including tp spanning hosts where neighbor
            # processes hold REPLICAS of one data block. (A fixed
            # process-span upload through make_array_from_process_local_data
            # mis-assembles there: the global shape is inferred from the
            # local rows, silently shrinking the batch — caught by the
            # dp=2 tp=4 x 4-process cluster test.) No audio crosses hosts;
            # each process uploads only the rows its own devices must hold.
            b = jax.make_array_from_callback(
                batch.shape, self._batch_sharding, lambda i: batch[i]
            )
            v = jax.make_array_from_callback(
                lengths.shape, self._batch_sharding, lambda i: lengths[i]
            )
        elif self._batch_sharding is not None:
            # device_put straight from numpy with the sharding: asarray()
            # first would commit to the default device and reshard — two
            # transfers of every batch on the hot path
            b = jax.device_put(batch, self._batch_sharding)
            v = jax.device_put(lengths, self._batch_sharding)
        else:
            b = jnp.asarray(batch)
            v = jnp.asarray(lengths)
        return b, v

    def _dispatch(
        self,
        utterances: Sequence[np.ndarray],
        bucket: int,
        resample_arg: "Optional[tuple]" = None,
        budget_len: Optional[int] = None,
    ):
        """Pad one device batch and launch the (async) encode. Returns the
        in-flight handle ``(codes_device, n_real, frames, bucket_frames)``
        — per-row frame counts are HOST-computed (no device valid fetch),
        and ``codes_device``'s layout depends on code_transfer_format.
        ``resample_arg`` = static (up, down) for the fused on-device
        resample (rows are at the source rate); ``budget_len`` is the
        POST-resample length used for the activation-memory samples budget
        (defaults to bucket)."""
        group = list(utterances)
        n_real = len(group)
        # static tail-ladder batch size >= n_real (bounded program set per
        # bucket, dp axis and process spans divide evenly, minimal padded-
        # row waste — see EngineConfig.batch_size_for_group)
        bs = self.engine_cfg.batch_size_for_group(
            budget_len if budget_len is not None else bucket,
            n_real,
            multiple_of=self._batch_multiple,
        )
        # pad rows match the group's dtype so an all-int16 group keeps the
        # narrow-transfer fast path (pad_to_bucket falls back to f32 on mix)
        pad_dtype = group[0].dtype if group else np.float32
        group += [np.zeros(1, dtype=pad_dtype)] * (bs - n_real)
        fmt = self.engine_cfg.code_transfer_format
        with self.stats.stage("pad"):
            batch, lengths = pad_to_bucket(group, bucket)
        # per-row frame counts are host-derivable (the ceil-division chain
        # through the conv strides equals one ceil by samples_per_frame, and
        # the fused resample's device-side valid update is the same ceil) —
        # so no mode ever fetches the device `valid` array
        spf = self.cfg.samples_per_frame
        res_len = lengths.astype(np.int64)
        if resample_arg is not None:
            up, down = resample_arg
            res_len = -((-res_len * up) // down)
        frames = (-(-res_len // spf)).astype(np.int64)
        with self.stats.stage("dispatch"):
            b, v = self._device_batch(batch, lengths)
            codes, _ = mimi_encode(
                self.params,
                self.cfg,
                b,
                v,
                num_quantizers=self.num_codebooks,
                masked=self.masked,
                # lossless narrow transfer dtype (see EngineConfig note)
                code_dtype=self.engine_cfg.code_transfer_dtype,
                resample=resample_arg,
                transfer=fmt,
            )
            # frames per padded row = bucket / samples-per-frame in the
            # I/O domain (source-rate when the fused resample is active)
            io_spf = spf if resample_arg is None else spf * down // up
            bucket_frames = bs * int(-(-bucket // io_spf))
            if fmt == "compact":
                # fetch only the valid-frame prefix, padded UP to a
                # 16-step lattice of the buffer size: <=16 compiled
                # _take_prefix variants per buffer shape and <=1/16
                # overfetch. (Power-of-two padding would overshoot to the
                # FULL buffer whenever valid frames exceed half of it —
                # i.e. at any realistic bucket efficiency.)
                total = int(frames.sum())
                cap = codes.shape[0]
                step = max(1, cap // 16)
                n_pad = min(cap, -(-total // step) * step)
                codes = _take_prefix(codes, n_pad)
            if self._multiprocess:
                # all-gather the sharded codes over the mesh now (an SPMD-
                # consistent collective every process dispatches), so
                # _collect reads a fully-addressable array
                codes = self._gather(codes)
            # queue the device->host copy now: it starts the moment compute
            # finishes, overlapping with collection of earlier batches
            # instead of serializing behind it (transport-bound fabrics)
            try:
                codes.copy_to_host_async()
            except AttributeError:  # CPU arrays under the test mesh
                pass
        return codes, n_real, frames, bucket_frames

    def _retry_transient(self, what: str, attempt, recover=None):
        """Run ``attempt()``, absorbing ONE transient device/runtime fault.

        Faults (a dropped remote-compile RPC, a mid-stream transfer abort)
        surface as JaxRuntimeError at dispatch, collect, or stream time.
        Encode is stateless at every retry grain — params stay
        device-resident, inputs are host-owned numpy — so one retry
        (``recover()``, defaulting to ``attempt()`` again) is exact and
        turns a would-be shard-attempt abort into a counted
        ``transient_retries`` stat. A persistent fault re-raises into the
        shard-level restart-resume machinery. Multiprocess SPMD mode never
        retries: a lone re-dispatch would desync the collective launch
        schedule across processes.
        """
        try:
            return attempt()
        except jax.errors.JaxRuntimeError as e:
            if self._multiprocess:
                raise
            logger.warning("transient device fault %s; retrying once: %s", what, e)
            with self.stats._lock:  # threaded drain retries concurrently
                self.stats.transient_retries += 1
            return (recover or attempt)()

    def _collect(self, handle) -> List[np.ndarray]:
        """Block on an in-flight batch and trim per-row codes."""
        codes_d, n_real, frames, bucket_frames = handle
        fmt = self.engine_cfg.code_transfer_format
        dtype = np.dtype(self.engine_cfg.code_transfer_dtype)
        with self.stats.stage("fetch"):
            codes = np.asarray(jax.device_get(codes_d))
        # frame counters update under the stats lock at the end — the
        # threaded drain runs _collect concurrently from pool workers, and
        # unlocked += would lose updates
        out = []
        n_frames = 0
        if fmt == "padded":
            for i in range(n_real):
                f = int(frames[i])
                # copy: a trimmed VIEW would pin the whole (B, K, T_bucket)
                # batch buffer for as long as a caller keeps one row's codes
                out.append(codes[i, :, :f].copy())
                n_frames += f
        elif fmt == "packed":
            # packed modes: int32 words -> exact uint16 code stream via a
            # zero-copy little-endian view (pairs pack low|high<<16)
            u16 = np.ascontiguousarray(codes).view("<u2")
            u16 = u16.reshape(codes.shape[0], codes.shape[1], -1)  # (B, T, K)
            for i in range(n_real):
                f = int(frames[i])
                out.append(u16[i, :f].T.astype(dtype))
                n_frames += f
        else:
            # compact: prefix rows are valid frames in row order
            u16 = np.ascontiguousarray(codes).view("<u2")
            u16 = u16.reshape(codes.shape[0], -1)  # (rows, K)
            off = 0
            for i in range(n_real):
                f = int(frames[i])
                out.append(u16[off : off + f].T.astype(dtype))
                n_frames += f
                off += f
        with self.stats._lock:
            self.stats.frames += n_frames
            self.stats.padded_frames += bucket_frames
        return out

    def _prepare_mono(self, audio: np.ndarray) -> np.ndarray:
        """Mixdown/flatten only — no resample, int16 preserved (non-24 kHz
        input then resamples on device: fused into the encode program, or
        via resample_many for the unmasked/exotic-rate fallback)."""
        audio = np.asarray(audio)
        if audio.ndim == 2:
            ch_axis = int(np.argmin(audio.shape))
            if audio.shape[ch_axis] > 8:
                raise ValueError(
                    f"ambiguous multichannel audio shape {audio.shape}; pass "
                    "mono (T,) or channels on the small axis (<= 8)"
                )
            audio = pcm_to_float(audio).mean(axis=ch_axis)
        return audio.reshape(-1)

    def _prepare(self, audio: np.ndarray, sr: int) -> np.ndarray:
        audio = self._prepare_mono(audio)
        if sr != self.engine_cfg.sample_rate:
            audio = pcm_to_float(audio)
            with self.stats.stage("resample"):
                audio = np.asarray(resample(audio, sr, self.engine_cfg.sample_rate))
        elif audio.dtype != np.int16:
            # mono int16 PCM at the engine rate ships to the device raw:
            # pad_to_bucket keeps it int16 and the model normalizes on
            # device (exact x/32768) — half the host->device bytes on
            # transport-bound fabrics. Everything else normalizes here.
            audio = pcm_to_float(audio)
        return audio

    # public alias: normalize + resample to the engine sample rate
    prepare_audio = _prepare

    def _resample_plan(self, sr: int):
        """How audio at ``sr`` reaches the model: returns
        (resample_arg, spf_io, domain_sr) where ``resample_arg`` is the
        static (up, down) of the FUSED on-device resample (None = no fuse:
        already at engine rate, exotic rate, or unmasked semantics),
        ``spf_io`` the samples-per-frame in the I/O domain, and
        ``domain_sr`` the rate bucketing/splitting run at. Shared by
        encode_batch and warmup so the lattice/plan can never diverge."""
        rate = self.engine_cfg.sample_rate
        if sr != rate:
            g = math.gcd(int(sr), int(rate))
            up, down = rate // g, sr // g
            if self.masked and (self.cfg.samples_per_frame * down) % up == 0:
                return (up, down), self.cfg.samples_per_frame * down // up, sr
        return None, self.cfg.samples_per_frame, rate

    # -- public API --------------------------------------------------------

    def encode_batch(
        self, audios: Sequence[np.ndarray], sr: int = 24_000, defer: bool = False
    ):
        """Encode utterances; returns per-utterance (num_codebooks, frames)
        integer arrays (EngineConfig.code_transfer_dtype, default int32) in
        input order. Audio longer than the 60 s cap is split and
        re-concatenated on the code time axis (or streamed exactly with
        long_audio_policy="stream").

        ``defer=True`` returns a zero-arg ``finish()`` closure instead of
        the result list: every batch is already DISPATCHED (depth-bounded),
        but the tail drain — up to pipeline_depth blocking fetches, each a
        tunnel RTT — plus long-audio streaming and reassembly run only when
        ``finish()`` is called, from any single thread. A caller that
        collects in a worker thread keeps the device dispatch stream
        continuous across calls instead of paying a drain barrier per call
        (the pipeline-vs-engine gap's dominant term, BENCHMARKS r5).
        Call each finish() exactly once; results are bit-identical to the
        eager path."""
        if self._pending_autotune is not None:
            # deferred real-workload autotune (request_autotune): probe on
            # THIS call's utterances, then fall through and encode them
            # with the chosen config. Cleared first — the probe re-enters
            # encode_batch.
            pa, self._pending_autotune = self._pending_autotune, None
            if pa["transfer"]:
                self.autotune_transfer(
                    seconds=pa["seconds"], rounds=pa["rounds"],
                    samples=audios, sr=sr,
                )
            if pa["depth"]:
                self.autotune_pipeline_depth(
                    depths=pa["depths"], seconds=pa["seconds"],
                    rounds=pa["rounds"], samples=audios, sr=sr,
                )
            if pa.get("on_complete") is not None:
                pa["on_complete"]()
        rate = self.engine_cfg.sample_rate
        resample_arg, spf_io, domain_sr = self._resample_plan(sr)
        if resample_arg is not None:
            # FUSED on-device resample: ship source-rate PCM (int16 stays
            # int16 — e.g. 16 kHz int16 is 6x fewer upload bytes than
            # 24 kHz f32) and resample inside the encode program;
            # bucketing/splitting run in source samples, frame-aligned via
            # the integer source-samples-per-frame
            up, down = resample_arg
            prepared = [self._prepare_mono(a) for a in audios]
        elif sr != rate:
            # non-integer source frame (exotic rate) or unmasked HF
            # semantics: batched device resample, then the 24 kHz path
            raw = [self._prepare_mono(a) for a in audios]
            with self.stats.stage("resample"):
                prepared = resample_many(raw, sr, rate)
        else:
            prepared = [self._prepare(a, sr) for a in audios]
        buckets = self._buckets_for(domain_sr, spf_io)
        # explode >cap audio into pieces, remembering the mapping
        pieces: List[np.ndarray] = []
        piece_of: List[int] = []
        piece_drop: List[int] = []  # leading context frames to discard
        streamed: dict[int, np.ndarray] = {}
        stream_jobs: List[tuple] = []  # (utterance index, 24 kHz float audio)
        cap = int(self.engine_cfg.max_chunk_seconds * domain_sr)
        ctx = int(self.engine_cfg.split_context_seconds * domain_sr)
        for i, a in enumerate(prepared):
            self.stats.audio_seconds += len(a) / domain_sr
            self.stats.utterances += 1
            if self.engine_cfg.long_audio_policy == "stream" and len(a) > cap:
                if domain_sr != rate:
                    # the streaming encoder consumes 24 kHz float audio
                    a = np.asarray(resample(pcm_to_float(a), domain_sr, rate))
                # the streaming encoder consumes float audio (push() casts
                # without PCM scaling); normalize raw-int16 fast-path input
                stream_jobs.append((i, pcm_to_float(a)))
                continue
            for p, drop in split_long_audio_with_context(a, cap, ctx, spf_io):
                pieces.append(p)
                piece_of.append(i)
                piece_drop.append(drop)

        # group by bucket and chunk into device batches
        order = sorted(range(len(pieces)), key=lambda j: len(pieces[j]))
        jobs: List[tuple] = []  # (bucket, [piece indices])
        j = 0
        while j < len(order):
            bucket = bucket_for_length(len(pieces[order[j]]), buckets)
            group_idx = []
            while j < len(order) and len(pieces[order[j]]) <= bucket:
                group_idx.append(order[j])
                j += 1
            # the samples budget bounds POST-resample activation memory, so
            # size batches by the resampled length, not the source length
            budget_len = bucket if resample_arg is None else bucket * up // down
            bs = self.engine_cfg.batch_size_for_bucket(
                budget_len, multiple_of=self._batch_multiple
            )
            for s in range(0, len(group_idx), bs):
                jobs.append((bucket, budget_len, group_idx[s : s + bs]))

        # pipelined execution: keep up to pipeline_depth batches in flight so
        # host-side padding and result fetch overlap device compute (the
        # host-concurrency role of the reference's ThreadPoolExecutor,
        # yodas2-mimi/process_shard.py:690-717, done JAX-async instead)
        results: List[Optional[np.ndarray]] = [None] * len(pieces)
        inflight: List[tuple] = []  # (handle, idxs, (bucket, budget_len))

        # multiprocess SPMD keeps FIFO: collection must not interleave
        # with the deterministic collective dispatch schedule
        policy = "fifo" if self._multiprocess else self.engine_cfg.drain_policy
        if policy == "threaded" and self._fetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._fetch_pool = ThreadPoolExecutor(
                max_workers=max(1, self.engine_cfg.fetch_threads),
                thread_name_prefix="ta-fetch",
            )

        def _collect_with_retry(handle, idxs, bucket, budget_len):
            # a fault at collect time (the async dispatch's error
            # materializes at device_get) recovers by re-dispatching the
            # whole group and collecting that
            return self._retry_transient(
                f"collecting a {len(idxs)}-row batch",
                lambda: self._collect(handle),
                recover=lambda: self._collect(
                    self._dispatch([pieces[g] for g in idxs], bucket, resample_arg, budget_len)
                ),
            )

        def drain_one():
            if policy == "threaded":
                # the pool already started this fetch at dispatch time;
                # RTTs of up to fetch_threads batches overlap in flight
                fut, idxs = inflight.pop(0)
                collected = fut.result()
            else:
                pick = 0
                if policy == "ready" and len(inflight) > 1:
                    # collect the first READY handle so this blocking
                    # fetch's tunnel RTT overlaps still-computing batches
                    # instead of serializing behind the oldest one; fall
                    # back to FIFO when none report ready (results scatter
                    # by piece index, so collection order never affects
                    # output order or bits)
                    for j, (h, _, _) in enumerate(inflight):
                        try:
                            if h[0].is_ready():
                                pick = j
                                break
                        except AttributeError:  # non-jax arrays (test doubles)
                            break
                handle, idxs, (bucket, budget_len) = inflight.pop(pick)
                collected = _collect_with_retry(handle, idxs, bucket, budget_len)
            for g, c in zip(idxs, collected):
                results[g] = c

        for bucket, budget_len, idxs in jobs:
            # faults can ALSO raise synchronously inside _dispatch (the
            # jitted call blocks on compilation — a dropped remote-compile
            # RPC was observed raising exactly here)
            handle = self._retry_transient(
                f"dispatching a {len(idxs)}-row batch",
                lambda: self._dispatch(
                    [pieces[g] for g in idxs], bucket, resample_arg, budget_len
                ),
            )
            if policy == "threaded":
                inflight.append(
                    (
                        self._fetch_pool.submit(
                            _collect_with_retry, handle, idxs, bucket, budget_len
                        ),
                        idxs,
                    )
                )
            else:
                inflight.append((handle, idxs, (bucket, budget_len)))
            if len(inflight) >= self.pipeline_depth:
                drain_one()

        def finish() -> List[np.ndarray]:
            while inflight:
                drain_one()

            # long-audio streaming, MULTIPLEXED: up to stream_batch >cap
            # utterances share one carried-state encoder (per-row ends — a
            # YODAS2 shard of K full videos streams in ~1/K the step
            # dispatches; VERDICT r2 weak #5), bit-identical to the serial
            # path
            for s in range(0, len(stream_jobs), self.engine_cfg.stream_batch):
                grp = stream_jobs[s : s + self.engine_cfg.stream_batch]
                enc = self._stream_encoder_for(len(grp))
                with self.stats.stage("stream"):
                    # retry is exact here because encode_streams resets
                    # carried state at entry — the whole group re-streams
                    # from scratch
                    codes_list = self._retry_transient(
                        f"streaming a {len(grp)}-stream group",
                        lambda: enc.encode_streams([a for _, a in grp]),
                    )
                for (i, _), c in zip(grp, codes_list):
                    with self.stats._lock:
                        self.stats.frames += c.shape[1]
                        # streamed frames carry no bucket padding; count
                        # them on both sides so bucket_efficiency keeps
                        # measuring bucketed waste only
                        self.stats.padded_frames += c.shape[1]
                    # match the bucketed path's configured transfer dtype
                    streamed[i] = c.astype(
                        np.dtype(self.engine_cfg.code_transfer_dtype)
                    )

            # reassemble per-utterance codes (concat split pieces on time
            # axis, dropping overlap-context frames when configured)
            out: List[List[np.ndarray]] = [[] for _ in prepared]
            for p_idx, owner in enumerate(piece_of):
                c = results[p_idx]
                drop = piece_drop[p_idx]
                out[owner].append(c[:, drop:] if drop else c)
            return [
                streamed[i]
                if i in streamed
                else (parts[0] if len(parts) == 1 else np.concatenate(parts, axis=1))
                for i, parts in enumerate(out)
            ]

        return finish if defer else finish()

    def _stream_encoder_for(self, n_streams: int):
        """Carried-state streaming encoder sized to the next power of two
        >= n_streams (bounded compiled-program set; unused rows ride along
        as zero-length streams). Exact long-audio encode: codes
        bit-identical to a one-shot encode of the whole stream (no 60 s
        receptive-field cuts). Full-causal configs cut streams beyond
        stream_max_seconds (the HF one-shot horizon) at that whole-chunk
        boundary inside encode_streams, each piece streamed exactly;
        windowed configs never cut (the ring cache matches windowed batch
        encode at any length)."""
        from tokenize_audio_tpu.mimi.streaming import StreamingMimiEncoder

        cap = self.engine_cfg.stream_batch
        b = 1
        while b < min(n_streams, cap):
            b *= 2
        b = min(b, cap)  # cap is a bound, not a rounding target: a non-
        # power-of-two stream_batch must not balloon into the next power
        # (full-causal KV is ~131 MB/row)
        cache = getattr(self, "_stream_encoders", None)
        if cache is None:
            cache = self._stream_encoders = {}
        if b not in cache:
            params = self.params
            if self._multiprocess:
                # streaming runs per process on its local default device
                # (no collectives); replicated GLOBAL arrays span remote
                # devices and cannot be device_put locally — materialize
                # this process's replica ONCE (tens of MB of device->host
                # transfer), shared by every stream-batch-size encoder
                params = getattr(self, "_stream_host_params", None)
                if params is None:
                    params = self._stream_host_params = jax.tree_util.tree_map(
                        lambda a: np.asarray(a.addressable_data(0))
                        if isinstance(a, jax.Array)
                        else a,
                        self.params,
                    )
            cache[b] = StreamingMimiEncoder(
                params,
                self.cfg,
                batch=b,
                chunk_seconds=min(8.0, self.engine_cfg.stream_max_seconds),
                max_seconds=self.engine_cfg.stream_max_seconds,
                num_quantizers=self.num_codebooks,
            )
        return cache[b]

    def _probe_workload(
        self,
        seconds: float,
        seed: int,
        samples: Optional[Sequence[np.ndarray]] = None,
        sr: Optional[int] = None,
    ) -> "tuple[List[np.ndarray], int]":
        """Workload for the autotune probes: caller-supplied real
        utterances when given (capped to ~``seconds`` of audio so probe
        cost stays bounded), else the seeded bench-like lognormal int16
        synthetic. Probing the REAL shard's length mix matters: the
        synthetic caps at 25 s while production runs to the 60 s cap, and
        corpus length distributions differ — the picked format can
        mis-rank on a workload it never saw (VERDICT r3 weak #4)."""
        sr = sr or self.engine_cfg.sample_rate
        if samples is not None:
            utts: List[np.ndarray] = []
            total = 0.0
            for a in samples:
                arr = np.asarray(a)
                utts.append(arr)
                # duration = the time axis, which for 2-D audio is the
                # LARGE axis (channels live on the small one, <=8 —
                # _prepare_mono's contract); len() would count channels
                # for channels-first input and break the seconds cap
                n = max(arr.shape) if arr.ndim == 2 else arr.size
                total += n / sr
                if total >= seconds:
                    break
            if not utts:
                raise ValueError("autotune samples must be non-empty")
            return utts, sr
        rng = np.random.default_rng(seed)
        utts = []
        total = 0.0
        max_dur = min(25.0, self.engine_cfg.max_chunk_seconds)
        while total < seconds:
            dur = float(np.clip(rng.lognormal(1.7, 0.9), 0.5, max_dur))
            utts.append(
                rng.integers(-4000, 4000, int(dur * sr), dtype=np.int16)
            )
            total += dur
        return utts, sr

    def _interleaved_ab(
        self, candidates, set_candidate, utts, sr: int, rounds: int
    ) -> dict:
        """Time ``rounds`` interleaved encode passes per candidate (one
        unmeasured warm pass each first, so compiles never contaminate
        timings) and return {candidate: median seconds}. Interleaving is
        the defense against fabric drift — the tunnel swings ±40% across
        minutes, so A/A/A B/B/B comparisons are worthless (NOTES r2)."""
        import time

        timings: dict = {c: [] for c in candidates}
        for c in candidates:  # unmeasured warm pass: compiles
            set_candidate(c)
            self.encode_batch(utts, sr=sr)
        for _ in range(max(1, rounds)):
            for c in candidates:
                set_candidate(c)
                t0 = time.perf_counter()
                self.encode_batch(utts, sr=sr)
                timings[c].append(time.perf_counter() - t0)
        return {c: float(np.median(ts)) for c, ts in timings.items()}

    def autotune_transfer(
        self,
        seconds: float = 40.0,
        rounds: int = 3,
        seed: int = 0,
        samples: Optional[Sequence[np.ndarray]] = None,
        sr: Optional[int] = None,
        try_compact: bool = False,
    ) -> str:
        """Pick the fastest ``code_transfer_format`` for THIS fabric by a
        within-process interleaved A/B, then switch the engine to it.

        The packed-vs-padded ranking is fabric-dependent (NOTES r3: packed
        wins on the latency-bound tunnel by +4.6%), so production guidance
        is "re-probe per fabric" — this method IS that probe, runnable at
        provisioning time right after :meth:`warmup` (CLI
        ``--code-transfer-format auto``). ``try_compact=True`` additionally
        probes the retired "compact" experiment, which has lost every
        measured A/B (tunnel r3 and CPU-local r4 — see NOTES).

        Pass ``samples`` (+ their ``sr``) to probe on REAL shard
        utterances instead of the synthetic lognormal — e.g. the first N
        decoded items of the shard being run (capped to ``seconds`` of
        audio); :meth:`request_autotune` wires this to the first
        production batch automatically. Encode is stateless, so switching
        formats only changes the wire layout; codes are bit-equal across
        formats (pinned by tests). Engine throughput stats are untouched.
        Returns the chosen format; per-format median seconds land in
        ``self.last_autotune``.
        """
        if self._multiprocess:
            raise RuntimeError(
                "autotune_transfer times per-process; SPMD multiprocess "
                "engines must set code_transfer_format explicitly (every "
                "process must dispatch the same programs)"
            )
        candidates = ["packed", "padded"]
        if self.num_codebooks % 2 != 0:
            candidates = ["padded"]
        elif try_compact and self.masked and self.mesh is None:
            # compact is a retired experiment (NOTES r4 decision): it lost
            # the tunnel A/B (r3: 607x vs packed 669x) AND the CPU-local
            # A/B (r4: slowest in 3/3 probes — its compaction compute costs
            # more than the byte savings are worth even when transfer is a
            # local memcpy). Probe it only on explicit request.
            candidates.append("compact")
        if len(candidates) == 1:
            # the constructor's odd-K fallback already pinned this format;
            # running a timed probe to "choose" the only option would burn
            # ~minutes of synthetic encode for nothing (ADVICE r3)
            self.last_autotune = {candidates[0]: 0.0}
            self._set_transfer_format(candidates[0])
            return candidates[0]
        utts, sr = self._probe_workload(seconds, seed, samples, sr)
        saved_stats, saved_cfg = self.stats, self.engine_cfg
        self.stats = EngineStats()
        try:
            medians = self._interleaved_ab(
                candidates, self._set_transfer_format, utts, sr, rounds
            )
        except Exception:
            # leave the engine exactly as configured before the probe
            self.engine_cfg = saved_cfg
            raise
        finally:
            self.stats = saved_stats
        self.last_autotune = medians
        best = min(candidates, key=lambda f: medians[f])
        self._set_transfer_format(best)
        logger.info(
            "autotune_transfer picked %r (medians: %s)",
            best,
            {f: f"{m:.3f}s" for f, m in medians.items()},
        )
        return best

    def autotune_pipeline_depth(
        self,
        depths: Sequence[int] = (6, 12, 18),
        seconds: float = 40.0,
        rounds: int = 3,
        seed: int = 0,
        samples: Optional[Sequence[np.ndarray]] = None,
        sr: Optional[int] = None,
    ) -> int:
        """Pick the fastest ``pipeline_depth`` (in-flight device batches)
        for THIS fabric by the same interleaved A/B as
        :meth:`autotune_transfer`, then switch the engine to it.

        Depth is the OTHER fabric-dependent knob: it hides per-call sync
        RTTs, worth +30% going 2→8 on the tunneled v5e (NOTES r2) with a
        small monotonic edge to 12-16 (r3 re-probe) — but on a local
        fabric with ~zero dispatch latency extra depth only buys device-
        buffer memory. Returns the chosen depth; per-depth median seconds
        land in ``self.last_autotune_depth``."""
        if self._multiprocess:
            raise RuntimeError(
                "autotune_pipeline_depth times per-process; SPMD "
                "multiprocess engines must set pipeline_depth explicitly"
            )
        depths = [int(d) for d in depths]
        if any(d < 1 for d in depths):
            raise ValueError(f"pipeline depths must be >= 1: {depths}")
        utts, sr = self._probe_workload(seconds, seed, samples, sr)
        saved_stats, saved_depth = self.stats, self.pipeline_depth
        self.stats = EngineStats()

        def set_depth(d: int) -> None:
            self.pipeline_depth = d

        try:
            medians = self._interleaved_ab(depths, set_depth, utts, sr, rounds)
        except Exception:
            self.pipeline_depth = saved_depth
            raise
        finally:
            self.stats = saved_stats
        self.last_autotune_depth = medians
        best = min(depths, key=lambda d: medians[d])
        set_depth(best)
        logger.info(
            "autotune_pipeline_depth picked %d (medians: %s)",
            best,
            {d: f"{m:.3f}s" for d, m in medians.items()},
        )
        return best

    def autotune_drain_policy(
        self,
        policies: Sequence[str] = ("fifo", "ready", "threaded"),
        seconds: float = 40.0,
        rounds: int = 3,
        seed: int = 0,
        samples: Optional[Sequence[np.ndarray]] = None,
        sr: Optional[int] = None,
    ) -> str:
        """Pick the fastest ``drain_policy`` for THIS fabric by the same
        interleaved A/B as :meth:`autotune_transfer`, then switch to it.

        The policy's sign flips with fabric state (r5 receipt,
        scripts/drain_policy_probe.py: in one fetch-RTT-bound window
        ready/threaded beat FIFO 512x/656x vs 422x median; a later window
        on the same host measured fifo 521x > threaded 467x > ready 442x
        — 12 interleaved rounds total, winners split 3/4/5). A knob whose
        ranking is a property of the fabric, not the code, belongs to the
        provisioning probe (CLI ``--drain-policy auto``), exactly like
        packed-vs-padded. Bits and result order are identical in every
        mode, so the probe is pure transport scheduling."""
        if self._multiprocess:
            raise RuntimeError(
                "autotune_drain_policy: SPMD multiprocess engines always "
                "drain FIFO (collection must not interleave with the "
                "collective dispatch schedule)"
            )
        policies = [str(p) for p in policies]
        allowed = {"fifo", "ready", "threaded"}
        if not set(policies) <= allowed:
            raise ValueError(f"unknown drain policies: {set(policies) - allowed}")
        utts, sr = self._probe_workload(seconds, seed, samples, sr)
        saved_stats, saved_cfg = self.stats, self.engine_cfg
        self.stats = EngineStats()

        def set_policy(p: str) -> None:
            self.engine_cfg = dataclasses.replace(self.engine_cfg, drain_policy=p)

        try:
            medians = self._interleaved_ab(policies, set_policy, utts, sr, rounds)
        except Exception:
            self.engine_cfg = saved_cfg
            raise
        finally:
            self.stats = saved_stats
        self.last_autotune_drain = medians
        best = min(policies, key=lambda p: medians[p])
        set_policy(best)
        if best != "threaded" and self._fetch_pool is not None:
            # the probe's "threaded" passes lazily created the fetch pool;
            # don't leave idle ta-fetch threads behind a fifo/ready winner
            self._fetch_pool.shutdown(wait=True)
            self._fetch_pool = None
        logger.info(
            "autotune_drain_policy picked %r (medians: %s)",
            best,
            {p: f"{m:.3f}s" for p, m in medians.items()},
        )
        return best

    def request_autotune(
        self,
        transfer: bool = True,
        depth: bool = False,
        seconds: float = 40.0,
        rounds: int = 3,
        depths: Sequence[int] = (6, 12, 18),
        on_complete: Optional[Callable[[], None]] = None,
    ) -> None:
        """Defer autotuning to the first :meth:`encode_batch` call, which
        probes on THAT call's actual utterances — the real workload's
        length mix and dtype — instead of the synthetic lognormal
        (VERDICT r3 weak #4). The first batch is encoded with the chosen
        config right after the probe; subsequent batches are untouched.
        ``on_complete`` (if given) runs after the probes pick, before the
        triggering batch is encoded — the CLI uses it to re-warm the full
        bucket lattices when the probe switches wire formats. CLI:
        ``--code-transfer-format auto-data`` / ``--pipeline-depth
        auto-data``."""
        if self._multiprocess:
            raise RuntimeError(
                "request_autotune: SPMD multiprocess engines must be "
                "configured explicitly"
            )
        self._pending_autotune = {
            "transfer": transfer,
            "depth": depth,
            "seconds": seconds,
            "rounds": rounds,
            "depths": tuple(depths),
            "on_complete": on_complete,
        }

    def _set_transfer_format(self, fmt: str) -> None:
        self.engine_cfg = dataclasses.replace(
            self.engine_cfg, code_transfer_format=fmt
        )

    def warmup(self, sr: int = 24_000, include_tails: bool = False) -> int:
        """Precompile the steady-state program set: one full-batch encode
        per bucket of the ``sr`` lattice (the fused-resample lattice when
        sr != engine rate). With the persistent XLA compile cache this
        front-loads the one-time-per-machine compile cost into
        provisioning instead of the first production shard (first compile
        through a tunnel can cost minutes per program).

        ``include_tails=True`` additionally compiles every tail-ladder
        batch size per bucket (the programs partially-filled groups hit) —
        the COMPLETE program set, ~10x the compiles; otherwise tails
        compile lazily on first use. Returns the number of programs
        warmed."""
        resample_arg, spf_io, domain_sr = self._resample_plan(sr)
        buckets = self._buckets_for(domain_sr, spf_io)
        mult = self._batch_multiple
        handles = []
        warmed = 0
        for bucket in buckets:
            budget_len = (
                bucket if resample_arg is None else bucket * resample_arg[0] // resample_arg[1]
            )
            full = self.engine_cfg.batch_size_for_bucket(budget_len, multiple_of=mult)
            # dispatch one REPRESENTATIVE group size per reachable program:
            # _dispatch maps n_real through batch_size_for_group, so warming
            # with the rounded batch size itself could re-round onto a
            # different program when the multiple is not ladder-aligned
            reps = {full: full}
            if include_tails:
                for n in range(1, full + 1):
                    reps.setdefault(
                        self.engine_cfg.batch_size_for_group(
                            budget_len, n, multiple_of=mult
                        ),
                        n,
                    )
            for n_rows in reps.values():
                rows = [np.zeros(bucket, dtype=np.int16)] * n_rows
                handles.append(self._dispatch(rows, bucket, resample_arg, budget_len))
                warmed += 1
                if len(handles) >= self.pipeline_depth:
                    self._collect(handles.pop(0))
        for h in handles:
            self._collect(h)
        # warmup work must not pollute throughput metrics
        self.stats = EngineStats()
        return warmed

    def encode_chunk(self, audio: np.ndarray, sr: int = 24_000) -> np.ndarray:
        """Single-utterance encode (reference encode_audio_chunk,
        yodas2-mimi/process_shard.py:197-220)."""
        return self.encode_batch([audio], sr)[0]

    def encode_batch_mixed(self, items: Sequence[tuple]) -> List[np.ndarray]:
        """Encode (audio, sr) pairs with heterogeneous sample rates, results
        in input order — grouped by rate so each engine call resamples
        uniformly (shared by the librispeech and MLS builders)."""
        srs = sorted({sr for _, sr in items})
        results: List[Optional[np.ndarray]] = [None] * len(items)
        for sr in srs:
            idxs = [i for i, (_, s) in enumerate(items) if s == sr]
            codes = self.encode_batch([items[i][0] for i in idxs], sr=sr)
            for i, c in zip(idxs, codes):
                results[i] = c
        return results
