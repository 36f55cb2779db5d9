"""Centralized typed configuration and framework-wide constants.

The reference scatters these constants across ~10 files (e.g.
``librispeech-mimi/utils.py:13-15``, ``pretraining-data/
prepare_pretraining_data.py:79-86``, ``mls-en-mimi-pretrain/process_shard.py:33``);
here they live in exactly one place.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Mapping

# --- Codec rate facts (reference: yodas2-mimi/process_shard.py:266-270) ---
MIMI_SAMPLE_RATE: int = 24_000
FRAME_RATE: float = 12.5
SAMPLES_PER_FRAME: int = int(MIMI_SAMPLE_RATE / FRAME_RATE)  # 1920

# --- Code<->unicode mapping (reference: librispeech-mimi/utils.py:13-15,
#     pretraining-data/converter.py:11-15) ---
UNICODE_OFFSET: int = 0x4E00  # Acoustic-BPE paper offset (Shen et al., 2024)
UNICODE_OFFSET_LARGE: int = 0xE000  # private use area; production offset
NUM_CODEBOOKS: int = 8
CODEBOOK_SIZE: int = 2048

# --- Interleaved pretraining document special tokens
#     (reference: pretraining-data/prepare_pretraining_data.py:79-86) ---
SPECIAL_TOKENS: Mapping[str, str] = {
    "bos": "<|begin_of_text|>",
    "eos": "<|end_of_text|>",
    "text_start": "<|text_start|>",
    "text_end": "<|text_end|>",
    "audio_start": "<|audio_start|>",
    "audio_end": "<|audio_end|>",
}


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Configuration of the code<->text codec layer."""

    num_codebooks: int = NUM_CODEBOOKS
    codebook_size: int = CODEBOOK_SIZE
    unicode_offset: int = UNICODE_OFFSET_LARGE

    @property
    def vocab_range(self) -> tuple[int, int]:
        lo = self.unicode_offset
        return lo, lo + self.num_codebooks * self.codebook_size


@functools.lru_cache(maxsize=None)
def _tail_ladder(cap: int) -> tuple:
    """Allowed tail batch sizes up to ``cap``: {1..8} exact, then the
    mantissa-{2,3} x 2^k series. Bounded program count per bucket with at
    most 1.33x row overshoot (see batch_size_for_group)."""
    vals = {cap} | set(range(1, min(8, cap) + 1))
    for m in (2, 3):
        v = m
        while v <= cap:
            vals.add(v)
            v *= 2
    return tuple(sorted(vals))


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Configuration of the batch encoding engine.

    ``max_chunk_seconds`` mirrors the reference's 60 s split policy
    (yodas2-mimi/process_shard.py:292,436-493).  ``bucket_growth`` controls
    the geometric length-bucket lattice: static shapes keep XLA from
    recompiling and keep the MXU tiled.
    """

    batch_size: int = 16
    max_chunk_seconds: float = 60.0
    min_bucket_seconds: float = 1.0
    # 1.15 ≈ 26 buckets to 60 s: the r5 hardware A/B (interleaved, one
    # process, scripts/growth_probe.py) measured 1.15 faster than 1.25 in
    # 5/5 rounds (medians 722x vs 680x, padding efficiency 0.876 vs
    # 0.849) once the deferred-drain engine stopped being transport-bound
    # enough for padding waste to show through. The ~1.5x larger compiled
    # program set is one-time per machine via the persistent compile
    # cache (enable_compile_cache).
    bucket_growth: float = 1.15
    sample_rate: int = MIMI_SAMPLE_RATE
    num_codebooks: int = NUM_CODEBOOKS
    # samples budget per device batch: short buckets get proportionally
    # larger batches (keeps the MXU fed), long buckets smaller (bounds
    # activation memory). None -> fixed batch_size for every bucket.
    samples_per_batch: int | None = None
    max_batch_size: int = 128
    # >0: pieces of >cap audio carry this much left-context (encoded then
    # dropped), restoring receptive field across the 60 s cuts the reference
    # hard-breaks. 0 = exact reference split semantics.
    split_context_seconds: float = 0.0
    # what to do with audio over max_chunk_seconds:
    #   "split"  — reference parity: independent <=cap pieces, codes
    #              concatenated (yodas2-mimi/process_shard.py:436-493)
    #   "stream" — EXACT codes via the streaming encoder (conv caches + KV
    #              cache; bit-identical to a one-shot encode of the whole
    #              stream) up to stream_max_seconds, beyond which the split
    #              fallback applies at that much larger boundary
    long_audio_policy: str = "split"
    stream_max_seconds: float = 320.0  # HF one-shot horizon (8000 positions @25 Hz)
    # max >cap utterances multiplexed through ONE carried-state streaming
    # encoder (per-row valid ends; mimi/streaming.py encode_streams) — a
    # shard of K long videos streams in ~1/K the step dispatches. Each row
    # of a full-causal 320 s KV cache is ~131 MB f32, so 8 rows ~1 GB.
    stream_batch: int = 8
    # device->host dtype for fetched codes. uint16 is lossless (codebook
    # 2048) and halves bytes on the wire, but on the axon-tunnel v5e the
    # within-process A/B (scripts/fetch_dtype_probe.py) showed int32 wins
    # end-to-end every interleaved round — the sub-word convert/layout cost
    # on device exceeds the wire savings (raw device_get alone DOES favor
    # uint16 ~10x). Measure per fabric before changing. This is also the
    # dtype of the per-utterance arrays the engine RETURNS in every mode.
    code_transfer_dtype: str = "int32"
    # device->host wire format (mimi.model.encode ``transfer`` arg):
    #   "padded"  — (B, K, T_bucket) in code_transfer_dtype (classic).
    #   "packed"  — adjacent code pairs packed 16-bit-aligned into int32
    #               words: half the bytes, zero-cost host unpack (a
    #               little-endian view), no sub-word dtype on the wire.
    #   "compact" — packed + valid frames gathered to the front on device;
    #               the engine fetches only a 16-step-lattice prefix sized
    #               from host-known frame counts, so bucket pad and row
    #               pad never cross the wire (~2.6x fewer fetch bytes at
    #               bucket_efficiency 0.76). Requires masked mode; not
    #               supported under a mesh (the compaction cumsum would
    #               gather across devices).
    # Decided by within-process interleaved A/B (scripts/fetch_pack_probe.py,
    # tunneled v5e, 5 rounds): packed median 669x (spread 659-672) vs
    # padded 640x (596-660) vs compact 607x — compact fetches the fewest
    # bytes (0.78 s vs 1.43 s) but its extra per-batch prefix dispatch
    # costs ~2x the savings on a latency-bound tunnel. Re-probe per
    # fabric: on local-PCIe fabrics compact's byte savings should win —
    # MimiEncoderEngine.autotune_transfer() (CLI --code-transfer-format
    # auto) runs that probe at provisioning time and keeps the winner.
    code_transfer_format: str = "packed"
    # device->host collection order for in-flight batches:
    #   "fifo"     — oldest first (dispatch order; reference-shaped)
    #   "ready"    — collect whichever in-flight handle reports is_ready()
    #                first, falling back to the oldest when none do.
    #   "threaded" — hand each in-flight handle to a small fetch pool the
    #                moment it is dispatched; the main loop then waits on
    #                futures. Each blocking fetch pays one tunnel RTT —
    #                FIFO serializes those RTTs, "ready" only reorders
    #                them, the pool overlaps them. Single-process only
    #                (a mesh multiprocess engine keeps FIFO — collection
    #                must not interleave with collective dispatch).
    # Result ORDER and BITS are identical in every mode (results scatter
    # to their piece index); this is pure transport scheduling. The r5
    # interleaved A/B at depth 18 (scripts/drain_policy_probe.py, 12
    # rounds across two fabric windows) found the ranking FLIPS with
    # fabric state: ready/threaded won a fetch-RTT-bound window by
    # +21/+55% median, fifo led a calmer window — so the default stays
    # fifo (simplest, SPMD-legal) and the knob is a provisioning probe:
    # MimiEncoderEngine.autotune_drain_policy() / CLI --drain-policy auto.
    drain_policy: str = "fifo"
    # fetch pool width for drain_policy="threaded" (concurrent blocking
    # device_gets; each holds one batch's host buffer while it drains)
    fetch_threads: int = 4

    @property
    def max_chunk_samples(self) -> int:
        return int(self.max_chunk_seconds * self.sample_rate)

    def batch_size_for_bucket(self, bucket_len: int, multiple_of: int = 1) -> int:
        if self.samples_per_batch is None:
            b = self.batch_size
        else:
            b = max(1, self.samples_per_batch // bucket_len)
            b = min(b, self.max_batch_size)
        b = max(multiple_of, b // multiple_of * multiple_of)
        return b

    def batch_size_for_group(
        self, bucket_len: int, n_real: int, multiple_of: int = 1
    ) -> int:
        """Static batch size for a (possibly tail) group: the bucket's full
        batch size, shrunk to the smallest tail-ladder rung >= n_real.

        The ladder is exact sizes 1..8 plus the mantissa-{2,3} x 2^k series
        (12, 16, 24, 32, 48, ...) — worst-case row overshoot 1.33x vs the
        power-of-two ladder's 2x. Measured on the bench workload (192-utt
        lognormal, 6 seeds): padding efficiency 0.85 vs pow2's 0.77 at
        growth 1.25, with the SAME compiled-program count (~20); pow2 was
        the reason finer bucket lattices bought nothing — bucket-pad
        savings were eaten by tail-row pad (NOTES r3)."""
        full = self.batch_size_for_bucket(bucket_len, multiple_of)
        for v in _tail_ladder(full):
            if v >= min(n_real, full):
                return min(full, -(-v // multiple_of) * multiple_of)
        return full
