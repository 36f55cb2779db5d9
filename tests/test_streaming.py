"""Streaming encoder: chunked push == one-shot encode, bit for bit."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.mimi.model import encode
from tokenize_audio_tpu.mimi.streaming import StreamingMimiEncoder

SPF = 1920


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def one_shot(params, cfg, audio):
    a = audio[None] if audio.ndim == 1 else audio
    n = a.shape[1]
    pad = -(-n // SPF) * SPF - n
    a = np.pad(a, ((0, 0), (0, pad)))
    codes, valid = encode(params, cfg, jnp.asarray(a), jnp.asarray([n] * a.shape[0]))
    return np.asarray(codes)[:, :, : int(np.asarray(valid)[0])]


def test_stream_equals_one_shot_aligned(tiny_oracle, rng):
    _, params, cfg = tiny_oracle
    audio = (rng.standard_normal(12 * SPF) * 0.3).astype(np.float32)
    enc = StreamingMimiEncoder(params, cfg, chunk_seconds=4 * SPF / 24_000)
    got = enc.encode_stream(audio)
    ref = one_shot(params, cfg, audio)[0]
    assert got.shape == ref.shape
    assert (got == ref).all()


def test_stream_equals_one_shot_ragged_tail(tiny_oracle, rng):
    """Final partial chunk (odd 25 Hz length) exercises the masked
    replicate-pad path mid-stream."""
    _, params, cfg = tiny_oracle
    n = 7 * SPF + 1000  # not chunk- or frame-aligned
    audio = (rng.standard_normal(n) * 0.3).astype(np.float32)
    enc = StreamingMimiEncoder(params, cfg, chunk_seconds=3 * SPF / 24_000)
    got = enc.encode_stream(audio)
    ref = one_shot(params, cfg, audio)[0]
    assert got.shape == ref.shape
    assert (got == ref).all()


def test_stream_incremental_push(tiny_oracle, rng):
    _, params, cfg = tiny_oracle
    audio = (rng.standard_normal(6 * SPF) * 0.3).astype(np.float32)
    enc = StreamingMimiEncoder(params, cfg, chunk_seconds=2 * SPF / 24_000)
    enc.reset()
    parts = [enc.push(audio[i : i + enc.chunk_samples]) for i in range(0, len(audio), enc.chunk_samples)]
    got = np.concatenate([p[0] for p in parts], axis=1)
    ref = one_shot(params, cfg, audio)[0]
    assert (got == ref).all()
    # reset gives a fresh stream (same first-chunk codes)
    enc.reset()
    again = enc.push(audio[: enc.chunk_samples])[0]
    assert (again == parts[0][0]).all()


def test_encode_streams_multiplexed_bit_equal(tiny_oracle, rng):
    """Batched multiplexing of variable-length streams == serial
    encode_stream of each, bit for bit — including rows that end mid-batch
    (per-row valid), a zero-length row, and ragged tails."""
    _, params, cfg = tiny_oracle
    lens = [12 * SPF, 3 * SPF + 700, 5 * SPF, 0]
    audios = [(rng.standard_normal(n) * 0.3).astype(np.float32) for n in lens]
    enc = StreamingMimiEncoder(params, cfg, batch=4, chunk_seconds=2 * SPF / 24_000)
    got = enc.encode_streams(audios)
    serial = StreamingMimiEncoder(params, cfg, batch=1, chunk_seconds=2 * SPF / 24_000)
    for a, g in zip(audios, got):
        ref = serial.encode_stream(a)
        assert g.shape == ref.shape
        assert (g == ref).all()


def test_encode_streams_horizon_cut_matches_serial_pieces(tiny_oracle, rng):
    """Streams beyond the KV horizon reset at the same whole-chunk boundary
    the serial piece loop cuts at: batched == piece-wise serial encode."""
    _, params, cfg = tiny_oracle
    chunk_s = 2 * SPF / 24_000
    max_s = 5 * SPF / 24_000  # horizon floors to 2 chunks (4 frames)
    enc = StreamingMimiEncoder(
        params, cfg, batch=2, chunk_seconds=chunk_s, max_seconds=max_s
    )
    lens = [11 * SPF + 300, 6 * SPF]
    audios = [(rng.standard_normal(n) * 0.3).astype(np.float32) for n in lens]
    got = enc.encode_streams(audios)
    serial = StreamingMimiEncoder(
        params, cfg, batch=1, chunk_seconds=chunk_s, max_seconds=max_s
    )
    horizon = (enc.max_frames_25 * SPF // 2) // enc.chunk_samples * enc.chunk_samples
    for a, g in zip(audios, got):
        parts = [
            serial.encode_stream(a[s : s + horizon]) for s in range(0, len(a), horizon)
        ]
        ref = np.concatenate(parts, axis=1)
        assert g.shape == ref.shape
        assert (g == ref).all()


def test_kv_capacity_guard(tiny_oracle):
    _, params, cfg = tiny_oracle
    enc = StreamingMimiEncoder(
        params, cfg, chunk_seconds=2 * SPF / 24_000, max_seconds=3 * SPF / 24_000
    )
    enc.push(np.zeros(enc.chunk_samples, dtype=np.float32))
    with pytest.raises(ValueError, match="KV-cache capacity"):
        enc.push(np.zeros(enc.chunk_samples, dtype=np.float32))


def test_windowed_stream_equals_windowed_batch(rng):
    """use_sliding_window=True: streaming ring-buffer KV == windowed batch
    encode bit-for-bit at T >> window, with O(window) cache memory and no
    capacity ceiling."""
    import dataclasses

    _, params, cfg = make_oracle(
        tiny_hf_config(layer_scale_initial_scale=1.0, initializer_range=0.1,
                       sliding_window=4)
    )
    wcfg = dataclasses.replace(cfg, use_sliding_window=True)
    # 24 frames @12.5Hz = 48 positions @25Hz >> window 4
    audio = (rng.standard_normal(24 * SPF) * 0.3).astype(np.float32)
    ref = one_shot(params, wcfg, audio)[0]
    full = one_shot(params, cfg, audio)[0]
    assert (ref != full).any(), "window too weak to discriminate"

    enc = StreamingMimiEncoder(params, wcfg, chunk_seconds=3 * SPF / 24_000,
                               max_seconds=6 * SPF / 24_000)  # << stream length
    assert enc.state.kv.shape[-2] == 4  # bounded by the window, not the stream
    got = enc.encode_stream(audio)
    assert got.shape == ref.shape
    assert (got == ref).all()


def test_windowed_encode_streams_never_resets(rng):
    """Multiplexed windowed streams past the nominal max_seconds horizon:
    no reset (the ring cache is bounded anyway) — every row equals its
    windowed ONE-SHOT encode, unlike full-causal mode's horizon pieces."""
    import dataclasses

    _, params, cfg = make_oracle(
        tiny_hf_config(layer_scale_initial_scale=1.0, initializer_range=0.1,
                       sliding_window=4)
    )
    wcfg = dataclasses.replace(cfg, use_sliding_window=True)
    enc = StreamingMimiEncoder(
        params, wcfg, batch=2, chunk_seconds=3 * SPF / 24_000,
        max_seconds=6 * SPF / 24_000,  # << stream length: would force a
        # horizon cut in full-causal mode
    )
    lens = [24 * SPF, 9 * SPF + 500]
    audios = [(rng.standard_normal(n) * 0.3).astype(np.float32) for n in lens]
    got = enc.encode_streams(audios)
    for a, g in zip(audios, got):
        ref = one_shot(params, wcfg, a)[0]
        assert g.shape == ref.shape
        assert (g == ref).all()


def test_windowed_stream_ragged_tail(rng):
    import dataclasses

    _, params, cfg = make_oracle(tiny_hf_config(sliding_window=4))
    wcfg = dataclasses.replace(cfg, use_sliding_window=True)
    audio = (rng.standard_normal(7 * SPF + 777) * 0.3).astype(np.float32)
    ref = one_shot(params, wcfg, audio)[0]
    enc = StreamingMimiEncoder(params, wcfg, chunk_seconds=2 * SPF / 24_000)
    got = enc.encode_stream(audio)
    assert got.shape == ref.shape
    assert (got == ref).all()
