"""Golden tests for the DSP layer: resampler vs scipy.signal.resample_poly,
PCM conversion, framing/bucketing invariants."""

import numpy as np
import pytest
from scipy.signal import resample_poly

from tokenize_audio_tpu.core.audio import (
    bucket_for_length,
    encoded_frame_count,
    make_buckets,
    pad_to_bucket,
    pcm_to_float,
    resample,
    resample_output_length,
    split_long_audio,
)


@pytest.mark.parametrize(
    "orig_sr,target_sr",
    [
        (16_000, 24_000),  # MLS (mls-en-mimi-pretrain/process_shard.py:302-304)
        (48_000, 24_000),  # Common Voice (process_common_voice.py:231-232)
        (22_050, 24_000),
        (44_100, 24_000),
        (8_000, 24_000),
    ],
)
def test_resample_matches_scipy(rng, orig_sr, target_sr):
    # short signals: CPU lowering of dilated convs is slow; TPU is benched separately
    t = np.arange(int(orig_sr * 0.11)) / orig_sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)).astype(
        np.float32
    )
    import math

    g = math.gcd(orig_sr, target_sr)
    golden = resample_poly(x.astype(np.float64), target_sr // g, orig_sr // g)
    got = np.asarray(resample(x, orig_sr, target_sr))
    assert got.shape == golden.shape
    scale = np.abs(golden).max()
    np.testing.assert_allclose(got, golden, atol=2e-5 * scale, rtol=0)


def test_resample_batch_and_identity(rng):
    x = rng.standard_normal((3, 1600)).astype(np.float32)
    y = np.asarray(resample(x, 16_000, 24_000))
    assert y.shape == (3, 2400)
    # each row matches the single-row path
    single = np.asarray(resample(x[1], 16_000, 24_000))
    np.testing.assert_allclose(y[1], single, atol=1e-6)
    # same-rate passthrough
    np.testing.assert_array_equal(np.asarray(resample(x, 24_000, 24_000)), x)


def test_resample_output_length():
    assert resample_output_length(1600, 3, 2) == 2400
    assert resample_output_length(1601, 3, 2) == 2402  # ceil
    assert resample_output_length(480, 1, 2) == 240


def test_pcm_to_float():
    assert pcm_to_float(np.array([0, 16384, -32768], dtype=np.int16)).tolist() == [
        0.0,
        0.5,
        -1.0,
    ]
    assert pcm_to_float(np.array([128], dtype=np.uint8)).tolist() == [0.0]
    x = np.array([0.25], dtype=np.float64)
    assert pcm_to_float(x).dtype == np.float32


def test_encoded_frame_count():
    assert encoded_frame_count(1920) == 1
    assert encoded_frame_count(1921) == 2
    assert encoded_frame_count(24_000 * 60) == 750
    np.testing.assert_array_equal(
        encoded_frame_count(np.array([1, 1920, 3841])), [1, 1, 3]
    )


def test_buckets_frame_aligned():
    buckets = make_buckets(1.0, 60.0, 1.25)
    assert all(b % 1920 == 0 for b in buckets)
    assert buckets == tuple(sorted(set(buckets)))
    assert buckets[-1] == 24_000 * 60
    assert bucket_for_length(1, buckets) == buckets[0]
    assert bucket_for_length(buckets[2], buckets) == buckets[2]
    assert bucket_for_length(buckets[2] + 1, buckets) == buckets[3]
    # over-cap clips to the top bucket (callers split first)
    assert bucket_for_length(10**9, buckets) == buckets[-1]


def test_tail_ladder_batch_sizing():
    """Tail groups size to the {1..8} + mantissa-{2,3}x2^k ladder: exact for
    small groups, <=1.33x overshoot above (pow2's 2x gaps were eating the
    fine-lattice bucket savings — NOTES r3), dp-divisible, capped at full."""
    from tokenize_audio_tpu.config import EngineConfig

    ecfg = EngineConfig(batch_size=96)
    for n in range(1, 9):  # small groups: exact
        assert ecfg.batch_size_for_group(1000, n) == n
    assert ecfg.batch_size_for_group(1000, 9) == 12
    assert ecfg.batch_size_for_group(1000, 13) == 16
    assert ecfg.batch_size_for_group(1000, 17) == 24
    assert ecfg.batch_size_for_group(1000, 49) == 64
    assert ecfg.batch_size_for_group(1000, 70) == 96  # capped at full
    assert ecfg.batch_size_for_group(1000, 200) == 96
    # dp divisibility still honored
    assert ecfg.batch_size_for_group(1000, 3, multiple_of=4) == 4
    assert ecfg.batch_size_for_group(1000, 9, multiple_of=8) == 16


def test_pad_to_bucket(rng):
    utts = [rng.standard_normal(n).astype(np.float32) for n in (100, 250)]
    batch, lengths = pad_to_bucket(utts, 300)
    assert batch.shape == (2, 300)
    assert lengths.tolist() == [100, 250]
    np.testing.assert_array_equal(batch[0, 100:], 0)
    np.testing.assert_array_equal(batch[1, :250], utts[1])
    with pytest.raises(ValueError, match="exceeds bucket"):
        pad_to_bucket([np.zeros(301)], 300)


def test_pad_to_bucket_int16_fast_path(rng):
    # all-int16 rows stay int16 (device-side normalization path) ...
    pcm = [(rng.standard_normal(n) * 8000).astype(np.int16) for n in (100, 250)]
    batch, lengths = pad_to_bucket(pcm, 300)
    assert batch.dtype == np.int16
    np.testing.assert_array_equal(batch[1, :250], pcm[1])
    np.testing.assert_array_equal(batch[0, 100:], 0)
    # ... while any float row falls the whole batch back to normalized f32
    mixed, _ = pad_to_bucket([pcm[0], np.zeros(10, np.float32)], 300)
    assert mixed.dtype == np.float32
    np.testing.assert_array_equal(mixed[0, :100], pcm[0].astype(np.float32) / 32768.0)


def test_resample_many_matches_per_row(rng):
    """Grouped batch resample must be bit-identical to per-row resample —
    across mixed lengths (different padded buckets), int16/float inputs,
    and both rational ratios."""
    from tokenize_audio_tpu.core.audio import resample_many

    for orig_sr in (16_000, 48_000):
        lengths = [500, 1000, 3000, 3001, 9000, 40_000]
        floats = [
            (rng.standard_normal(n) * 0.3).astype(np.float32) for n in lengths
        ]
        ints = [(a * 32767).astype(np.int16) for a in floats]
        normed = [p.astype(np.float32) / 32768.0 for p in ints]
        got = resample_many(ints, orig_sr, 24_000, max_rows=3)
        for a, g in zip(normed, got):
            ref = np.asarray(resample(a, orig_sr, 24_000))
            np.testing.assert_array_equal(g, ref)
        # mixed dtype group falls back to host normalization, same result
        mixed = [ints[0], normed[1], ints[2], normed[3], ints[4], normed[5]]
        got_m = resample_many(mixed, orig_sr, 24_000, max_rows=6)
        for a, g in zip(normed, got_m):
            np.testing.assert_array_equal(g, np.asarray(resample(a, orig_sr, 24_000)))
    # same-rate passthrough normalizes int16
    same = resample_many([ints[0]], 24_000, 24_000)
    np.testing.assert_array_equal(same[0], normed[0])


def test_split_long_audio():
    x = np.arange(5000)
    parts = split_long_audio(x, 1920)
    assert [len(p) for p in parts] == [1920, 1920, 1160]
    np.testing.assert_array_equal(np.concatenate(parts), x)
    assert split_long_audio(x[:100], 1920)[0] is x[:100] or len(split_long_audio(x[:100], 1920)) == 1


def test_resample_bucketing_is_exact(rng):
    """Power-of-two input padding must not change the kept output prefix
    (upfirdn = full convolution; trailing zeros contribute nothing)."""
    for n in (1601, 4096, 5000):
        x = rng.standard_normal(n).astype(np.float32)
        golden = resample_poly(x.astype(np.float64), 3, 2)
        bucketed = np.asarray(resample(x, 16_000, 24_000, bucket_lengths=True))
        exact = np.asarray(resample(x, 16_000, 24_000, bucket_lengths=False))
        assert bucketed.shape == exact.shape == golden.shape
        np.testing.assert_array_equal(bucketed, exact)
        np.testing.assert_allclose(bucketed, golden, atol=2e-5 * np.abs(golden).max())


@pytest.mark.slow  # heavy compile load; full suite / CI only
def test_multichannel_audio_rejected_or_handled():
    from tests.mimi_fixtures import make_oracle, tiny_hf_config
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine

    _, params, cfg = make_oracle(tiny_hf_config())
    eng = MimiEncoderEngine(
        params, cfg, EngineConfig(batch_size=2, min_bucket_seconds=0.25, max_chunk_seconds=2.0)
    )
    rng2 = np.random.default_rng(0)
    stereo = (rng2.standard_normal((4000, 2)) * 0.2).astype(np.float32)
    codes = eng.encode_chunk(stereo)
    mono = eng.encode_chunk(stereo.mean(axis=1))
    assert codes.shape == mono.shape  # mixdown, not channel interleave
    assert (codes == mono).all()
