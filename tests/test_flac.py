"""Native C++ FLAC decoder vs the Python fixture encoder: exact PCM
round-trips across every subframe type, residual mode, and stereo mode."""

import numpy as np
import pytest

from tests.flac_encoder import encode_flac
from tokenize_audio_tpu.io.flac import read_flac
from tokenize_audio_tpu.io import decode_audio


def pcm(rng, n, c=1, amp=20000):
    x = (rng.standard_normal((n, c)) * amp / 4).clip(-amp, amp).astype(np.int64)
    return x if c > 1 else x[:, 0]


def roundtrip(data, orig, bits=16):
    audio, sr = read_flac(data)
    scale = 1 << (bits - 1)
    got = np.round(audio * scale).astype(np.int64)
    ref = np.asarray(orig)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)
    return sr


@pytest.mark.parametrize(
    "kinds",
    [["verbatim"], ["constant"], ["fixed0"], ["fixed1"], ["fixed2"], ["fixed3"],
     ["fixed4"], ["lpc"], ["verbatim", "fixed2", "lpc"]],
)
def test_mono_subframe_kinds(rng, kinds):
    x = pcm(rng, 5000)
    if kinds == ["constant"]:
        x[:] = -1234
    sr = roundtrip(encode_flac(x, blocksize=1024, subframe_kinds=kinds), x)
    assert sr == 24_000


def test_escape_residual(rng):
    x = pcm(rng, 2000)
    roundtrip(encode_flac(x, blocksize=512, subframe_kinds=["fixed2"], escape=True), x)


def test_wasted_bits(rng):
    x = (pcm(rng, 1500) >> 3) << 3  # low 3 bits zero
    roundtrip(encode_flac(x, blocksize=512, subframe_kinds=["verbatim"], wasted=3), x)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes(rng, mode):
    x = pcm(rng, 3000, c=2)
    audio, sr = read_flac(encode_flac(x, blocksize=1000, stereo_mode=mode))
    got = np.round(audio * 32768).astype(np.int64)
    np.testing.assert_array_equal(got, x)


def test_decode_audio_dispatch_and_mono_mix(rng):
    x = pcm(rng, 2000, c=2)
    data = encode_flac(x, stereo_mode="mid_side")
    mono, sr = decode_audio(data)
    assert mono.shape == (2000,)
    ref = (x[:, 0] / 32768 + x[:, 1] / 32768) / 2
    np.testing.assert_allclose(mono, ref.astype(np.float32), atol=1e-6)


def test_raw_int16_mode(rng):
    x = pcm(rng, 3000)
    data = encode_flac(x)
    raw, sr = read_flac(data, raw_int16=True)
    assert raw.dtype == np.int16
    np.testing.assert_array_equal(raw.astype(np.int64), x)
    via_decode, _ = decode_audio(data, raw_int16=True)
    assert via_decode.dtype == np.int16
    np.testing.assert_array_equal(via_decode, raw)


def test_non_flac_rejected():
    with pytest.raises(ValueError, match="FLAC"):
        read_flac(b"RIFFxxxxWAVE" + b"\x00" * 50)


def test_odd_tail_block(rng):
    """Total not divisible by blocksize: final short frame decodes exactly."""
    x = pcm(rng, 4096 + 333)
    roundtrip(encode_flac(x, blocksize=4096, subframe_kinds=["fixed1"]), x)


def test_fuzz_malformed_inputs_never_crash(rng):
    """Truncations and random bitflips must raise (or decode fewer samples),
    never corrupt memory / crash the process."""
    x = pcm(rng, 3000)
    data = bytearray(encode_flac(x, blocksize=512, subframe_kinds=["fixed2", "lpc"]))
    # truncations at many offsets
    for cut in range(40, len(data), max(1, len(data) // 37)):
        try:
            audio, sr = read_flac(bytes(data[:cut]))
            assert audio.shape[0] <= 3000
        except ValueError:
            pass
    # random single-byte corruptions (past the header so STREAMINFO parses)
    for seed in range(200):
        r = np.random.default_rng(seed)
        pos = int(r.integers(60, len(data)))
        mut = bytearray(data)
        mut[pos] ^= int(r.integers(1, 256))
        try:
            audio, sr = read_flac(bytes(mut))
            assert audio.shape[0] <= 3000 * 4  # sane bound
        except ValueError:
            pass
