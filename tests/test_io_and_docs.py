"""WAV io round-trips, decoder registry, and document template formats."""

import numpy as np
import pytest

from tokenize_audio_tpu.datasets import (
    asr_document,
    interleaved_type1,
    interleaved_type2,
    speaker_tagged_text,
    tts_document,
)
from tokenize_audio_tpu.io import decode_audio, read_wav, register_decoder, write_wav


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.standard_normal(4800) * 0.2).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 24_000)
    y, sr = read_wav(p)
    assert sr == 24_000
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)  # write x32767, read /32768


def test_wav_stereo_and_decode_mono(tmp_path, rng):
    x = (rng.standard_normal((1000, 2)) * 0.2).astype(np.float32)
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 48_000)
    y, sr = read_wav(p)
    assert y.shape == (1000, 2)
    mono, sr2 = decode_audio(p)
    assert mono.shape == (1000,)
    np.testing.assert_allclose(mono, y.mean(axis=1), atol=1e-6)


def test_wav_raw_int16(tmp_path, rng):
    pcm = (rng.standard_normal(2000) * 8000).astype(np.int16)
    p = str(tmp_path / "raw.wav")
    write_wav(p, pcm.astype(np.float32) / 32767.0, 24_000)  # writer scales x32767
    raw, sr = read_wav(p, raw_int16=True)
    assert raw.dtype == np.int16 and sr == 24_000
    norm, _ = read_wav(p)
    np.testing.assert_array_equal(raw.astype(np.float32) / 32768.0, norm)
    via_decode, _ = decode_audio(p, raw_int16=True)
    assert via_decode.dtype == np.int16
    np.testing.assert_array_equal(via_decode, raw)


def test_decode_raw_int16_stereo_mixes_normalized(tmp_path, rng):
    """Stereo + raw_int16: the mono mixdown must come back as normalized
    float32, never raw-scale floats."""
    x = (rng.standard_normal((500, 2)) * 0.2).astype(np.float32)
    p = str(tmp_path / "st.wav")
    write_wav(p, x, 24_000)
    mono, _ = decode_audio(p, raw_int16=True)
    assert mono.dtype == np.float32
    assert np.abs(mono).max() <= 1.0
    ref, _ = decode_audio(p)
    np.testing.assert_array_equal(mono, ref)


def test_decode_magic_sniff(tmp_path, rng):
    x = np.zeros(100, dtype=np.float32)
    p = str(tmp_path / "noext")
    write_wav(p, x, 16_000)
    y, sr = decode_audio(p)
    assert sr == 16_000 and len(y) == 100


def test_decoder_registry():
    with pytest.raises(ValueError, match="no decoder"):
        decode_audio(b"\x00" * 64, format="xyz")
    register_decoder("xyz", lambda data: (np.ones(3, np.float32), 8000))
    y, sr = decode_audio(b"\x00" * 64, format="xyz")
    assert sr == 8000 and y.tolist() == [1, 1, 1]


def test_document_templates():
    assert tts_document("hi", "AB") == (
        "<|begin_of_text|><|text_start|>hi<|text_end|>"
        "<|audio_start|>AB<|audio_end|><|end_of_text|>"
    )
    assert asr_document("hi", "AB") == (
        "<|begin_of_text|><|audio_start|>AB<|audio_end|>"
        "<|text_start|>hi<|text_end|><|end_of_text|>"
    )
    assert tts_document("hi", "AB", speaker_tag=0) == (
        "<|begin_of_text|><|text_start|>[0]hi<|text_end|>"
        "<|audio_start|>AB<|audio_end|><|end_of_text|>"
    )
    assert speaker_tagged_text("hello", 2) == "[2]hello"


def test_interleaved_multi_chunk():
    chunks = [("a", "X"), ("b", "Y")]
    t1 = interleaved_type1(chunks)
    assert t1 == (
        "<|begin_of_text|>"
        "<|text_start|>a<|text_end|><|audio_start|>X<|audio_end|>"
        "<|text_start|>b<|text_end|><|audio_start|>Y<|audio_end|>"
        "<|end_of_text|>"
    )
    t2 = interleaved_type2(chunks, speaker_tags=[0, 1])
    assert t2 == (
        "<|begin_of_text|>"
        "<|audio_start|>X<|audio_end|><|text_start|>[0]a<|text_end|>"
        "<|audio_start|>Y<|audio_end|><|text_start|>[1]b<|text_end|>"
        "<|end_of_text|>"
    )


def test_prefetch_map_order_and_errors():
    import time

    from tokenize_audio_tpu.io.prefetch import prefetch_map

    def slow_sq(x):
        time.sleep(0.01 * (5 - x % 5))  # out-of-order completion
        return x * x

    got = list(prefetch_map(slow_sq, range(12), workers=4, depth=6))
    assert got == [x * x for x in range(12)]
    # workers=0 falls back to serial
    assert list(prefetch_map(slow_sq, [1, 2], workers=0)) == [1, 4]

    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return x

    gen = prefetch_map(boom, range(6), workers=2)
    assert next(gen) == 0
    with pytest.raises(ValueError, match="boom"):
        list(gen)


def test_wav_fuzz_malformed_inputs(tmp_path, rng):
    """Truncations/bitflips raise ValueError (never struct.error or crash)."""
    p = str(tmp_path / "f.wav")
    write_wav(p, (rng.standard_normal(500) * 0.2).astype(np.float32), 24_000)
    data = bytearray(open(p, "rb").read())
    for cut in range(4, len(data), 7):
        try:
            read_wav(bytes(data[:cut]))
        except ValueError:
            pass
    for seed in range(150):
        r = np.random.default_rng(seed)
        mut = bytearray(data)
        mut[int(r.integers(0, len(data)))] ^= int(r.integers(1, 256))
        try:
            read_wav(bytes(mut))
        except ValueError:
            pass
