"""MP3 decode (system libmpg123 via ctypes): round-trips against in-process
LAME-encoded fixtures, fuzz robustness, and the two production mp3 corpora
end-to-end — Emilia mp3-in-tar (emilia-mimi/process_shard.py:473-537) and
Common Voice mp3-bytes-in-parquet (common-voice-mimi/
process_common_voice.py:195-232)."""

import json
import tarfile

import numpy as np
import pytest

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tests.mp3_encoder import encode_mp3
from tokenize_audio_tpu.config import EngineConfig
from tokenize_audio_tpu.datasets.parquet_utils import read_parquet, write_parquet
from tokenize_audio_tpu.engine import MimiEncoderEngine
from tokenize_audio_tpu.hub import LocalHub
from tokenize_audio_tpu.io.decode import decode_audio
from tokenize_audio_tpu.io.mp3 import read_mp3

SR = 24_000


def sine(seconds=1.0, hz=440.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def aligned_corr(decoded, original, sr):
    """Correlation after removing the encoder delay (found by x-corr)."""
    n = min(1 << 15, len(original) - 1)
    c = np.correlate(decoded[: n + 4000], original[:n], mode="valid")
    lag = int(np.argmax(c))
    m = min(len(decoded) - lag, len(original))
    return float(np.corrcoef(decoded[lag : lag + m], original[:m])[0, 1])


def test_mono_roundtrip_24k():
    x = sine(2.0)
    blob = encode_mp3((x * 32000).astype(np.int16), SR)
    audio, sr = read_mp3(blob)
    assert sr == SR and audio.ndim == 1 and audio.dtype == np.float32
    # decoded length = input + codec delay/padding, never less
    assert len(x) <= len(audio) <= len(x) + 4096
    assert aligned_corr(audio, x, sr) > 0.99
    # raw_int16 is a no-op for mp3 (float synthesis output) — must not error
    audio_raw, _ = read_mp3(blob, raw_int16=True)
    assert audio_raw.dtype == np.float32
    np.testing.assert_array_equal(audio_raw, audio)


def test_roundtrip_48k():
    x = sine(1.0, sr=48_000)
    audio, sr = read_mp3(encode_mp3((x * 32000).astype(np.int16), 48_000))
    assert sr == 48_000
    assert aligned_corr(audio, x, sr) > 0.99


def test_stereo_and_mono_mixdown():
    x = sine(1.0)
    pcm = np.stack([(x * 32000).astype(np.int16), (x * 16000).astype(np.int16)], axis=1)
    blob = encode_mp3(pcm, SR)
    audio, sr = read_mp3(blob)
    assert audio.ndim == 2 and audio.shape[1] == 2
    # decode_audio sniffs the format from bytes (no extension) and mixes down
    mono, sr2 = decode_audio(blob)
    assert sr2 == SR and mono.ndim == 1
    assert np.allclose(mono, audio.mean(axis=1), atol=1e-6)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        read_mp3(b"")
    with pytest.raises(ValueError):
        read_mp3(np.random.default_rng(0).bytes(4096))
    with pytest.raises(ValueError, match="no decoder|no decodable"):
        decode_audio(b"\x00" * 100)


def test_truncation_fuzz():
    """Cut a valid stream at every kind of boundary: decode must return a
    (possibly shorter) prefix or raise ValueError — never crash/hang."""
    blob = encode_mp3((sine(1.0) * 32000).astype(np.int16), SR)
    full, _ = read_mp3(blob)
    for cut in [len(blob) - 1, len(blob) // 2, 417, 100, 10, 1]:
        try:
            audio, sr = read_mp3(blob[:cut])
            assert sr == SR and len(audio) <= len(full)
        except ValueError:
            pass


def test_bitflip_fuzz():
    blob = bytearray(encode_mp3((sine(0.5) * 32000).astype(np.int16), SR))
    rng = np.random.default_rng(7)
    for _ in range(20):
        b = bytearray(blob)
        for pos in rng.integers(0, len(b), size=8):
            b[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            audio, _ = read_mp3(bytes(b))
            assert audio.dtype == np.float32
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Production-corpus e2e on real mp3 payloads
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def make_engine(tiny_oracle):
    _, params, cfg = tiny_oracle
    return MimiEncoderEngine(
        params, cfg, EngineConfig(batch_size=2, min_bucket_seconds=0.25, max_chunk_seconds=2.0)
    )


def test_emilia_mp3_tar_end_to_end(tmp_path, rng, tiny_oracle):
    from tokenize_audio_tpu.datasets.emilia import EmiliaShardProcessor

    shard = "EN_B00000"
    src_dir = tmp_path / "tar_src"
    src_dir.mkdir()
    for spk in (1, 2):
        uid = f"{shard}_S{spk:05d}_W000000"
        audio = (rng.standard_normal(int(SR * 0.4)) * 0.2).astype(np.float32)
        (src_dir / f"{uid}.mp3").write_bytes(
            encode_mp3((audio * 32000).astype(np.int16), SR)
        )
        json.dump(
            {"text": f"utt {spk}", "speaker": f"SPEAKER_{spk:02d}"},
            open(src_dir / f"{uid}.json", "w"),
        )
    tar_path = tmp_path / f"{shard}.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(src_dir, arcname=shard)
    src = LocalHub(str(tmp_path / "src_hub"))
    src.upload_file(str(tar_path), f"Emilia/EN/{shard}.tar")

    dst = LocalHub(str(tmp_path / "dst_hub"))
    rep = EmiliaShardProcessor(
        "Emilia", "EN", shard, src, dst, make_engine(tiny_oracle), str(tmp_path / "work")
    ).process()
    assert rep["status"] == "processed" and rep["rows"] == 4
    rows = read_parquet(str(tmp_path / "dst_hub" / "Emilia" / "EN" / f"{shard}.parquet"))
    assert all("<|audio_start|>" in r["text"] for r in rows)
    # audio spans must be whole frames of real codes
    for r in rows:
        span = r["text"].split("<|audio_start|>")[1].split("<|audio_end|>")[0]
        assert len(span) % 8 == 0 and len(span) > 0


def test_common_voice_mp3_bytes_end_to_end(tmp_path, rng, tiny_oracle):
    from tokenize_audio_tpu.datasets.parquet_corpus import SPECS, process_shard

    src = LocalHub(str(tmp_path / "src"))
    dst = LocalHub(str(tmp_path / "dst"))
    rows = []
    for i in range(3):
        audio = (rng.standard_normal(int(48_000 * 0.4)) * 0.2).astype(np.float32)
        rows.append(
            {
                "id": f"cv{i}",
                "sentence": f"phrase {i}",
                "client_id": f"spk{i}",
                "audio": {"bytes": encode_mp3((audio * 32000).astype(np.int16), 48_000)},
            }
        )
    local = write_parquet(rows, str(tmp_path / "shard0.parquet"))
    src.upload_file(local, "en/shard0.parquet")

    rep = process_shard(
        SPECS["common_voice"],
        "shard0",
        "en",
        src,
        dst,
        make_engine(tiny_oracle),
        str(tmp_path / "work"),
        str(tmp_path / "prog"),
    )
    assert rep["status"] == "processed" and rep["rows"] == 6
    out = read_parquet(str(tmp_path / "dst" / "en" / "shard0.parquet"))
    assert {r["id"] for r in out} == {f"cv{i}_type{t}" for i in range(3) for t in (1, 2)}


def test_emilia_corrupt_member_skipped(tmp_path, rng, tiny_oracle):
    """A corrupt mp3 inside the tar drops that utterance, not the shard
    (per-item isolation; the shard still uploads with the good rows)."""
    from tokenize_audio_tpu.datasets.emilia import EmiliaShardProcessor

    shard = "EN_B00001"
    src_dir = tmp_path / "tar_src"
    src_dir.mkdir()
    good = f"{shard}_S00001_W000000"
    audio = (rng.standard_normal(int(SR * 0.4)) * 0.2).astype(np.float32)
    (src_dir / f"{good}.mp3").write_bytes(
        encode_mp3((audio * 32000).astype(np.int16), SR)
    )
    json.dump({"text": "ok", "speaker": "SPEAKER_01"}, open(src_dir / f"{good}.json", "w"))
    bad = f"{shard}_S00002_W000000"
    (src_dir / f"{bad}.mp3").write_bytes(b"\x00" * 400)  # not an mp3
    json.dump({"text": "bad", "speaker": "SPEAKER_02"}, open(src_dir / f"{bad}.json", "w"))

    tar_path = tmp_path / f"{shard}.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(src_dir, arcname=shard)
    src = LocalHub(str(tmp_path / "src_hub"))
    src.upload_file(str(tar_path), f"Emilia/EN/{shard}.tar")

    rep = EmiliaShardProcessor(
        "Emilia", "EN", shard, src, LocalHub(str(tmp_path / "dst_hub")),
        make_engine(tiny_oracle), str(tmp_path / "work"),
    ).process()
    assert rep["status"] == "processed"
    assert rep["failed_files"] == [bad]
    assert rep["rows"] == 2  # the good speaker's type1+type2


def test_id3v2_prefix_handled():
    """Real corpus mp3s carry ID3v2 tags; mpg123 skips them and the magic
    sniffer routes 'ID3'-prefixed bytes to the mp3 decoder."""
    x = sine(0.5)
    frames = encode_mp3((x * 32000).astype(np.int16), SR)
    # minimal ID3v2.3 header: "ID3", ver 3.0, no flags, syncsafe size
    payload = b"\x00" * 64
    size = len(payload)
    syncsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    )
    tagged = b"ID3\x03\x00\x00" + syncsafe + payload + frames
    audio, sr = read_mp3(tagged)
    assert sr == SR and len(audio) >= len(x)
    via_registry, sr2 = decode_audio(tagged)
    assert sr2 == SR and len(via_registry) == len(audio)
