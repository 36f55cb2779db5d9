"""High-level MimiCodec API round trips."""

import numpy as np
import pytest
import torch

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.codec import MimiCodec
from tokenize_audio_tpu.config import EngineConfig


@pytest.fixture(scope="module")
def codec():
    model, params, cfg = make_oracle(tiny_hf_config())
    c = MimiCodec(
        params,
        cfg,
        EngineConfig(batch_size=2, min_bucket_seconds=0.25, max_chunk_seconds=2.0),
        num_codebooks=8,
    )
    return model, c


def test_audio_to_str_to_audio(codec, rng):
    model, c = codec
    audio = (rng.standard_normal(3 * 1920) * 0.3).astype(np.float32)
    s = c.audio_to_str(audio)
    assert len(s) == 3 * 8
    wav = c.str_to_audio(s)
    assert wav.shape == (3 * 1920,)
    with torch.no_grad():
        ref_codes = model.encode(torch.from_numpy(audio)[None, None, :]).audio_codes[:, :8]
        ref_wav = model.decode(ref_codes).audio_values.numpy().reshape(-1)
    scale = np.abs(ref_wav).max() + 1e-9
    np.testing.assert_allclose(wav, ref_wav, atol=3e-4 * scale, rtol=1e-3)


def test_encode_resamples(codec, rng):
    _, c = codec
    audio16 = (rng.standard_normal(16_000) * 0.3).astype(np.float32)
    codes = c.encode(audio16, sr=16_000)
    assert codes.shape == (8, -(-24_000 // 1920))


def test_from_hf_dir(tmp_path, rng):
    """Local HF snapshot layout (config.json + model.safetensors) loads
    with the checkpoint's own (non-default) configuration."""
    import json

    import torch
    from safetensors.torch import save_file

    from tests.mimi_fixtures import make_oracle, tiny_hf_config
    from tokenize_audio_tpu.codec import MimiCodec

    hf_cfg = tiny_hf_config()
    model, _, _ = make_oracle(hf_cfg)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg.to_dict()))

    codec = MimiCodec.from_hf_dir(str(tmp_path))
    assert codec.cfg.num_filters == 8  # the tiny checkpoint's config, not defaults
    audio = (rng.standard_normal(2 * 1920) * 0.3).astype(np.float32)
    got = codec.encode(audio)
    with torch.no_grad():
        ref = model.encode(torch.from_numpy(audio)[None, None, :]).audio_codes[0, :8].numpy()
    assert (got == ref).all()
