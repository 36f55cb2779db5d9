"""Decoder parity vs HF torch MimiModel.decode, and full codec round trip."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.mimi.decoder import decode
from tokenize_audio_tpu.mimi.model import encode


@pytest.fixture(scope="module")
def tiny_oracle():
    return make_oracle(tiny_hf_config())


def test_decode_matches_hf(tiny_oracle, rng):
    model, params, cfg = tiny_oracle
    codes = rng.integers(0, cfg.codebook_size, size=(2, 8, 6))
    got = np.asarray(decode(params, cfg, jnp.asarray(codes)))
    with torch.no_grad():
        ref = model.decode(torch.tensor(codes)).audio_values.numpy()
    ref2 = ref.reshape(got.shape)
    scale = np.abs(ref2).max() + 1e-9
    assert got.shape[-1] == 6 * 1920
    np.testing.assert_allclose(got, ref2, atol=3e-4 * scale, rtol=1e-3)


def test_decode_all_codebooks(tiny_oracle, rng):
    model, params, cfg = tiny_oracle
    codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.num_quantizers, 4))
    got = np.asarray(decode(params, cfg, jnp.asarray(codes)))
    with torch.no_grad():
        ref = model.decode(torch.tensor(codes)).audio_values.numpy().reshape(got.shape)
    scale = np.abs(ref).max() + 1e-9
    np.testing.assert_allclose(got, ref, atol=3e-4 * scale, rtol=1e-3)


def test_full_roundtrip_audio_to_str_to_audio(tiny_oracle, rng):
    """audio -> codes -> audio' -> codes': re-encode of the decoded audio is
    consistent between our stack and HF (the audio_to_str/str_to_audio
    helpers, librispeech-mimi/utils.py:58-81)."""
    model, params, cfg = tiny_oracle
    audio = (rng.standard_normal(4 * 1920) * 0.3).astype(np.float32)[None, :]
    codes, _ = encode(params, cfg, jnp.asarray(audio), jnp.asarray([audio.shape[1]]))
    wav = np.asarray(decode(params, cfg, codes))
    with torch.no_grad():
        ref_wav = (
            model.decode(torch.from_numpy(np.asarray(codes)))
            .audio_values.numpy()
            .reshape(wav.shape)
        )
    scale = np.abs(ref_wav).max() + 1e-9
    np.testing.assert_allclose(wav, ref_wav, atol=3e-4 * scale, rtol=1e-3)
