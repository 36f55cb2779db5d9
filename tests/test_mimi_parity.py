"""Golden-parity tests: JAX Mimi encoder vs HF torch MimiModel.

The oracle is a seeded random-weight ``MimiModel(MimiConfig())`` built from
the baked-in transformers package (no network). Architectural bit-exactness
proven here transfers to the real ``kyutai/mimi`` checkpoint — the weight
converter consumes the same state-dict format either way.

North-star metric (BASELINE.md): 100% RVQ code exact-match at every
codebook level.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tokenize_audio_tpu.mimi import (
    config_from_hf,
    encode,
    params_from_torch_model,
)
from tokenize_audio_tpu.mimi.model import seanet_encode, transformer_apply

SPF = 1920  # samples per 12.5 Hz frame


@pytest.fixture(scope="module")
def oracle():
    from tests.mimi_fixtures import make_oracle

    return make_oracle()


def hf_encode(model, audio_np, num_quantizers=8):
    """Reference encode: MimiModel.encode -> first K codebooks
    (yodas2-mimi/process_shard.py:197-220)."""
    with torch.no_grad():
        x = torch.from_numpy(audio_np).float()[:, None, :]
        codes = model.encode(x).audio_codes
    return codes[:, :num_quantizers, :].numpy()


def rand_audio(rng, n):
    return (rng.standard_normal(n) * 0.3).astype(np.float32)


def test_seanet_and_transformer_activations_close(oracle, rng):
    """Per-layer numeric agreement (debug canary for end-to-end failures)."""
    model, params, cfg = oracle
    audio = rand_audio(rng, 2 * SPF)
    x = jnp.asarray(audio)[None, None, :]
    got_sea, _ = seanet_encode(params, cfg, x, None)
    with torch.no_grad():
        ref_sea = model.encoder(torch.from_numpy(audio)[None, None, :])
    np.testing.assert_allclose(
        np.asarray(got_sea), ref_sea.numpy(), atol=2e-4, rtol=1e-4
    )
    got_tfm = transformer_apply(params["tfm"], cfg, got_sea.transpose(0, 2, 1))
    with torch.no_grad():
        ref_tfm = model.encoder_transformer(ref_sea.transpose(1, 2)).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(got_tfm), ref_tfm.numpy(), atol=5e-4, rtol=1e-3
    )


def test_exact_code_match_aligned(oracle, rng):
    """Frame-aligned length, bucket == length: bit-exact codes, all 8 books."""
    model, params, cfg = oracle
    audio = rand_audio(rng, 4 * SPF)[None, :]
    ref = hf_encode(model, audio)
    got, valid = encode(params, cfg, jnp.asarray(audio), jnp.asarray([audio.shape[1]]))
    got = np.asarray(got)
    assert int(valid[0]) == ref.shape[2] == 4
    per_book = (got == ref).all(axis=(0, 2))
    assert per_book.all(), f"per-codebook exact match: {per_book}"


def test_exact_code_match_ragged_in_bucket(oracle, rng):
    """Masked mode: codes for a ragged utterance inside a larger bucket are
    bit-identical to the standalone unpadded HF encode — the determinism
    contract the reference lacks."""
    model, params, cfg = oracle
    n = 7000  # not frame aligned: 4 frames, odd 25 Hz length exercises the
    # replicate-pad fill in the 25->12.5 Hz downsample
    bucket = 6 * SPF
    audio = rand_audio(rng, n)
    ref = hf_encode(model, audio[None, :])  # standalone, exact length
    padded = np.zeros((1, bucket), dtype=np.float32)
    padded[0, :n] = audio
    got, valid = encode(params, cfg, jnp.asarray(padded), jnp.asarray([n]))
    frames = int(valid[0])
    assert frames == ref.shape[2] == -(-n // SPF)
    got = np.asarray(got)[:, :, :frames]
    per_book = (got == ref).all(axis=(0, 2))
    assert per_book.all(), f"per-codebook exact match: {per_book}"


def test_exact_code_match_batch(oracle, rng):
    """A ragged batch in one bucket: every row equals its standalone encode."""
    model, params, cfg = oracle
    lengths = [3000, 9600, 5555]
    bucket = 6 * SPF
    batch = np.zeros((len(lengths), bucket), dtype=np.float32)
    auds = []
    for i, n in enumerate(lengths):
        a = rand_audio(rng, n)
        batch[i, :n] = a
        auds.append(a)
    got, valid = encode(params, cfg, jnp.asarray(batch), jnp.asarray(lengths))
    got = np.asarray(got)
    for i, (a, n) in enumerate(zip(auds, lengths)):
        ref = hf_encode(model, a[None, :])
        frames = int(valid[i])
        assert frames == ref.shape[2]
        assert (got[i : i + 1, :, :frames] == ref).all(), f"row {i} mismatch"


def test_hf_batch_semantics_mode(oracle, rng):
    """masked=False reproduces HF's pad-to-length batch behavior exactly."""
    model, params, cfg = oracle
    bucket = 3 * SPF
    audio = np.zeros((2, bucket), dtype=np.float32)
    audio[0] = rand_audio(rng, bucket)
    audio[1, :2000] = rand_audio(rng, 2000)
    ref = hf_encode(model, audio)  # HF encodes the padded buffer as-is
    got, _ = encode(params, cfg, jnp.asarray(audio), masked=False)
    assert (np.asarray(got) == ref).all()


def test_num_quantizers_slicing(oracle, rng):
    """All 32 books work; the first-8 slice is what the pipeline stores."""
    model, params, cfg = oracle
    audio = rand_audio(rng, 2 * SPF)[None, :]
    ref = hf_encode(model, audio, num_quantizers=32)
    got, _ = encode(
        params, cfg, jnp.asarray(audio), jnp.asarray([audio.shape[1]]), num_quantizers=32
    )
    got = np.asarray(got)
    per_book = (got == ref).all(axis=(0, 2))
    assert per_book.all(), f"32-book exact match: {per_book}"


def test_bf16_fast_mode_runs_and_is_close(oracle, rng):
    """compute_dtype=bfloat16 is an opt-in throughput mode: codes are not
    bit-guaranteed; assert the mode runs and stays close on the oracle."""
    import dataclasses

    import jax.numpy as jnp

    _, params, cfg = oracle
    audio = rand_audio(rng, 2 * SPF)[None, :]
    v = jnp.asarray([audio.shape[1]])
    c32, _ = encode(params, cfg, jnp.asarray(audio), v)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    c16, _ = encode(params, cfg16, jnp.asarray(audio), v)
    match = (np.asarray(c32) == np.asarray(c16)).mean()
    # CPU bf16 matmuls go through oneDNN, whose reduction order varies
    # with thread scheduling (run-to-run nondeterminism under suite load),
    # so the match rate on this tiny oracle wobbles. The contract here is
    # only "the mode runs and is not garbage" — the decision-grade
    # accuracy number is the TPU k-means study (NOTES: ~33-38%), not this.
    assert match > 0.4, f"bf16 match rate collapsed: {match}"


def test_weight_norm_folding(oracle, rng):
    """A checkpoint with weight_norm parametrizations converts to the same
    params as the plain-weight export."""
    import torch as _torch

    from tokenize_audio_tpu.mimi.weights import params_from_torch_model

    model, params_plain, cfg = oracle
    import copy

    m2 = copy.deepcopy(model)
    for layer in [m2.encoder.layers[0], m2.encoder.layers[3]]:
        layer.apply_weight_norm()
    params_wn = params_from_torch_model(m2)
    np.testing.assert_allclose(
        params_wn["enc_in"]["w"], params_plain["enc_in"]["w"], atol=1e-6
    )
    np.testing.assert_allclose(
        params_wn["blocks"][0]["down"]["w"], params_plain["blocks"][0]["down"]["w"], atol=1e-6
    )
