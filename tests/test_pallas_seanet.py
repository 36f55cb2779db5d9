"""Fused SEANet stage kernel: parity vs the XLA causal_conv1d path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.mimi_fixtures import make_oracle, tiny_hf_config
from tokenize_audio_tpu.mimi.model import encode
from tokenize_audio_tpu.ops.pallas.seanet import seanet_stage_pallas, stage_reference

SPF = 1920


def make_stage(rng, c, s):
    c2, cd = c // 2, 2 * c
    return (
        (rng.standard_normal((c2, c, 3)) * 0.2).astype(np.float32),
        (rng.standard_normal(c2) * 0.1).astype(np.float32),
        (rng.standard_normal((c, c2, 1)) * 0.2).astype(np.float32),
        (rng.standard_normal(c) * 0.1).astype(np.float32),
        (rng.standard_normal((cd, c, 2 * s)) * 0.1).astype(np.float32),
        (rng.standard_normal(cd) * 0.1).astype(np.float32),
    )


@pytest.mark.parametrize("c,s", [(64, 4), (128, 5), (16, 6), (8, 8)])
def test_stage_matches_reference(rng, c, s):
    params = make_stage(rng, c, s)
    t = 1024 * s + 384 * s  # ragged vs the tile size -> exercises padding
    x = (rng.standard_normal((2, c, t)) * 0.5).astype(np.float32)
    valid = np.array([t, t // 2 + s - 1], dtype=np.int32)
    for i, v in enumerate(valid):
        x[i, :, v:] = 0.0
    z, nv = seanet_stage_pallas(
        jnp.asarray(x), jnp.asarray(valid), *params, s, interpret=True
    )
    zr, nvr = stage_reference(jnp.asarray(x), jnp.asarray(valid), *params, s)
    assert z.shape == zr.shape
    assert (np.asarray(nv) == np.asarray(nvr)).all()
    np.testing.assert_allclose(np.asarray(z), np.asarray(zr), atol=2e-5, rtol=1e-5)
    # masked region is exactly zero
    assert (np.asarray(z)[1, :, int(nv[1]) :] == 0).all()


def test_carry_equals_no_tiling(rng):
    """Multiple tiles with carried left context == one-shot small input."""
    c, s = 8, 4
    params = make_stage(rng, c, s)
    t = 1024 * s * 3  # three full tiles
    x = (rng.standard_normal((1, c, t)) * 0.5).astype(np.float32)
    valid = np.array([t], dtype=np.int32)
    z, _ = seanet_stage_pallas(jnp.asarray(x), jnp.asarray(valid), *params, s, interpret=True)
    zr, _ = stage_reference(jnp.asarray(x), jnp.asarray(valid), *params, s)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zr), atol=2e-5, rtol=1e-5)


def test_full_model_codes_with_pallas_seanet(rng):
    """End-to-end: codes with seanet_backend="pallas" match the XLA path
    (deterministic seeds; agreement rate reported if not exact)."""
    _, params, cfg = make_oracle(tiny_hf_config())
    pcfg = dataclasses.replace(cfg, seanet_backend="pallas")
    audio = (rng.standard_normal((2, 6 * SPF)) * 0.3).astype(np.float32)
    valid = jnp.asarray([6 * SPF, 5 * SPF + 7])
    ref, vr = encode(params, cfg, jnp.asarray(audio), valid, num_quantizers=8)
    got, vg = encode(params, pcfg, jnp.asarray(audio), valid, num_quantizers=8)
    ref, got = np.asarray(ref), np.asarray(got)
    assert (np.asarray(vr) == np.asarray(vg)).all()
    match = (ref == got).mean()
    assert match == 1.0, f"code match {match:.4f} with pallas seanet backend"
