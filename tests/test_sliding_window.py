"""Pin HF Mimi's attention-mask semantics for long audio (the >10 s regime).

Context: `kyutai/mimi`'s config declares ``sliding_window=250`` (10 s at the
25 Hz transformer rate), so it matters whether the parity target —
``MimiModel.encode`` invoked one-shot on <=60 s chunks, the only way the
reference ever calls it (yodas2-mimi/process_shard.py:215-218) — actually
applies that window. On the installed transformers (4.57.x), it does NOT:

  - ``MimiTransformerModel.forward`` builds its mask with
    ``create_causal_mask`` (modeling_mimi.py:1101), whose mask function is
    the plain ``causal_mask_function`` — never the sliding-window variant
    (masking_utils.py:745-800). ``create_sliding_window_causal_mask``
    exists but Mimi never calls it.
  - the eager and sdpa attention forwards never read
    ``self.sliding_window``; only the flash-attention-2 path forwards it
    (modeling_mimi.py:810), and the reference loads the model with the
    default (sdpa/eager) implementation.
  - ``MimiModel.encode`` encodes the whole input in ONE ``_encode_frame``
    call with no internal chunking (modeling_mimi.py:1505-1584), so the
    full-causal prefill mask covers the entire sequence.

A perturbation probe that *looks* like it shows a window — exact-0.0 output
deltas beyond position i+window — is an f32 underflow artifact: with
LayerScale 0.01 the true cross-window influence (~1e-7 with unit LayerScale)
shrinks below f32 resolution of the output values and cancels to exactly
0.0. ``test_hf_oneshot_attends_beyond_window`` runs the probe in a
mask-SENSITIVE configuration (LayerScale 1.0, boosted init) where the
influence is far above noise, and every other test here uses the same
sensitive regime so a mask mismatch cannot hide under quantization.

If a transformers upgrade ever flips Mimi to a real sliding-window mask,
these tests fail loudly — that is the signal to flip
``MimiConfig.use_sliding_window``'s default.
"""

import numpy as np
import pytest
import torch

from tokenize_audio_tpu.mimi import MimiConfig, config_from_hf, params_from_torch_model
from tokenize_audio_tpu.mimi.model import encode, transformer_apply

from tests.mimi_fixtures import make_oracle, tiny_hf_config

WINDOW = 16
T_LONG = 64  # >> WINDOW


def _hf_transformer(seed=0, layer_scale=1.0, init_range=0.1, layers=2):
    from transformers import MimiConfig as HFMimiConfig
    from transformers.models.mimi.modeling_mimi import MimiTransformerModel

    torch.manual_seed(seed)
    cfg = HFMimiConfig(
        hidden_size=32,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=8,
        intermediate_size=64,
        sliding_window=WINDOW,
        attn_implementation="eager",
        layer_scale_initial_scale=layer_scale,
        initializer_range=init_range,
    )
    return MimiTransformerModel(cfg).eval(), cfg


def _tfm_params(model):
    """Extract our transformer layer pytree from a standalone
    MimiTransformerModel (same key layout weights.convert_hf_state_dict
    reads under the encoder_transformer prefix)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = []
    i = 0
    while f"layers.{i}.input_layernorm.weight" in sd:
        p = f"layers.{i}"
        out.append(
            {
                "ln1_w": sd[f"{p}.input_layernorm.weight"],
                "ln1_b": sd[f"{p}.input_layernorm.bias"],
                "q": sd[f"{p}.self_attn.q_proj.weight"],
                "k": sd[f"{p}.self_attn.k_proj.weight"],
                "v": sd[f"{p}.self_attn.v_proj.weight"],
                "o": sd[f"{p}.self_attn.o_proj.weight"],
                "ls1": sd[f"{p}.self_attn_layer_scale.scale"],
                "ln2_w": sd[f"{p}.post_attention_layernorm.weight"],
                "ln2_b": sd[f"{p}.post_attention_layernorm.bias"],
                "fc1": sd[f"{p}.mlp.fc1.weight"],
                "fc2": sd[f"{p}.mlp.fc2.weight"],
                "ls2": sd[f"{p}.mlp_layer_scale.scale"],
            }
        )
        i += 1
    return out


def test_hf_oneshot_attends_beyond_window():
    """One-shot HF forward is full causal: perturbing position 0 changes
    outputs far beyond the declared sliding window."""
    model, _ = _hf_transformer()
    x = torch.randn(1, T_LONG, 32, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        base = model(x).last_hidden_state
        x2 = x.clone()
        x2[0, 0] += 10.0
        out = model(x2).last_hidden_state
    delta = (out - base).abs().max(-1).values[0]
    assert float(delta[:WINDOW].max()) > 1e-2  # probe sanity: near influence big
    beyond = delta[WINDOW + 4 :]
    # A real window would zero these BITWISE: the masked logit saturates at
    # finfo.min regardless of the perturbed key, so softmax weight and output
    # are bit-identical. Any nonzero delta ⇒ position 0 was attended.
    assert float(beyond.max()) > 0.0, (
        "HF one-shot forward shows NO influence beyond the sliding window — "
        "transformers now applies config.sliding_window in one-shot encode; "
        "flip MimiConfig.use_sliding_window's default to match"
    )


def test_full_causal_matches_hf_windowed_does_not():
    """Activation-level mask equivalence at T >> window: our full-causal
    transformer reproduces HF; a sliding-window mask diverges materially."""
    model, hf_cfg = _hf_transformer()
    params = _tfm_params(model)
    x = torch.randn(2, T_LONG, 32, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        ref = model(x).last_hidden_state.numpy()

    base = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=8,
        intermediate_size=64,
        sliding_window=WINDOW,
        layer_scale_initial_scale=1.0,
    )
    ours = np.asarray(
        transformer_apply(params, MimiConfig(**base), x.numpy())
    )
    win = np.asarray(
        transformer_apply(
            params, MimiConfig(**base, use_sliding_window=True), x.numpy()
        )
    )
    full_err = np.abs(ours - ref).max()
    win_err = np.abs(win - ref).max()
    assert full_err < 2e-5, f"full-causal mismatch vs HF: {full_err}"
    assert win_err > 1e-2, (
        f"windowed mask also matches HF ({win_err}) — the probe lost its "
        "sensitivity or transformers changed semantics; re-examine"
    )


def test_long_audio_e2e_code_parity_mask_sensitive():
    """End-to-end >=30 s code parity vs HF MimiModel.encode in a
    mask-sensitive regime (LayerScale 1.0, boosted init): codes match
    exactly with full causal, and the windowed mode provably flips codes
    (so this test CAN detect a mask bug)."""
    hf_cfg = tiny_hf_config(
        layer_scale_initial_scale=1.0, initializer_range=0.1, sliding_window=WINDOW
    )
    model, params, cfg = make_oracle(hf_cfg, seed=3)
    assert cfg.use_sliding_window is False

    sr = 24_000
    seconds = 32  # 400 frames @12.5 Hz = 800 positions @25 Hz >> window 16
    rng = np.random.default_rng(11)
    t = np.arange(seconds * sr) / sr
    audio = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 331 * t * (1 + 0.1 * np.sin(t)))
        + 0.05 * rng.standard_normal(seconds * sr)
    ).astype(np.float32)

    with torch.no_grad():
        ref = (
            model.encode(torch.from_numpy(audio)[None, None, :], num_quantizers=8)
            .audio_codes.numpy()[0]
        )

    ours, _ = encode(params, cfg, audio[None], None, num_quantizers=8)
    ours = np.asarray(ours)[0]
    assert ours.shape == ref.shape
    match = (ours == ref).mean()
    assert match == 1.0, f"full-causal long-audio code match {match:.4f} != 1.0"

    import dataclasses

    win_cfg = dataclasses.replace(cfg, use_sliding_window=True)
    win, _ = encode(params, win_cfg, audio[None], None, num_quantizers=8)
    win = np.asarray(win)[0]
    assert (win != ref).any(), (
        "windowed encode produced identical codes — oracle not mask-sensitive"
    )


def test_hf_chunked_cache_is_windowed_and_diverges_from_oneshot():
    """HF's own chunked path (carried past_key_values → DynamicCache with
    DynamicSlidingWindowLayer) evicts keys beyond the window and therefore
    does NOT reproduce its own one-shot encode. Documents why our streaming
    encoder targets one-shot (full-causal) semantics — the contract the
    reference's one-shot calls define."""
    model, _ = _hf_transformer(layers=1)
    x = torch.randn(1, T_LONG, 32, generator=torch.Generator().manual_seed(9))
    half = T_LONG // 2
    with torch.no_grad():
        one = model(x).last_hidden_state
        o1 = model(x[:, :half], use_cache=True)
        o2 = model(x[:, half:], past_key_values=o1.past_key_values, use_cache=True)
    chunked = torch.cat([o1.last_hidden_state, o2.last_hidden_state], dim=1)
    diff = (chunked - one).abs().max()
    assert float(diff) > 1e-3, (
        "HF chunked-with-cache now matches one-shot — transformers made the "
        "paths consistent; revisit the streaming design notes"
    )


def test_window_convention_matches_hf_mask_function():
    """Our windowed mask uses HF's exact convention: keys j allowed iff
    j <= i AND j > i - sliding_window (masking_utils.sliding_window_overlay)
    — pinned directly against the installed transformers mask function."""
    from transformers.masking_utils import sliding_window_causal_mask_function

    from tokenize_audio_tpu.mimi.model import _attention_mask

    w, t = 5, 17
    cfg = MimiConfig(sliding_window=w, use_sliding_window=True)
    ours = np.asarray(_attention_mask(cfg, t)) == 0.0  # True = allowed

    fn = sliding_window_causal_mask_function(w)
    z = torch.zeros((), dtype=torch.long)
    theirs = np.array(
        [
            [bool(fn(z, z, torch.tensor(i), torch.tensor(j))) for j in range(t)]
            for i in range(t)
        ]
    )
    assert (ours == theirs).all()
