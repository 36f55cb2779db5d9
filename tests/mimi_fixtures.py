"""Shared HF-oracle builders for parity tests.

``make_oracle`` constructs a seeded random-weight transformers MimiModel —
with codebook buffers filled, since HF random init leaves them degenerate —
plus the converted JAX params and config.
"""

import torch

from tokenize_audio_tpu.mimi import config_from_hf, params_from_torch_model


def make_oracle(hf_cfg=None, seed: int = 0):
    from transformers import MimiConfig as HFMimiConfig
    from transformers.models.mimi.modeling_mimi import MimiModel

    torch.manual_seed(seed)
    hf_cfg = hf_cfg or HFMimiConfig()
    hf_cfg._attn_implementation = "eager"
    model = MimiModel(hf_cfg).eval()
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for rvq in (
            model.quantizer.semantic_residual_vector_quantizer,
            model.quantizer.acoustic_residual_vector_quantizer,
        ):
            for layer in rvq.layers:
                cb = layer.codebook
                cb.embed_sum.copy_(torch.randn(cb.embed_sum.shape, generator=gen))
                cb.cluster_usage.copy_(
                    torch.rand(cb.cluster_usage.shape, generator=gen) * 2 + 0.5
                )
    return model, params_from_torch_model(model), config_from_hf(hf_cfg)


def tiny_jax_config(**overrides):
    """tiny_hf_config's dims as a pure MimiConfig — torch-free, for
    subprocesses (e.g. the multi-process DP children) that must not pay
    the oracle build."""
    from tokenize_audio_tpu.mimi import MimiConfig

    kw = dict(
        num_filters=8,
        hidden_size=32,
        num_hidden_layers=2,
        intermediate_size=64,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=8,
        codebook_size=64,
        codebook_dim=16,
        vector_quantization_hidden_dimension=16,
        num_quantizers=12,
        upsample_groups=32,
    )
    kw.update(overrides)
    return MimiConfig(**kw)


def tiny_hf_config(**overrides):
    """A fast CPU-testable Mimi: same 1920-sample frame, tiny widths."""
    from transformers import MimiConfig as HFMimiConfig

    kw = dict(
        num_filters=8,
        hidden_size=32,
        num_hidden_layers=2,
        intermediate_size=64,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=8,
        codebook_size=64,
        codebook_dim=16,
        vector_quantization_hidden_dimension=16,
        num_quantizers=12,
        upsample_groups=32,
    )
    kw.update(overrides)
    return HFMimiConfig(**kw)
