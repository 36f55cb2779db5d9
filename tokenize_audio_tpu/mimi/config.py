"""Mimi model configuration.

Field defaults equal ``transformers.MimiConfig`` defaults, which equal the
``kyutai/mimi`` checkpoint configuration (the model the reference invokes at
yodas2-mimi/process_shard.py:188-195 and nine copy-paste sites).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    sampling_rate: int = 24_000
    audio_channels: int = 1
    hidden_size: int = 512
    num_filters: int = 64
    num_residual_layers: int = 1
    upsampling_ratios: Tuple[int, ...] = (8, 6, 5, 4)
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    use_causal_conv: bool = True
    pad_mode: str = "constant"
    compress: int = 2
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    vector_quantization_hidden_dimension: int = 256
    upsample_groups: int = 512
    # transformer bottleneck
    num_hidden_layers: int = 8
    intermediate_size: int = 2048
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    hidden_act: str = "gelu"
    max_position_embeddings: int = 8000
    norm_eps: float = 1e-5
    rope_theta: float = 10_000.0
    sliding_window: int = 250
    layer_scale_initial_scale: float = 0.01
    # NOTE on sliding_window: the parity target — one-shot MimiModel.encode,
    # the only way the reference calls it (yodas2-mimi/process_shard.py:
    # 215-218) — applies NO sliding window on transformers 4.57:
    #   * MimiTransformerModel masks via create_causal_mask
    #     (modeling_mimi.py:1101) whose mask function is the plain causal
    #     one; create_sliding_window_causal_mask is never called by Mimi;
    #   * eager/sdpa attention ignore self.sliding_window — only the
    #     flash-attention-2 path forwards it (modeling_mimi.py:810), and
    #     the reference uses the default implementation;
    #   * MimiModel.encode is one _encode_frame over the whole input, no
    #     internal chunking (modeling_mimi.py:1505-1584).
    # Pinned empirically at activation level in a mask-sensitive regime
    # (LayerScale 1.0) by tests/test_sliding_window.py — note a probe with
    # LayerScale 0.01 underflows cross-window deltas to exactly 0.0 in f32
    # and falsely suggests a window. HF's own chunked/carried-cache path IS
    # windowed (DynamicSlidingWindowLayer eviction) and diverges from its
    # own one-shot; our contract follows one-shot. use_sliding_window=True
    # opts into the original kyutai semantics / bounded-memory streaming.
    use_sliding_window: bool = False
    # RVQ backend: "xla" (lax ops) or "pallas" (fused distance+argmin+update
    # kernel, tokenize_audio_tpu/ops/pallas/rvq.py). Both produce identical
    # codes; pallas keeps the whole chain in VMEM with per-book prefetch.
    rvq_backend: str = "xla"
    # SEANet stage backend: "xla" (causal_conv1d chain) or "pallas" (fused
    # per-stage kernel, ops/pallas/seanet.py: resblock + ELU + strided
    # downsample in VMEM, one HBM read/write per stage). The fused kernel's
    # summation order differs from the XLA conv (f32 deltas ~1e-5 before
    # RVQ); code agreement is measured, not bit-guaranteed — see NOTES.md.
    # Applies only to the standard geometry (num_residual_layers=1).
    seanet_backend: str = "xla"
    # "float32" (default): bit-exact codes vs HF MimiModel.encode fp32.
    # "bfloat16": SEANet + transformer compute in bf16 on the MXU fast path
    # (LayerNorm/softmax/RoPE/RVQ stay f32); codes are NOT guaranteed
    # bit-identical — bench/tests report the measured match rate. Opt in for
    # throughput when a small code-flip rate near quantization boundaries
    # is acceptable.
    compute_dtype: str = "float32"
    # MXU emulation level for the f32 SEANet convs, transformer einsums, and
    # the 25->12.5 Hz downsample (only meaningful with compute_dtype
    # "float32"; bf16 mode always uses the native DEFAULT path):
    #   "highest" — 6-pass bf16 f32 emulation, bitwise == torch CPU f32.
    #               The ONLY parity mode.
    #   "high"    — 3-pass bf16x3. MEASURED on TPU v5e with k-means-
    #               realistic codebooks (scripts/precision_probe.py, NOTES
    #               r3): 88.6% code match / 63.8% frame match vs HIGHEST at
    #               1.35x the encode compute (1818 -> 2451x RT) — a middle
    #               throughput mode, NOT parity (bf16: 38.4% match, 2.3x).
    #   "default" — single-pass bf16 inputs (equivalent accuracy class to
    #               compute_dtype="bfloat16"; prefer that switch).
    # RVQ distance matmuls and the quantizer in_proj always stay HIGHEST:
    # they are argmin-adjacent and only ~6% of compute.
    matmul_precision: str = "highest"

    @property
    def frame_rate(self) -> float:
        # MimiConfig.frame_rate: ceil over encodec hop, 12.5 Hz for defaults
        hop_length = int(math.prod(self.upsampling_ratios))
        return self.sampling_rate / (hop_length * 2)

    @property
    def encoder_strides(self) -> Tuple[int, ...]:
        """SEANet encoder downsample strides in order (reversed ratios):
        (4, 5, 6, 8) for defaults. transformers modeling_mimi.py:456."""
        return tuple(reversed(self.upsampling_ratios))

    @property
    def samples_per_frame(self) -> int:
        return int(math.prod(self.upsampling_ratios)) * 2  # x2: 25->12.5 Hz

    @property
    def num_acoustic_quantizers(self) -> int:
        return self.num_quantizers - self.num_semantic_quantizers
