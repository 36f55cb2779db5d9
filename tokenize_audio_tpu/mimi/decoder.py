"""Functional JAX Mimi decoder: codes -> waveform.

Completes the codec round trip used by the reference's ``str_to_audio``
(librispeech-mimi/utils.py:72-81). Mirrors transformers' decode path
(modeling_mimi.py:1595-1661):

    codes (B, K, T) -> split-RVQ decode (embedding sums + output projs)
      -> depthwise ConvTranspose 12.5 -> 25 Hz (groups=hidden, causal trim)
      -> 8-layer decoder transformer (same architecture as the encoder's)
      -> SEANet decoder (ConvTranspose upsampling x [8,6,5,4], resnets)
      -> audio (B, T*1920)

Numerically f32/HIGHEST like the encoder; audio parity vs HF is
tolerance-based (float waveform output, not discrete codes).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tokenize_audio_tpu.mimi.config import MimiConfig
from tokenize_audio_tpu.mimi.model import (
    _HIGHEST,
    _elu,
    causal_conv1d,
    transformer_apply,
)

Params = Dict[str, Any]


def conv_transpose1d(
    x: jax.Array,
    wt: jax.Array,
    stride: int,
    groups: int = 1,
    bias: Optional[jax.Array] = None,
    trim_right_ratio: float = 1.0,
) -> jax.Array:
    """MimiConvTranspose1d (modeling_mimi.py:344-399): torch transpose conv
    then causal trim — padding_total = k - stride trimmed from the right
    (ceil(pt * trim_right_ratio)) and the rest from the left.

    ``wt`` is torch layout (in_ch, out_ch // groups, K).
    """
    in_ch, out_per_group, k = wt.shape
    # transpose conv == zero-stuff by stride + full correlation with the
    # time-flipped kernel; rhs layout (O, I/groups, K)
    wt_f = jnp.flip(wt, -1)
    if groups == 1:
        rhs = wt_f.transpose(1, 0, 2)  # (out, in, K)
    else:
        # grouped: out channel g*out_per_group+j consumes only group g's inputs
        in_per_group = in_ch // groups
        wt_g = wt_f.reshape(groups, in_per_group, out_per_group, k)
        rhs = wt_g.transpose(0, 2, 1, 3).reshape(groups * out_per_group, in_per_group, k)
    y = jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=_HIGHEST,
    )
    if bias is not None:
        y = y + bias[None, :, None]
    pad_total = k - stride
    pad_right = math.ceil(pad_total * trim_right_ratio)
    pad_left = pad_total - pad_right
    end = y.shape[-1] - pad_right
    return y[:, :, pad_left:end]


def split_rvq_decode(params: Params, codes: jax.Array) -> jax.Array:
    """codes (B, K, T) -> embeddings (B, hidden, T)
    (MimiSplitResidualVectorQuantizer.decode, modeling_mimi.py:1347-1356)."""
    sem, ac = params["semantic"], params["acoustic"]
    n_sem = sem["embed"].shape[0]
    k = codes.shape[1]

    def rvq(embeds, out_proj, c):  # c (B, n, T)
        n = c.shape[1]
        acc = None
        for i in range(n):
            q = embeds[i][c[:, i]]  # (B, T, D)
            acc = q if acc is None else acc + q
        return jnp.einsum("btd,cd->bct", acc, out_proj, precision=_HIGHEST)  # out_proj (hidden, D)

    out = rvq(sem["embed"], sem["out_proj"], codes[:, :n_sem])
    if k > n_sem:
        out = out + rvq(ac["embed"], ac["out_proj"], codes[:, n_sem:])
    return out


def seanet_decode(params: Params, cfg: MimiConfig, x: jax.Array) -> jax.Array:
    """(B, hidden, T25) -> (B, 1, T_samples). MimiDecoder
    (modeling_mimi.py:1150-1180)."""
    x, _ = causal_conv1d(x, None, params["conv_in"]["w"], params["conv_in"]["b"], pad_mode=cfg.pad_mode)
    for block, stride in zip(params["blocks"], cfg.upsampling_ratios):
        x = _elu(x)
        x = conv_transpose1d(x, block["up"]["w"], stride=stride, bias=block["up"]["b"])
        for j, res in enumerate(block["res"]):
            residual = x
            h = _elu(x)
            h, _ = causal_conv1d(
                h,
                None,
                res["c1"]["w"],
                res["c1"]["b"],
                dilation=cfg.dilation_growth_rate**j,
                pad_mode=cfg.pad_mode,
            )
            h = _elu(h)
            h, _ = causal_conv1d(h, None, res["c2"]["w"], res["c2"]["b"], pad_mode=cfg.pad_mode)
            x = residual + h
    x = _elu(x)
    x, _ = causal_conv1d(x, None, params["conv_out"]["w"], params["conv_out"]["b"], pad_mode=cfg.pad_mode)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode(params: Params, cfg: MimiConfig, codes: jax.Array) -> jax.Array:
    """codes (B, K, T) int32 -> audio (B, T * samples_per_frame) float32.

    Equivalent of HF ``model.decode(codes).audio_values`` (the consumer-side
    helper str_to_audio, librispeech-mimi/utils.py:72-81)."""
    emb = split_rvq_decode(params["rvq"], codes)
    emb = conv_transpose1d(
        emb, params["upsample"]["w"], stride=2, groups=cfg.upsample_groups
    )
    h = transformer_apply(params["dec_tfm"], cfg, emb.transpose(0, 2, 1))
    audio = seanet_decode(params["dec"], cfg, h.transpose(0, 2, 1))
    return audio[:, 0, :]
