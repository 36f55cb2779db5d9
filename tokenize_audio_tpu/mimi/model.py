"""Functional JAX Mimi encoder (and RVQ) — the TPU compute core.

Re-implements the encode path of ``transformers`` Mimi (the model the
reference drives at yodas2-mimi/process_shard.py:185-274) as pure functions
over a param pytree:

    raw 24 kHz audio (B, T)
      -> SEANet causal conv stack   (strides 4,5,6,8 -> 25 Hz, ELU, resnets)
      -> 8-layer RoPE transformer   (d=512, 8 heads, LayerScale, full causal)
      -> stride-2 causal conv       (25 -> 12.5 Hz, replicate padding)
      -> split residual VQ          (1 semantic + N acoustic, codebook 2048)
      -> codes (B, K, T/1920)

Exactness contract: with float32 params and ``precision=HIGHEST`` the
emitted code indices match HF ``MimiModel.encode`` (fp32) at every codebook
level; tests/test_mimi_parity.py pins this per layer and end to end.

Padding semantics (``valid`` lengths): HF encodes a padded batch with *no*
masking between layers, so an utterance's codes depend on its batch's pad
length (modeling_mimi.py:1442-1471 TODO notes this). Here, masked mode
(default) tracks per-row valid lengths and re-creates each layer's exact
standalone right-padding (zeros for constant-pad convs, replicated edge for
the 25->12.5 Hz downsample), making codes for any utterance bit-identical
to its standalone unpadded encode regardless of bucket or batch — a
determinism upgrade over the reference. ``masked=False`` reproduces HF
pad-to-length batch semantics instead.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tokenize_audio_tpu.mimi.config import MimiConfig

Params = Dict[str, Any]
_HIGHEST = jax.lax.Precision.HIGHEST
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def matmul_precision(cfg: MimiConfig) -> jax.lax.Precision:
    """The f32 MXU emulation level for SEANet/transformer/downsample matmuls
    (MimiConfig.matmul_precision). RVQ stays HIGHEST regardless — it is
    argmin-adjacent and ~6% of compute."""
    try:
        return _PRECISIONS[cfg.matmul_precision]
    except KeyError:
        # a bare KeyError would surface mid-jit-trace with a JAX stack;
        # name the field and the options instead
        raise ValueError(
            f"MimiConfig.matmul_precision {cfg.matmul_precision!r} not in "
            f"{sorted(_PRECISIONS)}"
        ) from None


# ---------------------------------------------------------------------------
# Causal conv primitive
# ---------------------------------------------------------------------------

def causal_conv1d(
    x: jax.Array,
    valid: Optional[jax.Array],
    w: jax.Array,
    b: Optional[jax.Array],
    stride: int = 1,
    dilation: int = 1,
    pad_mode: str = "constant",
    precision: Optional[jax.lax.Precision] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Causal Conv1d matching transformers MimiConv1d (modeling_mimi.py:204-341).

    x: (B, C, T); w: (O, I, K) in HF layout; returns ((B, O, T//stride), new valid).

    Left pad = (K_eff - stride); standalone right "extra" pad is re-created
    per row from ``valid`` (see module docstring). T must be divisible by
    stride (bucket lengths are multiples of samples_per_frame, so every
    intermediate length divides evenly).
    """
    k_eff = (w.shape[-1] - 1) * dilation + 1
    pad_total = k_eff - stride
    t = x.shape[-1]
    if t % stride != 0:
        raise ValueError(f"length {t} not divisible by stride {stride}")

    new_valid = None
    if valid is not None:
        new_valid = -(-valid // stride)  # ceil
        if stride > 1 and pad_mode == "replicate":
            # standalone extra right padding replicates the last valid sample
            extra = new_valid * stride - valid  # in [0, stride)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
            v = valid[:, None, None]
            last = jnp.take_along_axis(x, jnp.maximum(v - 1, 0), axis=2)  # (B,C,1)
            x = jnp.where((pos >= v) & (pos < v + extra[:, None, None]), last, x)
        # constant-pad layers need nothing: the masked invariant keeps
        # positions >= valid at exactly the zeros standalone padding uses.

    if pad_mode == "constant":
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_total, 0)))
    elif pad_mode == "replicate":
        left = jnp.repeat(x[:, :, :1], pad_total, axis=2)
        x = jnp.concatenate([left, x], axis=2)
    else:
        raise ValueError(f"unsupported pad_mode {pad_mode}")

    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        # f32 defaults to HIGHEST bit-parity (callers pass the configured
        # level); bf16 fast mode always uses the native MXU path
        precision=(precision or _HIGHEST)
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT,
    )
    if b is not None:
        y = y + b[None, :, None]
    if new_valid is not None:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, y.shape[-1]), 2)
        y = jnp.where(pos < new_valid[:, None, None], y, 0.0)
    return y, new_valid


def _elu(x: jax.Array) -> jax.Array:
    # nn.ELU(alpha=1.0); ELU(0) == 0 preserves the masked invariant.
    return jnp.where(x > 0, x, jnp.expm1(x))


# ---------------------------------------------------------------------------
# SEANet encoder
# ---------------------------------------------------------------------------

def seanet_encode(
    params: Params, cfg: MimiConfig, x: jax.Array, valid: Optional[jax.Array]
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """(B, 1, T) audio -> (B, hidden, T/prod(ratios)) at 25 Hz.
    Mirrors transformers MimiEncoder (modeling_mimi.py:444-486)."""
    prec = matmul_precision(cfg)
    x, valid = causal_conv1d(
        x, valid, params["enc_in"]["w"], params["enc_in"]["b"], pad_mode=cfg.pad_mode,
        precision=prec,
    )
    use_fused = (
        cfg.seanet_backend == "pallas"
        and cfg.num_residual_layers == 1
        and cfg.residual_kernel_size == 3
        and cfg.compress == 2
        and cfg.pad_mode == "constant"
        and x.dtype == jnp.float32
    )
    for block, stride in zip(params["blocks"], cfg.encoder_strides):
        if use_fused:
            from tokenize_audio_tpu.ops.pallas.seanet import seanet_stage_pallas

            res = block["res"][0]
            v_in = (
                valid
                if valid is not None
                else jnp.full((x.shape[0],), x.shape[-1], dtype=jnp.int32)
            )
            x, new_v = seanet_stage_pallas(
                x,
                v_in,
                res["c1"]["w"],
                res["c1"]["b"],
                res["c2"]["w"],
                res["c2"]["b"],
                block["down"]["w"],
                block["down"]["b"],
                stride,
                interpret=jax.default_backend() == "cpu",
            )
            if valid is not None:
                valid = new_v
            continue
        for j, res in enumerate(block["res"]):
            residual = x
            h = _elu(x)
            h, _ = causal_conv1d(
                h,
                valid,
                res["c1"]["w"],
                res["c1"]["b"],
                dilation=cfg.dilation_growth_rate**j,
                pad_mode=cfg.pad_mode,
                precision=prec,
            )
            h = _elu(h)
            h, _ = causal_conv1d(
                h, valid, res["c2"]["w"], res["c2"]["b"], pad_mode=cfg.pad_mode,
                precision=prec,
            )
            x = residual + h
        x = _elu(x)
        x, valid = causal_conv1d(
            x, valid, block["down"]["w"], block["down"]["b"], stride=stride,
            pad_mode=cfg.pad_mode, precision=prec,
        )
    x = _elu(x)
    x, valid = causal_conv1d(
        x, valid, params["enc_out"]["w"], params["enc_out"]["b"], pad_mode=cfg.pad_mode,
        precision=prec,
    )
    return x, valid


# ---------------------------------------------------------------------------
# Transformer bottleneck
# ---------------------------------------------------------------------------

def _rope_at(cfg: MimiConfig, pos: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin at arbitrary (possibly traced) absolute positions, matching
    MimiRotaryEmbedding (modeling_mimi.py:505-538): inv_freq over even
    dims, emb = [freqs, freqs]. One implementation serves both the batch
    tables and the streaming encoder (whose windowed streams outlive any
    precomputed table)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    freqs = pos.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, hd)
    return jnp.cos(emb), jnp.sin(emb)


def _rope_tables(cfg: MimiConfig, t: int) -> Tuple[jax.Array, jax.Array]:
    return _rope_at(cfg, jnp.arange(t))


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    out = (x - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32) + b.astype(jnp.float32)
    return out.astype(dt)


def _attention_mask(cfg: MimiConfig, t: int) -> jax.Array:
    """Additive float mask. Full causal by default (what HF actually builds —
    see MimiConfig.use_sliding_window note); optional sliding window."""
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    allowed = j <= i
    if cfg.use_sliding_window:
        allowed &= j > i - cfg.sliding_window
    neg = jnp.finfo(jnp.float32).min  # HF uses finfo.min, not -inf
    return jnp.where(allowed, 0.0, neg).astype(jnp.float32)


def transformer_apply(params: Params, cfg: MimiConfig, h: jax.Array) -> jax.Array:
    """(B, T, C) -> (B, T, C). Mirrors MimiTransformerModel with eager
    attention (modeling_mimi.py:608-703, 922-994): pre-LN, RoPE, fp32
    softmax, LayerScale residuals, bias-free projections, erf GELU MLP."""
    b, t, c = h.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / np.sqrt(cfg.head_dim)
    dt = h.dtype
    prec = matmul_precision(cfg) if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    # cos/sin stay f32: the config contract (mimi/config.py) promises RoPE
    # in f32 even in bf16 fast mode — the rotation products below compute
    # in f32 (jnp promotes bf16*f32 -> f32) and the einsum re-narrows
    cos, sin = _rope_tables(cfg, t)  # f32, like MimiRotaryEmbedding
    cos_b = cos[None, None, :, :]
    sin_b = sin[None, None, :, :]
    mask = _attention_mask(cfg, t)[None, None, :, :].astype(dt)

    for lp in params:
        x = _layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
        q = jnp.einsum("btc,dc->btd", x, lp["q"], precision=prec)
        k = jnp.einsum("btc,dc->btd", x, lp["k"], precision=prec)
        v = jnp.einsum("btc,dc->btd", x, lp["v"], precision=prec)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        q = (q * cos_b + _rotate_half(q) * sin_b).astype(dt)
        k = (k * cos_b + _rotate_half(k) * sin_b).astype(dt)
        aw = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=prec) * scale
        aw = aw + mask
        # fp32 softmax then back to the compute dtype (MimiAttention:684-685)
        aw = jax.nn.softmax(aw.astype(jnp.float32), axis=-1).astype(dt)
        att = jnp.einsum("bhqk,bhkd->bhqd", aw, v, precision=prec)
        att = att.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        att = jnp.einsum("btd,cd->btc", att, lp["o"], precision=prec)
        h = h + lp["ls1"] * att

        x = _layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
        x = jnp.einsum("btc,fc->btf", x, lp["fc1"], precision=prec)
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.einsum("btf,cf->btc", x, lp["fc2"], precision=prec)
        h = h + lp["ls2"] * x
    return h


# ---------------------------------------------------------------------------
# Residual vector quantization
# ---------------------------------------------------------------------------

def rvq_quantize(residual: jax.Array, embeds: jax.Array) -> jax.Array:
    """Chained nearest-centroid search.

    residual: (B, T, D); embeds: (n_books, V, D) — already normalized
    embed_sum/cluster_usage (MimiEuclideanCodebook.embed property,
    modeling_mimi.py:1198-1209). Returns codes (B, n_books, T).

    Distance = ||x||^2 - 2 x.e + ||e||^2, the same mm-based expansion
    torch.cdist uses for these sizes, so argmin tie behavior (first index
    wins) lines up with the reference.
    """
    codes = []
    for i in range(embeds.shape[0]):
        e = embeds[i]  # (V, D)
        x2 = jnp.sum(jnp.square(residual), axis=-1, keepdims=True)  # (B,T,1)
        e2 = jnp.sum(jnp.square(e), axis=-1)  # (V,)
        xe = jnp.einsum("btd,vd->btv", residual, e, precision=_HIGHEST)
        d2 = x2 - 2.0 * xe + e2[None, None, :]
        idx = jnp.argmin(d2, axis=-1)  # (B, T)
        codes.append(idx)
        residual = residual - e[idx]
    return jnp.stack(codes, axis=1)


def split_rvq_encode(
    params: Params, emb: jax.Array, num_quantizers: int, backend: str = "xla"
) -> jax.Array:
    """(B, hidden, T) -> codes (B, K, T).
    Mirrors MimiSplitResidualVectorQuantizer.encode (modeling_mimi.py:1318-1345):
    semantic RVQ on the projected embeddings, acoustic RVQ *also on the
    original embeddings* (not the semantic residual)."""
    avail = params["semantic"]["embed"].shape[0] + params["acoustic"]["embed"].shape[0]
    if num_quantizers > avail:
        # HF raises too (MimiModel.encode, modeling_mimi.py:1545-1548);
        # silent truncation would emit fewer codebooks than callers sized
        # their unicode vocab for
        raise ValueError(
            f"num_quantizers {num_quantizers} exceeds the checkpoint's "
            f"{avail} codebooks"
        )
    if backend == "pallas":
        from tokenize_audio_tpu.ops.pallas.rvq import rvq_encode_pallas

        interpret = jax.default_backend() == "cpu"
        quantize = functools.partial(rvq_encode_pallas, interpret=interpret)
    else:
        quantize = rvq_quantize
    x = emb.transpose(0, 2, 1)  # (B, T, hidden)
    sem = params["semantic"]
    n_sem = sem["embed"].shape[0]
    sem_in = jnp.einsum("btc,dc->btd", x, sem["in_proj"], precision=_HIGHEST)
    codes = quantize(sem_in, sem["embed"][: min(n_sem, num_quantizers)])
    n_ac = num_quantizers - codes.shape[1]
    if n_ac > 0:
        ac = params["acoustic"]
        ac_in = jnp.einsum("btc,dc->btd", x, ac["in_proj"], precision=_HIGHEST)
        ac_codes = quantize(ac_in, ac["embed"][:n_ac])
        codes = jnp.concatenate([codes, ac_codes], axis=1)
    return codes


# ---------------------------------------------------------------------------
# Full encode
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "num_quantizers", "masked", "code_dtype", "resample", "transfer"
    ),
)
def encode(
    params: Params,
    cfg: MimiConfig,
    audio: jax.Array,
    valid: Optional[jax.Array] = None,
    num_quantizers: int = 8,
    masked: bool = True,
    code_dtype: str = "int32",
    resample: Optional[Tuple[int, int]] = None,
    transfer: str = "padded",
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Encode (B, T) float32 audio -> (codes, frame valid).

    Equivalent of HF ``model.encode(input_values, padding_mask).audio_codes``
    restricted to the first ``num_quantizers`` codebooks (the reference keeps
    8: mls-en-mimi-pretrain/process_shard.py:33). ``valid`` are per-row
    sample counts; pass None (or masked=False) for HF pad-to-length
    semantics. ``code_dtype="uint16"`` is lossless (codebook 2048 < 2^16)
    and halves wire bytes, but the engine defaults to int32 — measured
    faster end-to-end on the dev fabric (EngineConfig.code_transfer_dtype).

    ``transfer`` shapes the device->host wire format (the fetch is the
    engine's measured bound at 87% of wall on tunneled fabrics, BENCH_r02):
      - "padded":  codes (B, K, T/1920) in ``code_dtype`` (the HF layout).
      - "packed":  (B, T/1920, K//2) int32 — adjacent code PAIRS packed
        16-bit-aligned into one word (codebook 2048 << 2^16, lossless).
        Half the bytes of int32, and the host unpack is a free
        little-endian ``view('<u2')`` — no sub-word dtype ever rides the
        transfer path (raw uint16 device_get LOST end-to-end on this
        fabric, NOTES r2 #4).
      - "compact": (B*T/1920, K//2) int32 — packed AND valid frames
        gathered to the front in row order, so bucket pad and row pad
        never cross the wire; the caller fetches a host-computed prefix
        (per-row frame counts are host-derivable from lengths). Requires
        masked=True with valid. K must be even for the packed modes.
    """
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if dt != jnp.float32:
        # cast the conv/transformer weights at trace time; RVQ stays f32
        def _cast(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(dt)
                if hasattr(a, "dtype") and a.dtype == jnp.float32
                else a,
                tree,
            )

        params = {
            **params,
            "enc_in": _cast(params["enc_in"]),
            "blocks": _cast(params["blocks"]),
            "enc_out": _cast(params["enc_out"]),
            "tfm": _cast(params["tfm"]),
            "downsample": _cast(params["downsample"]),
        }
    if audio.dtype == jnp.int16:
        # device-side PCM normalization: int16 -> f32 and /32768 are both
        # exact, so shipping raw 16-bit PCM halves host->device bytes with
        # bit-identical codes (the host path is pcm_to_float, core/audio.py)
        audio = audio.astype(jnp.float32) / 32768.0
    elif jnp.issubdtype(audio.dtype, jnp.integer):
        raise TypeError(
            f"integer audio must be int16 PCM (got {audio.dtype}); "
            "normalize other PCM widths on host via pcm_to_float"
        )
    if resample is not None:
        # fused on-device resample: audio arrives at the SOURCE rate (so
        # 16 kHz int16 uploads 6x fewer bytes than 24 kHz f32) and the
        # polyphase conv runs inside this program — no intermediate
        # device->host->device round trip. Exactness: zero-padding beyond
        # ``valid`` produces filter ringing in the tail, but every causal
        # conv's VALID outputs read only positions < valid (+ the
        # replicate-pad extra, which reads the last valid sample), so the
        # masked invariant keeps codes bit-identical to resample-then-
        # encode OF THE SAME ROW (per piece: the engine splits >cap audio
        # at the source rate before resampling, so frames at split
        # boundaries may differ from a resample-whole-then-split order —
        # see the DEVIATION CONTRACT in core/audio.py). Requires masked
        # per-row semantics for that argument.
        if not masked or valid is None:
            raise ValueError("fused resample requires masked=True with valid lengths")
        from tokenize_audio_tpu.core.audio import _resample_batch

        up, down = resample
        audio = _resample_batch(audio.astype(jnp.float32), up, down)
        valid = -(-(valid * up) // down)  # ceil(valid * up / down)
    x = audio[:, None, :].astype(dt)
    valid_in = valid
    if not masked:
        valid = None
    x, valid = seanet_encode(params, cfg, x, valid)
    h = transformer_apply(params["tfm"], cfg, x.transpose(0, 2, 1))
    x = h.transpose(0, 2, 1)
    if valid is not None:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[-1]), 2)
        x = jnp.where(pos < valid[:, None, None], x, jnp.zeros((), dt))
    x, valid = causal_conv1d(
        x, valid, params["downsample"]["w"], None, stride=2, pad_mode="replicate",
        precision=matmul_precision(cfg),
    )
    codes = split_rvq_encode(
        params["rvq"], x.astype(jnp.float32), num_quantizers, backend=cfg.rvq_backend
    )
    if valid is None and valid_in is not None:
        # unmasked (HF batch semantics) still reports per-row frame counts
        valid = -(-valid_in // cfg.samples_per_frame)
    if transfer == "padded":
        return codes.astype(jnp.dtype(code_dtype)), valid
    if num_quantizers % 2 != 0:
        raise ValueError(f"packed transfer needs even num_quantizers, got {num_quantizers}")
    # pack adjacent code pairs little-endian into int32 words: the host
    # recovers the exact (.., K) uint16 stream with a zero-copy view('<u2')
    ct = codes.transpose(0, 2, 1).astype(jnp.int32)  # (B, T, K)
    packed = ct[..., 0::2] | (ct[..., 1::2] << 16)  # (B, T, K//2)
    if transfer == "packed":
        return packed, valid
    if transfer != "compact":
        raise ValueError(f"unknown transfer mode {transfer!r}")
    if valid is None:
        raise ValueError("compact transfer requires valid lengths")
    b, t, kp = packed.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    fmask = (pos < valid[:, None]).reshape(-1)
    # stable compaction: row-major frame order is preserved, so the host
    # splits the prefix by cumulative per-row frame counts
    tgt = jnp.where(fmask, jnp.cumsum(fmask) - 1, b * t)  # invalid -> spill row
    out = jnp.zeros((b * t + 1, kp), dtype=jnp.int32)
    out = out.at[tgt].set(packed.reshape(b * t, kp))
    return out[: b * t], valid
