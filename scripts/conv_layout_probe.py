"""Probe TPU compute time of encode stages and a channels-last SEANet.

r1 NOTES observed XLA picking a pathological output layout when the
(B, C, T) SEANet activation is materialized. This script measures, on
device (block_until_ready loops — compute timing is stable even through
the tunnel, unlike end-to-end transport):

  1. full encode (production path, NCH conv layout)
  2. SEANet alone, NCH
  3. SEANet alone, channels-last NHC (lane dim = channels)
  4. transformer alone
  5. RVQ alone

Usage: python scripts/conv_layout_probe.py [--batch 16] [--seconds 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench_fn(fn, *args, iters=6):
    out = fn(*args)
    import jax

    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    return (time.perf_counter() - t0) / iters


def seanet_nhc(params, cfg, x):
    """Channels-last SEANet: activations (B, T, C), kernels transposed to
    HIO at trace time. Same math as model.seanet_encode."""
    import jax
    import jax.numpy as jnp

    from tokenize_audio_tpu.mimi.model import _elu

    prec = jax.lax.Precision.HIGHEST

    def conv(x, w, b, stride=1, dilation=1, pad_mode="constant"):
        k_eff = (w.shape[-1] - 1) * dilation + 1
        pad_total = k_eff - stride
        if pad_mode == "constant":
            x = jnp.pad(x, ((0, 0), (pad_total, 0), (0, 0)))
        else:
            left = jnp.repeat(x[:, :1, :], pad_total, axis=1)
            x = jnp.concatenate([left, x], axis=1)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.transpose(w, (2, 1, 0)),  # OIH -> HIO
            window_strides=(stride,),
            padding="VALID",
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            precision=prec,
        )
        if b is not None:
            y = y + b[None, None, :]
        return y

    x = conv(x, params["enc_in"]["w"], params["enc_in"]["b"])
    import itertools

    from tokenize_audio_tpu.mimi.config import MimiConfig  # noqa: F401

    for block, stride in zip(params["blocks"], cfg.encoder_strides):
        for j, res in enumerate(block["res"]):
            residual = x
            h = _elu(x)
            h = conv(h, res["c1"]["w"], res["c1"]["b"], dilation=cfg.dilation_growth_rate**j)
            h = _elu(h)
            h = conv(h, res["c2"]["w"], res["c2"]["b"])
            x = residual + h
        x = _elu(x)
        x = conv(x, block["down"]["w"], block["down"]["b"], stride=stride)
    x = _elu(x)
    x = conv(x, params["enc_out"]["w"], params["enc_out"]["b"])
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=20.0)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.model import (
        causal_conv1d,
        encode,
        seanet_encode,
        split_rvq_encode,
        transformer_apply,
    )
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0])
    cfg = MimiConfig()
    params = jax.device_put(random_params(cfg, seed=0))

    spf = cfg.samples_per_frame
    n = int(args.seconds * 24_000) // spf * spf
    b = args.batch
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, n)).astype(np.float32) * 0.3
    )
    audio_s = b * n / 24_000.0

    t_full = bench_fn(
        functools.partial(encode, params, cfg, num_quantizers=8), audio, None
    )
    print(f"full encode: {t_full*1e3:8.1f} ms  ({audio_s / t_full:7.0f}x RT)")

    sea = jax.jit(lambda a: seanet_encode(params, cfg, a[:, None, :], None)[0])
    t_sea = bench_fn(sea, audio)
    print(f"seanet NCH : {t_sea*1e3:8.1f} ms  ({audio_s / t_sea:7.0f}x RT)")

    sea_nhc = jax.jit(lambda a: seanet_nhc(params, cfg, a[:, :, None]))
    t_nhc = bench_fn(sea_nhc, audio)
    print(f"seanet NHC : {t_nhc*1e3:8.1f} ms  ({audio_s / t_nhc:7.0f}x RT)")

    h25 = np.asarray(sea(audio)).transpose(0, 2, 1)  # (B, T25, C)
    h25j = jnp.asarray(h25)
    tfm = jax.jit(lambda h: transformer_apply(params["tfm"], cfg, h))
    t_tfm = bench_fn(tfm, h25j)
    print(f"transformer: {t_tfm*1e3:8.1f} ms  ({audio_s / t_tfm:7.0f}x RT)")

    ds = jax.jit(
        lambda h: causal_conv1d(
            h.transpose(0, 2, 1), None, params["downsample"]["w"], None,
            stride=2, pad_mode="replicate",
        )[0]
    )
    x12 = ds(h25j)
    rvq = jax.jit(
        lambda x: split_rvq_encode(params["rvq"], x, 8, backend=cfg.rvq_backend)
    )
    t_rvq = bench_fn(rvq, x12)
    print(f"rvq (8 bks): {t_rvq*1e3:8.1f} ms  ({audio_s / t_rvq:7.0f}x RT)")

    # parity check NHC vs NCH
    a_small = audio[:2, : 4 * spf]
    ref = np.asarray(sea(a_small))
    got = np.asarray(sea_nhc(a_small)).transpose(0, 2, 1)
    print("NHC == NCH (f32 bitwise):", bool((ref == got).all()),
          " maxdiff:", float(np.abs(ref - got).max()))


if __name__ == "__main__":
    main()
