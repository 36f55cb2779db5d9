"""Measure the fused Pallas SEANet backend vs XLA on TPU: speed + codes.

(a) on-device stage/full-encode timing for both backends (stable even
    through the tunnel — compute, not transport);
(b) full-size-model code agreement between backends over a batch of
    varied utterances (the deltas are ~1e-5 summation-order noise; this
    measures how often that flips an RVQ argmin).

Usage: python scripts/seanet_backend_probe.py [--batch 16] [--seconds 20]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(fn, *args, iters=6):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=20.0)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.model import encode, seanet_encode
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0])
    cfg_x = MimiConfig()
    cfg_p = dataclasses.replace(cfg_x, seanet_backend="pallas")
    params = jax.device_put(random_params(cfg_x, seed=0))

    spf = cfg_x.samples_per_frame
    n = int(args.seconds * 24_000) // spf * spf
    b = args.batch
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((b, n)) * 0.3).astype(np.float32))
    audio_s = b * n / 24_000.0
    valid = jnp.full((b,), n, dtype=jnp.int32)

    sea_x = jax.jit(
        lambda a, v: seanet_encode(params, cfg_x, a[:, None, :], v)[0]
    )
    sea_p = jax.jit(
        lambda a, v: seanet_encode(params, cfg_p, a[:, None, :], v)[0]
    )
    t_x = bench(sea_x, audio, valid)
    t_p = bench(sea_p, audio, valid)
    print(f"seanet xla   : {t_x*1e3:8.1f} ms ({audio_s/t_x:7.0f}x RT)")
    print(f"seanet pallas: {t_p*1e3:8.1f} ms ({audio_s/t_p:7.0f}x RT)  speedup {t_x/t_p:.2f}x")

    enc_x = functools.partial(encode, params, cfg_x, num_quantizers=8)
    enc_p = functools.partial(encode, params, cfg_p, num_quantizers=8)
    t_ex = bench(enc_x, audio, valid)
    t_ep = bench(enc_p, audio, valid)
    print(f"encode xla   : {t_ex*1e3:8.1f} ms ({audio_s/t_ex:7.0f}x RT)")
    print(f"encode pallas: {t_ep*1e3:8.1f} ms ({audio_s/t_ep:7.0f}x RT)  speedup {t_ex/t_ep:.2f}x")

    # code agreement over varied utterances (batched rows of mixed content)
    total = match = 0
    frames_same = frames = 0
    for seed in range(4):
        r = np.random.default_rng(seed + 10)
        t = np.arange(n) / 24_000
        rows = []
        for i in range(b):
            kind = i % 4
            if kind == 0:
                x = 0.4 * np.sin(2 * np.pi * (80 + 60 * i) * t)
            elif kind == 1:
                x = np.convolve(r.standard_normal(n) * 0.3, np.ones(6) / 6, "same")
            elif kind == 2:
                x = 0.3 * np.sin(2 * np.pi * (60 * t + 5000 * t**2 / (2 * t[-1])))
            else:
                x = 0.5 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
            rows.append(x.astype(np.float32))
        batch = jnp.asarray(np.stack(rows))
        cx, _ = enc_x(batch, valid)
        cp, _ = enc_p(batch, valid)
        cx, cp = np.asarray(cx), np.asarray(cp)
        total += cx.size
        match += (cx == cp).sum()
        frames += cx.shape[0] * cx.shape[2]
        frames_same += (cx == cp).all(axis=1).sum()
    print(
        f"code agreement pallas-vs-xla: {100*match/total:.3f}% codes, "
        f"{100*frames_same/frames:.3f}% frames fully identical "
        f"({frames} frames)"
    )


if __name__ == "__main__":
    main()
