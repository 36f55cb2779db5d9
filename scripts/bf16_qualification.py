"""Qualify bf16 fast-mode code accuracy on REALISTIC quantizer geometry.

Random-init codebooks understate cluster separation, so r1's "96.3% match
on random weights" was not decision-grade (VERDICT r1 weak #6). The real
kyutai/mimi checkpoint cannot be fetched (zero egress), so this script
builds the next-best oracle: codebooks trained by residual k-means on the
model's OWN pre-RVQ activations over varied audio — the same procedure that
produces real RVQ codebooks (train each level on the residual of the
previous), giving realistically separated, usage-balanced clusters.

It then encodes held-out audio in f32 (exact mode) and bf16 (fast mode) and
reports per-book and all-8 frame match rates. Run on the TPU for the
decision-grade number (bf16 matmuls there use the native MXU path).

Usage: python scripts/bf16_qualification.py [--books 8] [--train-sec 240]
"""

import argparse
import sys

sys.path.insert(0, ".")

import dataclasses

import numpy as np


def varied_audio(rng, seconds, sr=24_000, seg=4.0):
    """Concatenation of harmonic, noise, chirp, and AM segments."""
    chunks = []
    t_total = 0.0
    i = 0
    while t_total < seconds:
        t = np.arange(int(seg * sr)) / sr
        k = i % 4
        if k == 0:
            f = 80 + rng.random() * 400
            x = 0.4 * np.sin(2 * np.pi * f * t) + 0.15 * np.sin(2 * np.pi * 3.1 * f * t)
        elif k == 1:
            x = rng.standard_normal(len(t)) * 0.25
            x = np.convolve(x, np.ones(8) / 8, mode="same")
        elif k == 2:
            f0, f1 = 60, 8000
            x = 0.3 * np.sin(2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * seg)))
        else:
            x = 0.5 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        chunks.append(x.astype(np.float32))
        t_total += seg
        i += 1
    return np.concatenate(chunks)


def kmeans(x, k, iters, rng_key):
    """Plain Lloyd k-means in jax (f32, HIGHEST precision)."""
    import jax
    import jax.numpy as jnp

    n = x.shape[0]
    idx = jax.random.choice(rng_key, n, shape=(k,), replace=n < k)
    cent = x[idx]
    if n < k:  # tiny smoke runs only; break duplicate-centroid ties
        cent = cent + 1e-4 * jax.random.normal(rng_key, cent.shape, cent.dtype)

    @jax.jit
    def step(cent):
        d2 = (
            jnp.sum(x * x, 1, keepdims=True)
            - 2.0 * x @ cent.T
            + jnp.sum(cent * cent, 1)[None]
        )
        assign = jnp.argmin(d2, 1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        counts = one_hot.sum(0)
        sums = one_hot.T @ x
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), cent)
        return new, assign

    for _ in range(iters):
        cent, assign = step(cent)
    return np.asarray(cent)


def pre_rvq_embeddings(params, cfg, audio, batch_frames=1500):
    """Run SEANet + transformer + downsample (the f32 path) to the 12.5 Hz
    pre-RVQ embeddings, chunked to bound memory."""
    import jax.numpy as jnp

    from tokenize_audio_tpu.mimi.model import causal_conv1d, seanet_encode, transformer_apply

    spf = cfg.samples_per_frame
    chunk = batch_frames * spf
    outs = []
    for s in range(0, len(audio), chunk):
        a = audio[s : s + chunk]
        n = len(a) // spf * spf
        if n == 0:
            break
        x = jnp.asarray(a[:n])[None, None, :]
        x, _ = seanet_encode(params, cfg, x, None)
        h = transformer_apply(params["tfm"], cfg, x.transpose(0, 2, 1))
        x, _ = causal_conv1d(
            h.transpose(0, 2, 1), None, params["downsample"]["w"], None, stride=2,
            pad_mode="replicate",
        )
        outs.append(np.asarray(x[0].T))  # (T12, hidden)
    return np.concatenate(outs, axis=0)


def train_codebooks(params, cfg, emb, books, iters=12, seed=7):
    """Residual k-means per level, separately for the semantic head (level
    0, on its in_proj space) and acoustic heads (levels 1.., on theirs)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    rvq = {k: dict(v) for k, v in params["rvq"].items()}
    x = jnp.asarray(emb)

    sem_in = np.asarray(x @ jnp.asarray(rvq["semantic"]["in_proj"]).T)
    k = cfg.codebook_size
    key, sub = jax.random.split(key)
    sem_embed = np.asarray(rvq["semantic"]["embed"]).copy()
    c = kmeans(jnp.asarray(sem_in), k, iters, sub)
    sem_embed[0] = c
    rvq["semantic"]["embed"] = sem_embed[:1]

    ac_in = np.asarray(x @ jnp.asarray(rvq["acoustic"]["in_proj"]).T)
    n_ac = books - 1
    ac_embed = np.asarray(rvq["acoustic"]["embed"]).copy()
    residual = jnp.asarray(ac_in)
    for level in range(n_ac):
        key, sub = jax.random.split(key)
        c = kmeans(residual, k, iters, sub)
        ac_embed[level] = c
        cj = jnp.asarray(c)
        d2 = (
            jnp.sum(residual * residual, 1, keepdims=True)
            - 2.0 * residual @ cj.T
            + jnp.sum(cj * cj, 1)[None]
        )
        assign = jnp.argmin(d2, 1)
        residual = residual - cj[assign]
    rvq["acoustic"]["embed"] = ac_embed[:n_ac]
    return {**params, "rvq": rvq}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--books", type=int, default=8)
    ap.add_argument("--train-sec", type=float, default=2400.0)
    ap.add_argument("--eval-sec", type=float, default=120.0)
    ap.add_argument("--kmeans-iters", type=int, default=12)
    args = ap.parse_args()

    import jax

    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.model import encode
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0])
    cfg = MimiConfig()
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(1)

    print("building activations for codebook training ...")
    train_audio = varied_audio(rng, args.train_sec)
    emb = pre_rvq_embeddings(params, cfg, train_audio)
    print("pre-RVQ embeddings:", emb.shape)
    params = train_codebooks(params, cfg, emb, args.books, iters=args.kmeans_iters)
    params = jax.device_put(params)

    # held-out eval
    eval_audio = varied_audio(np.random.default_rng(2), args.eval_sec)
    spf = cfg.samples_per_frame
    n = len(eval_audio) // spf * spf
    eval_audio = eval_audio[:n]
    # chunk into a batch of 16 s rows (200 whole Mimi frames each)
    row = 200 * spf
    rows = eval_audio[: n // row * row].reshape(-1, row)

    f32_cfg = dataclasses.replace(cfg, compute_dtype="float32")
    bf16_cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    valid = np.full((rows.shape[0],), row, dtype=np.int32)
    c32, _ = encode(params, f32_cfg, rows, valid, num_quantizers=args.books)
    c16, _ = encode(params, bf16_cfg, rows, valid, num_quantizers=args.books)
    c32, c16 = np.asarray(c32), np.asarray(c16)

    per_book = (c32 == c16).mean(axis=(0, 2))
    all8 = (c32 == c16).all(axis=1).mean()
    # codebook usage sanity: realistic codebooks should use most entries
    usage = [len(np.unique(c32[:, b])) for b in range(args.books)]
    print(f"codebook usage (of {cfg.codebook_size}):", usage)
    print("per-book bf16 match %:", np.round(100 * per_book, 2).tolist())
    print(f"all-{args.books} frame match: {100 * (c32 == c16).mean():.2f}% codes, "
          f"{100 * all8:.2f}% frames fully identical")


if __name__ == "__main__":
    main()
