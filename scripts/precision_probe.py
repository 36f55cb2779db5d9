"""Qualify Precision.HIGH (3-pass bf16x3) as the parity-mode matmul level.

NOTES r2 concluded SEANet burns 73% of encode compute at ~2% MXU purely
from 6-pass HIGHEST f32 emulation, and that bf16 (single-pass) breaks the
exactness contract (32.5% code match on k-means-realistic codebooks). HIGH
sits between: 3 passes, ~1-2 ulp of f32 — if it preserves the code match,
the parity mode gets the SEANet/transformer matmuls ~2x cheaper for free.

This probe reuses the bf16_qualification oracle (residual k-means codebooks
trained on the model's own pre-RVQ activations — realistic cluster
geometry) and reports, on held-out varied audio:

  1. code match of HIGH vs HIGHEST (the parity question);
  2. code match of bf16 vs HIGHEST (context / lower bound);
  3. INTERLEAVED on-device encode timings HIGHEST vs HIGH vs bf16
     (median of alternating rounds — the only decision-grade timing on the
     tunneled fabric, CLAUDE.md measurement discipline).

Run on the TPU: python scripts/precision_probe.py
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--books", type=int, default=8)
    ap.add_argument("--train-sec", type=float, default=2400.0)
    ap.add_argument("--eval-sec", type=float, default=240.0)
    ap.add_argument("--kmeans-iters", type=int, default=12)
    ap.add_argument("--timing-rounds", type=int, default=7)
    args = ap.parse_args()

    import jax

    import bf16_qualification as bq
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.model import encode
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0], flush=True)
    cfg = MimiConfig()
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(1)

    print("building activations for codebook training ...", flush=True)
    train_audio = bq.varied_audio(rng, args.train_sec)
    emb = bq.pre_rvq_embeddings(params, cfg, train_audio)
    print("pre-RVQ embeddings:", emb.shape, flush=True)
    params = bq.train_codebooks(params, cfg, emb, args.books, iters=args.kmeans_iters)
    params = jax.device_put(params)

    eval_audio = bq.varied_audio(np.random.default_rng(2), args.eval_sec)
    spf = cfg.samples_per_frame
    row = 200 * spf  # 16 s rows
    n = len(eval_audio) // row * row
    rows = eval_audio[:n].reshape(-1, row)
    valid = np.full((rows.shape[0],), row, dtype=np.int32)
    rows_d, valid_d = jax.device_put(rows), jax.device_put(valid)

    cfgs = {
        "highest": cfg,  # default matmul_precision="highest"
        "high": dataclasses.replace(cfg, matmul_precision="high"),
        "bf16": dataclasses.replace(cfg, compute_dtype="bfloat16"),
    }
    codes = {}
    for name, c in cfgs.items():
        out, _ = encode(params, c, rows_d, valid_d, num_quantizers=args.books)
        codes[name] = np.asarray(out)

    ref = codes["highest"]
    usage = [len(np.unique(ref[:, b])) for b in range(args.books)]
    print(f"codebook usage (of {cfg.codebook_size}):", usage)
    report = {"eval_frames": int(ref.shape[0] * ref.shape[2]), "usage": usage}
    for name in ("high", "bf16"):
        eq = ref == codes[name]
        report[f"{name}_code_match"] = float(eq.mean())
        report[f"{name}_frame_match"] = float(eq.all(axis=1).mean())
        report[f"{name}_per_book"] = np.round(eq.mean(axis=(0, 2)), 5).tolist()
        print(
            f"{name}: codes {100*eq.mean():.4f}%  frames all-{args.books} "
            f"{100*eq.all(axis=1).mean():.4f}%  per-book "
            f"{np.round(100*eq.mean(axis=(0,2)), 2).tolist()}",
            flush=True,
        )

    # interleaved timing: alternate configs within every round
    timings = {k: [] for k in cfgs}
    for _ in range(2):  # warm all three programs
        for c in cfgs.values():
            encode(params, c, rows_d, valid_d, num_quantizers=args.books)[0].block_until_ready()
    for _ in range(args.timing_rounds):
        for name, c in cfgs.items():
            t0 = time.perf_counter()
            encode(params, c, rows_d, valid_d, num_quantizers=args.books)[0].block_until_ready()
            timings[name].append(time.perf_counter() - t0)
    audio_sec = rows.size / cfg.sampling_rate
    for name, ts in timings.items():
        med = float(np.median(ts))
        report[f"{name}_median_s"] = round(med, 4)
        report[f"{name}_x_realtime"] = round(audio_sec / med, 1)
        print(
            f"{name}: median {med*1e3:.1f} ms for {audio_sec:.0f} s audio "
            f"= {audio_sec/med:.0f}x RT  (all: {[round(t*1e3,1) for t in ts]})",
            flush=True,
        )
    print("RESULT " + json.dumps(report))


if __name__ == "__main__":
    main()
