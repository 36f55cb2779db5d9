"""Interleaved A/B of bucket-lattice growth factors (VERDICT r2 #6).

The r2 host simulation says growth 1.15 reaches padding efficiency 0.931
vs 1.45's 0.828 — ~10% free throughput IF the engine can resolve it (the
tunnel is transport-bound; the persistent compile cache makes the extra
shapes one-time per machine). With the packed wire format landed, this
probe measures whether the finer lattice is now worth it end to end.

One process, growths interleaved per round, medians decide (CLAUDE.md).

Usage: python scripts/growth_probe.py [--rounds 5]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--utts", type=int, default=192)
    ap.add_argument("--growths", default="1.45,1.25,1.15")
    args = ap.parse_args()

    import jax

    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.engine.metrics import EngineStats
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0], flush=True)
    cfg = MimiConfig()
    params = random_params(cfg, seed=0)
    growths = [float(g) for g in args.growths.split(",")]

    engines = {
        g: MimiEncoderEngine(
            params,
            cfg,
            EngineConfig(
                min_bucket_seconds=2.0,
                bucket_growth=g,
                samples_per_batch=192 * 24_000,
                max_batch_size=128,
            ),
        )
        for g in growths
    }

    rng = np.random.default_rng(0)
    lengths_s = np.clip(rng.lognormal(mean=1.9, sigma=0.8, size=args.utts), 0.8, 59.0)
    audios = [
        (rng.standard_normal(int(s * 24_000)) * 0.3 * 32767).astype(np.int16)
        for s in lengths_s
    ]
    total_s = sum(len(a) for a in audios) / 24_000.0
    print(f"workload: {args.utts} utts / {total_s:.0f} s audio", flush=True)

    ref = None
    for g, eng in engines.items():
        t0 = time.perf_counter()
        got = eng.encode_batch(audios)  # warm/compile
        print(f"warm growth={g}: {time.perf_counter()-t0:.1f}s "
              f"(buckets={len(eng.buckets)})", flush=True)
        if ref is None:
            ref = got
        else:
            assert all((a == b).all() for a, b in zip(ref, got)), g
    print("all growths bit-equal; timing ...", flush=True)

    results = {g: [] for g in engines}
    eff = {}
    for r in range(args.rounds):
        for g, eng in engines.items():
            eng.stats = EngineStats()
            t0 = time.perf_counter()
            eng.encode_batch(audios)
            results[g].append(total_s / (time.perf_counter() - t0))
            eff[g] = round(eng.stats.bucket_efficiency, 4)
        print(
            f"round {r}: " + "  ".join(f"g{g}={results[g][-1]:.0f}x" for g in results),
            flush=True,
        )
    report = {
        str(g): {
            "median_x_realtime": round(float(np.median(xs)), 1),
            "all": [round(x, 1) for x in xs],
            "bucket_efficiency": eff[g],
        }
        for g, xs in results.items()
    }
    print("RESULT " + json.dumps(report))


if __name__ == "__main__":
    main()
