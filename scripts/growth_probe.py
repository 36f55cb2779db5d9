"""Interleaved A/B of bucket-lattice growth factors (VERDICT r2 #6).

The r2 host simulation said growth 1.15 reaches padding efficiency 0.931
vs 1.45's 0.828. Measured r3: the premise was wrong — measured
bucket_efficiency stayed flat (0.762/0.770/0.774) because finer lattices
shrink tail groups into the power-of-two row-padding gaps; the fix was
the tail-size ladder in EngineConfig.batch_size_for_group, not the
growth factor (NOTES r3, item 2b).

One process, growths interleaved per round, medians decide (CLAUDE.md).

Usage: python scripts/growth_probe.py [--rounds 5]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--utts", type=int, default=192)
    ap.add_argument("--growths", default="1.45,1.25,1.15")
    args = ap.parse_args()

    import jax

    import probe_common
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine
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
    audios, total_s = probe_common.bench_audios(args.utts)
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

    results, stages = probe_common.interleaved_rounds(
        engines, audios, total_s, args.rounds
    )
    report = {
        str(g): {
            "median_x_realtime": round(float(np.median(xs)), 1),
            "all": [round(x, 1) for x in xs],
            "bucket_efficiency": round(engines[g].stats.bucket_efficiency, 4),
            # compute-side signal (stable vs the tunnel's e2e swing,
            # VERDICT r4 #2): padded frames actually encoded plus the
            # per-stage walls — less bucket pad = fewer device FLOPs
            # regardless of transport noise
            "padded_frames": int(engines[g].stats.padded_frames),
            "stage_seconds": stages[g],
        }
        for g, xs in results.items()
    }
    print("RESULT " + json.dumps(report))


if __name__ == "__main__":
    main()
