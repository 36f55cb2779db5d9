"""Time the COMPLETE tail-ladder warmup on the real fabric (VERDICT r4 #8).

OPERATIONS §1 prescribes ``--warmup --warmup-tails`` at provisioning but no
hardware timing of the full program set existed, so an operator could not
budget the step. This runs ``engine.warmup(include_tails=True)`` for the
24/16/48 kHz lattices (exactly the program set the dataset CLIs warm) on
the production bench config and reports programs + wall per lattice, for
both the cold path (first machine: remote compiles) and the banked path
(re-run: persistent-cache loads). Run twice to capture both.

    python scripts/warmup_tails_receipt.py [--growth 1.25]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--growth", type=float, default=None)
    ap.add_argument("--no-tails", action="store_true", help="full-batch set only")
    args = ap.parse_args()

    import jax

    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    kw = {}
    if args.growth is not None:
        kw["bucket_growth"] = args.growth
    ecfg = EngineConfig(
        min_bucket_seconds=2.0, samples_per_batch=192 * 24_000, max_batch_size=128, **kw
    )
    cfg = MimiConfig()
    t0 = time.perf_counter()
    engine = MimiEncoderEngine(random_params(cfg, seed=0), cfg, ecfg)
    print(
        json.dumps(
            {
                "device": str(jax.devices()[0]),
                "init_seconds": round(time.perf_counter() - t0, 1),
                "growth": ecfg.bucket_growth,
            }
        ),
        flush=True,
    )
    rows = []
    for sr in (24_000, 16_000, 48_000):
        t0 = time.perf_counter()
        n = engine.warmup(sr=sr, include_tails=not args.no_tails)
        rows.append(
            {"sr": sr, "programs": n, "wall_seconds": round(time.perf_counter() - t0, 1)}
        )
        print(json.dumps(rows[-1]), flush=True)
    print(
        "RESULT "
        + json.dumps(
            {
                "include_tails": not args.no_tails,
                "total_programs": sum(r["programs"] for r in rows),
                "total_wall_seconds": round(sum(r["wall_seconds"] for r in rows), 1),
                "per_lattice": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
