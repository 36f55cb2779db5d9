"""Within-process A/B probe: drain_policy fifo/ready/threaded at depth 18.

Fetch was 84% of BENCH_r04's wall and the engine drained in-flight handles
strictly FIFO, blocking one tunnel RTT per handle (VERDICT r4 #3). The
"ready" policy collects whichever in-flight handle reports is_ready()
first, overlapping that RTT with still-computing batches. Decision
discipline per CLAUDE.md: both engines in ONE process, interleaved per
round (order re-randomized), medians decide; bit-equality asserted first.

    python scripts/drain_policy_probe.py [rounds]
"""

import os
import statistics
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import dataclasses

    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = MimiConfig()
    params = random_params(cfg, seed=0)

    sys.path.insert(0, "scripts")
    import probe_common

    audios, total_s = probe_common.bench_audios(256)

    base = EngineConfig(
        min_bucket_seconds=2.0,
        bucket_growth=1.25,
        samples_per_batch=192 * 24_000,
        max_batch_size=128,
    )
    engines = {
        "fifo": MimiEncoderEngine(params, cfg, base, pipeline_depth=18),
        "ready": MimiEncoderEngine(
            params,
            cfg,
            dataclasses.replace(base, drain_policy="ready"),
            pipeline_depth=18,
        ),
        "threaded": MimiEncoderEngine(
            params,
            cfg,
            dataclasses.replace(base, drain_policy="threaded"),
            pipeline_depth=18,
        ),
    }

    probe_common.warm_and_check_equal(engines, audios)

    import time

    from tokenize_audio_tpu.engine.metrics import EngineStats

    results = {k: [] for k in engines}
    order_rng = np.random.default_rng(1)
    names = list(engines)
    stages = {}
    for r in range(rounds):
        order_rng.shuffle(names)
        for name in names:
            eng = engines[name]
            eng.stats = EngineStats()
            t0 = time.perf_counter()
            eng.encode_batch(audios)
            results[name].append(total_s / (time.perf_counter() - t0))
            stages[name] = {
                k: round(v, 3) for k, v in eng.stats.stage_seconds.items()
            }
        print(
            f"round {r}: "
            + "  ".join(f"{n}={results[n][-1]:.0f}x" for n in sorted(results)),
            flush=True,
        )

    print("\nmedians over", rounds, "rounds:")
    for name in sorted(results):
        med = statistics.median(results[name])
        print(
            f"  {name}: {med:.0f}x (spread {min(results[name]):.0f}-"
            f"{max(results[name]):.0f})  stages {stages[name]}"
        )


if __name__ == "__main__":
    main()
