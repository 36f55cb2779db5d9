"""Within-process A/B probe: engine pipeline_depth x bucket_growth on the
real chip.

Cross-run tunnel numbers swing +-40%, so configurations are compared ONLY
inside one process, interleaved round-robin (config order re-randomized per
round) with medians reported. Usage:

    python scripts/pipeline_depth_probe.py [rounds]
"""

import statistics
import sys
import time

import numpy as np


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.utils import enable_compile_cache
    from tokenize_audio_tpu.mimi.weights import random_params

    enable_compile_cache()
    cfg = MimiConfig()
    params = random_params(cfg, seed=0)

    sys.path.insert(0, "scripts")
    import probe_common

    audios, total_s = probe_common.bench_audios(256)

    # r3 config (packed + ladder + growth 1.25) shrank per-batch bytes;
    # re-probe whether a deeper in-flight window now pays (r2 medians:
    # d2=364x, d4=422-445x, d8=478-485x on the padded format)
    variants = {}
    for depth in (8, 12, 16):
        ecfg = EngineConfig(
            min_bucket_seconds=2.0,
            bucket_growth=1.25,
            samples_per_batch=192 * 24_000,
            max_batch_size=128,
        )
        variants[f"d{depth}"] = MimiEncoderEngine(
            params, cfg, ecfg, pipeline_depth=depth
        )

    # warm every variant (compile + load)
    for name, eng in variants.items():
        t0 = time.perf_counter()
        eng.encode_batch(audios)
        print(f"warm {name}: {total_s / (time.perf_counter() - t0):.0f}x", flush=True)

    results = {k: [] for k in variants}
    order_rng = np.random.default_rng(1)
    names = list(variants)
    for r in range(rounds):
        for i in order_rng.permutation(len(names)):
            name = names[i]
            t0 = time.perf_counter()
            variants[name].encode_batch(audios)
            rt = total_s / (time.perf_counter() - t0)
            results[name].append(rt)
        print(f"round {r}: " + " ".join(f"{n}={results[n][-1]:.0f}" for n in names), flush=True)

    print("\nmedians over", rounds, "interleaved rounds:")
    for n in names:
        print(f"  {n}: median {statistics.median(results[n]):.1f}x  "
              f"(min {min(results[n]):.0f}, max {max(results[n]):.0f})")


if __name__ == "__main__":
    main()
