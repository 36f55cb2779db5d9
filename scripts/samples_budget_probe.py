"""Within-process A/B probe: engine samples_per_batch (the per-dispatch
audio budget) on the real chip.

The shipped 192x24k (~3.2 min of audio per call) was picked in r2 when
"larger budgets measured slower (HBM pressure)" — but the transport
stack has since changed (packed wire format, tail ladder, depth 12+):
fewer, larger dispatches amortize more per-call RTT on a latency-bound
fabric, so the old ranking deserves a re-probe. Interleaved rounds
within one process, as all probes (NOTES measurement discipline).

Usage: python scripts/samples_budget_probe.py [rounds]
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
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = MimiConfig()
    params = random_params(cfg, seed=0)

    sys.path.insert(0, "scripts")
    import probe_common

    audios, total_s = probe_common.bench_audios(256)

    variants = {}
    for mult in (128, 192, 288):
        ecfg = EngineConfig(
            min_bucket_seconds=2.0,
            bucket_growth=1.25,
            samples_per_batch=mult * 24_000,
            max_batch_size=128,
        )
        variants[f"b{mult}"] = MimiEncoderEngine(params, cfg, ecfg, pipeline_depth=18)

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
