"""Within-process A/B: YODAS2 fetch_ahead 0 vs 1 on the full pipeline.

Same synthetic mirror and engine as pipeline_bench; alternates the two
configurations round-robin in ONE process and reports medians (cross-run
tunnel numbers carry +-40% noise; only interleaved comparisons count).

Usage: python scripts/fetch_ahead_probe.py [rounds]
"""

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline_bench import build_mirror  # noqa: E402  (scripts/ sibling)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.yodas2 import LocalSource, Yodas2ShardProcessor
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.hub import LocalHub
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    tmp = tempfile.mkdtemp(prefix="fa_probe_")
    try:
        mirror = os.path.join(tmp, "mirror")
        total_audio, n_chunks = build_mirror(mirror, "en000", 4, 6, 90)
        print(f"{total_audio/3600:.2f} h audio, {n_chunks} chunks", flush=True)

        cfg = MimiConfig()
        engine = MimiEncoderEngine(
            random_params(cfg, seed=0),
            cfg,
            EngineConfig(
                min_bucket_seconds=2.0,
                bucket_growth=1.45,
                samples_per_batch=192 * 24_000,
                max_batch_size=128,
            ),
            num_codebooks=cfg.num_quantizers,
        )

        def run(tag, ahead):
            proc = Yodas2ShardProcessor(
                "en000",
                LocalSource(mirror),
                LocalHub(os.path.join(tmp, f"hub_{tag}")),
                engine,
                os.path.join(tmp, f"work_{tag}"),
                os.path.join(tmp, f"prog_{tag}"),
                max_subshards=4,
                max_consecutive_missing=2,
                upload_batch_size=2,
                fetch_ahead=ahead,
            )
            t0 = time.perf_counter()
            rep = proc.process()
            assert rep["processed"] == 4, rep
            return total_audio / (time.perf_counter() - t0)

        run("warm", 1)  # compile + warm
        results = {0: [], 1: []}
        for r in range(rounds):
            for ahead in (0, 1):
                results[ahead].append(run(f"r{r}a{ahead}", ahead))
            print(
                f"round {r}: serial={results[0][-1]:.0f}x ahead1={results[1][-1]:.0f}x",
                flush=True,
            )
        for ahead in (0, 1):
            print(
                f"fetch_ahead={ahead}: median {statistics.median(results[ahead]):.1f}x "
                f"(min {min(results[ahead]):.0f}, max {max(results[ahead]):.0f})"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
