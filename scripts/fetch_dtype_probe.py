"""A/B the device->host code transfer dtype WITHIN one process.

Tunnel throughput swings +-40% run to run, so int32-vs-uint16 can only be
decided by interleaved measurement in a single process (CLAUDE.md rule).
Measures (a) raw device_get of code-shaped arrays per dtype, and (b) the
full engine workload per dtype, interleaved A/B/A/B.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.engine.metrics import EngineStats
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("device:", jax.devices()[0])

    # (a) raw transfer: same element count, both dtypes, interleaved
    n = 64 * 8 * 750  # a 64-row 60s-bucket batch of codes
    a32 = jnp.asarray(np.random.randint(0, 2048, size=n, dtype=np.int32))
    a16 = a32.astype(jnp.uint16)
    jax.block_until_ready((a32, a16))
    t32 = t16 = 0.0
    reps = 20
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(a32))
        t32 += time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.device_get(a16))
        t16 += time.perf_counter() - t0
    print(
        f"raw device_get x{reps}: int32 {t32:.3f}s ({n*4*reps/t32/1e6:.0f} MB/s) "
        f"uint16 {t16:.3f}s ({n*2*reps/t16/1e6:.0f} MB/s)"
    )

    # (b) engine end-to-end, interleaved
    cfg = MimiConfig()
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    lengths_s = np.clip(rng.lognormal(mean=1.9, sigma=0.8, size=128), 0.8, 59.0)
    audios = [
        (rng.standard_normal(int(s * 24_000)) * 0.3).astype(np.float32)
        for s in lengths_s
    ]
    total_s = sum(len(a) for a in audios) / 24_000.0

    def make_engine(dtype):
        return MimiEncoderEngine(
            params,
            cfg,
            EngineConfig(
                min_bucket_seconds=2.0,
                bucket_growth=1.45,
                samples_per_batch=192 * 24_000,
                max_batch_size=128,
                code_transfer_dtype=dtype,
            ),
        )

    engines = {d: make_engine(d) for d in ("int32", "uint16")}
    for d, e in engines.items():
        e.encode_batch(audios)  # warm compiles for this dtype's programs

    results = {d: [] for d in engines}
    for round_i in range(3):
        for d, e in engines.items():
            e.stats = EngineStats()
            t0 = time.perf_counter()
            e.encode_batch(audios)
            wall = time.perf_counter() - t0
            results[d].append(total_s / wall)
            print(
                f"round {round_i} {d:7s}: {total_s / wall:6.1f}x RT "
                f"(fetch {e.stats.stage_seconds.get('fetch', 0):.2f}s "
                f"dispatch {e.stats.stage_seconds.get('dispatch', 0):.2f}s)"
            )
    for d, r in results.items():
        print(f"{d}: median {sorted(r)[len(r)//2]:.1f}x over {r}")


if __name__ == "__main__":
    main()
