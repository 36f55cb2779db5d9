"""Interleaved A/B of the device->host code wire formats.

BENCH_r02 put fetch at 87% of engine wall (2.98 s of 3.43 s): the padded
(B, K, T_bucket) int32 fetch ships >=25% garbage (bucket pad + row pad)
at 32 bits per 11-bit code. Candidates (mimi.model.encode ``transfer``):

  padded  — status quo.
  packed  — 2 codes per int32 word (16-bit aligned), host unpack = free
            little-endian view. Halves bytes; no sub-word dtype on the
            wire (raw uint16 lost end-to-end in r2, NOTES #4).
  compact — packed + valid frames gathered to the front on device; the
            engine fetches a 16-step-lattice-padded prefix only.

Measurement discipline (CLAUDE.md): one process, formats interleaved
within every round, medians decide; cross-run numbers are +-40% noise.

Usage: python scripts/fetch_pack_probe.py [--rounds 5] [--utts 192]
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
    ap.add_argument("--growth", type=float, default=1.45)
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

    def engine(fmt):
        return MimiEncoderEngine(
            params,
            cfg,
            EngineConfig(
                min_bucket_seconds=2.0,
                bucket_growth=args.growth,
                samples_per_batch=192 * 24_000,
                max_batch_size=128,
                code_transfer_format=fmt,
            ),
        )

    engines = {f: engine(f) for f in ("padded", "packed", "compact")}

    rng = np.random.default_rng(0)
    lengths_s = np.clip(rng.lognormal(mean=1.9, sigma=0.8, size=args.utts), 0.8, 59.0)
    audios = [
        (rng.standard_normal(int(s * 24_000)) * 0.3 * 32767).astype(np.int16)
        for s in lengths_s
    ]
    total_s = sum(len(a) for a in audios) / 24_000.0
    print(f"workload: {args.utts} utts / {total_s:.0f} s audio", flush=True)

    ref = None
    for name, eng in engines.items():  # warm + cross-check equality
        got = eng.encode_batch(audios)
        if ref is None:
            ref = got
        else:
            assert all((a == b).all() for a, b in zip(ref, got)), name
    print("all formats bit-equal; timing ...", flush=True)

    results = {f: [] for f in engines}
    stages = {}
    for r in range(args.rounds):
        for name, eng in engines.items():
            eng.stats = EngineStats()
            t0 = time.perf_counter()
            eng.encode_batch(audios)
            wall = time.perf_counter() - t0
            results[name].append(total_s / wall)
            stages[name] = {k: round(v, 3) for k, v in eng.stats.stage_seconds.items()}
        print(
            f"round {r}: "
            + "  ".join(f"{n}={results[n][-1]:.0f}x" for n in results),
            flush=True,
        )
    report = {}
    for name, xs in results.items():
        report[name] = {
            "median_x_realtime": round(float(np.median(xs)), 1),
            "all": [round(x, 1) for x in xs],
            "last_round_stages": stages[name],
        }
    print("RESULT " + json.dumps(report))


if __name__ == "__main__":
    main()
