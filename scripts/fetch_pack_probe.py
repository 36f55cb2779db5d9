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

Measured r3 (5 rounds): packed median 669x > padded 640x > compact 607x
on the tunnel — packed is the default; re-probe per fabric (compact's
byte savings should win where per-dispatch latency is low).

Usage: python scripts/fetch_pack_probe.py [--rounds 5] [--utts 192]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--utts", type=int, default=192)
    ap.add_argument("--growth", type=float, default=1.45)
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
    audios, total_s = probe_common.bench_audios(args.utts)
    print(f"workload: {args.utts} utts / {total_s:.0f} s audio", flush=True)
    probe_common.warm_and_check_equal(engines, audios)
    print("all formats bit-equal; timing ...", flush=True)

    results, stages = probe_common.interleaved_rounds(
        engines, audios, total_s, args.rounds
    )
    report = {
        name: {
            "median_x_realtime": round(float(np.median(xs)), 1),
            "all": [round(x, 1) for x in xs],
            "last_round_stages": stages[name],
        }
        for name, xs in results.items()
    }
    print("RESULT " + json.dumps(report))


if __name__ == "__main__":
    main()
