"""End-to-end pipeline benchmark: the full YODAS2 shard path on one chip.

bench.py measures the encode engine alone; this drives the WHOLE
production path — tar fetch + extract, WAV decode, centisecond chunk
slicing, batched encode, uint16 JSON serialization, batched hub upload —
against a synthetic local mirror, and reports audio-hours per wall hour
end to end (the number comparable to the reference's 1-3 h per ~300-500
utterance shard on a 40 GB GPU, mls-en-mimi-pretrain/README.md:238-240).

Usage: python scripts/pipeline_bench.py [--subshards 4] [--audios 6]
       [--seconds 90]
"""

import argparse
import json
import os
import shutil
import sys
import tarfile
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def build_mirror(root, shard, subshards, audios_per, seconds, sr=24_000):
    rng = np.random.default_rng(0)
    from tokenize_audio_tpu.io import write_wav

    total_audio = 0.0
    n_chunks = 0
    for s in range(subshards):
        sid = f"{s:08d}"
        sdir = os.path.join(root, shard)
        os.makedirs(sdir, exist_ok=True)
        wav_dir = os.path.join(root, f"_b{sid}")
        os.makedirs(wav_dir, exist_ok=True)
        meta = []
        for a in range(audios_per):
            audio_id = f"vid-{sid}-{a}"
            t = np.arange(int(seconds * sr)) / sr
            x = (
                0.3 * np.sin(2 * np.pi * (120 + 40 * a) * t)
                + 0.1 * rng.standard_normal(len(t))
            ).astype(np.float32)
            write_wav(os.path.join(wav_dir, f"{audio_id}.wav"), x, sr)
            total_audio += seconds
            # ~3 s mean chunks in centiseconds, lognormal-ish lengths
            text = {}
            pos = 0
            idx = 0
            while pos < seconds * 100 - 200:
                dur = int(np.clip(rng.lognormal(5.6, 0.6), 150, 3000))  # cs
                end = min(pos + dur, int(seconds * 100))
                text[f"{audio_id}-{idx:05d}-{pos:08d}-{end:08d}"] = f"chunk {idx}"
                pos = end
                idx += 1
                n_chunks += 1
            meta.append({"audio_id": audio_id, "text": text})
        with tarfile.open(os.path.join(sdir, f"{sid}.tar.gz"), "w:gz") as tf:
            tf.add(wav_dir, arcname="audio")
        with open(os.path.join(sdir, f"{sid}.json"), "w") as f:
            json.dump(meta, f)
        shutil.rmtree(wav_dir)
    return total_audio, n_chunks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subshards", type=int, default=4)
    ap.add_argument("--audios", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=90.0)
    args = ap.parse_args()

    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.yodas2 import LocalSource, Yodas2ShardProcessor
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.hub import LocalHub
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import random_params
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    tmp = tempfile.mkdtemp(prefix="pipe_bench_")
    try:
        _run_bench(args, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _run_bench(args, tmp):
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.yodas2 import LocalSource, Yodas2ShardProcessor
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.hub import LocalHub
    from tokenize_audio_tpu.mimi import MimiConfig
    from tokenize_audio_tpu.mimi.weights import random_params

    mirror = os.path.join(tmp, "mirror")
    print("building synthetic mirror ...")
    total_audio, n_chunks = build_mirror(
        mirror, "en000", args.subshards, args.audios, args.seconds
    )
    print(f"  {total_audio/3600:.2f} h audio, {n_chunks} chunks")

    cfg = MimiConfig()
    params = random_params(cfg, seed=0)
    engine = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(
            min_bucket_seconds=2.0,
            bucket_growth=1.45,
            samples_per_batch=192 * 24_000,
            max_batch_size=128,
        ),
        num_codebooks=cfg.num_quantizers,  # raw stage stores all books
    )
    hub = LocalHub(os.path.join(tmp, "hub"))

    def run(tag, run_hub):
        proc = Yodas2ShardProcessor(
            "en000",
            LocalSource(mirror),
            run_hub,
            engine,
            os.path.join(tmp, f"work_{tag}"),
            os.path.join(tmp, f"prog_{tag}"),
            max_subshards=args.subshards,
            max_consecutive_missing=2,
            upload_batch_size=2,
        )
        t0 = time.perf_counter()
        rep = proc.process()
        return time.perf_counter() - t0, rep

    import jax

    from tokenize_audio_tpu.engine.metrics import EngineStats

    wall1, _ = run("warm", hub)  # pass 1: compiles + warms
    # fresh hub/progress so pass 2 re-processes everything
    engine.stats = EngineStats()
    wall, rep = run("m", LocalHub(os.path.join(tmp, "hub2")))

    assert rep["processed"] == args.subshards, rep
    rt = total_audio / wall
    print(
        json.dumps(
            {
                "metric": "pipeline_audio_hours_per_hour_per_chip",
                "value": round(rt, 1),
                "unit": "x_realtime",
                "detail": {
                    "device": str(jax.devices()[0]),
                    "audio_hours": round(total_audio / 3600, 3),
                    "wall_seconds": round(wall, 2),
                    "chunks": n_chunks,
                    "subshards": args.subshards,
                    "engine_stage_seconds": {
                        k: round(v, 2)
                        for k, v in engine.stats.stage_seconds.items()
                    },
                    "warm_pass_seconds": round(wall1, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
