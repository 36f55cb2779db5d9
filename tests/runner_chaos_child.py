"""Child process for the ShardRunner-family SIGKILL chaos test
(test_runner_chaos).

Runs the two ShardRunner/ShardProgress-based processor families back to
back over deterministic seeded workloads:

  1. LibriSpeech train layout — chunked parquet via ShardRunner with
     upload_batch_size > 1 (chunk resume, pending/flush, and the
     crash-between-upload-and-mark adoption window,
     runner/shard_runner.py).
  2. parquet_corpus (libritts_r spec) — shard-grain skip-if-on-hub
     idempotence with upload verification (datasets/parquet_corpus.py
     process_shard).

Fixtures (WAVs, source-shard parquets) are regenerated deterministically
at the top of every run, so a kill landing inside fixture generation is
healed by the rerun. Prints READY once the engine is built and
DONE <report> on completion. Run only via the test driver.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    base = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tests.mimi_fixtures import make_oracle, tiny_hf_config
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.librispeech import process_split
    from tokenize_audio_tpu.datasets.parquet_corpus import SPECS, process_shard
    from tokenize_audio_tpu.datasets.parquet_utils import write_parquet
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.hub import LocalHub
    from tokenize_audio_tpu.io import write_wav
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()  # kills + reruns shouldn't pay CPU recompiles

    # --- deterministic fixtures, regenerated every run -------------------
    wav_dir = os.path.join(base, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(11)
    manifest = []
    for i in range(12):
        audio = (rng.standard_normal(int(24_000 * (0.3 + 0.04 * i))) * 0.3).astype(
            np.float32
        )
        p = os.path.join(wav_dir, f"utt{i}.wav")
        write_wav(p, audio, 24_000)
        manifest.append({"id": f"tr-{i}", "audio": p, "text": f"line {i}"})

    src_dir = os.path.join(base, "pc_src")
    rng2 = np.random.default_rng(13)
    for s in range(3):
        rows = []
        for i in range(6):
            audio = (rng2.standard_normal(int(24_000 * 0.4)) * 0.3).astype(np.float32)
            rows.append(
                {
                    "id": f"s{s}u{i}",
                    "text_normalized": f"shard {s} utt {i}",
                    "speaker_id": 100 + i // 3,
                    "chapter_id": s,
                    "audio": {"array": audio, "sampling_rate": 24_000},
                }
            )
        tmp = os.path.join(base, f".shard{s}.tmp")
        write_parquet(rows, tmp)
        dest = os.path.join(src_dir, "data", f"shard{s}.parquet")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(tmp, dest)

    _, params, cfg = make_oracle(tiny_hf_config())
    engine = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=2.0),
    )
    print("READY", flush=True)

    ls_report = process_split(
        manifest,
        "train-clean",
        engine,
        LocalHub(os.path.join(base, "ls_hub")),
        os.path.join(base, "ls_prog"),
        os.path.join(base, "ls_work"),
        chunk_rows=4,  # 2 utterances per chunk -> 6 chunks
        upload_batch_size=2,
    )
    src = LocalHub(src_dir)
    dst = LocalHub(os.path.join(base, "pc_hub"))
    pc_reports = [
        process_shard(
            SPECS["libritts_r"],
            f"shard{s}",
            "",
            src,
            dst,
            engine,
            os.path.join(base, "pc_work"),
            os.path.join(base, "pc_prog"),
        )
        for s in range(3)
    ]
    print(
        "DONE " + json.dumps({"librispeech": ls_report.__dict__, "corpus": pc_reports}),
        flush=True,
    )


if __name__ == "__main__":
    main()
