"""Child process for the parquet-corpus SIGKILL chaos test
(test_corpus_chaos).

Runs the generic parquet-corpus template (Common Voice spec: 48 kHz
embedded audio, fused on-device resample) over three seeded source
shards with the per-shard skip-if-on-hub + progress resume grain
(process_common_voice.py:150-165 equivalent). Prints READY once the
engine is built (the parent waits for it before arming the kill timer)
and DONE <reports> on completion. Run only via the test driver.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARDS = ("shard0", "shard1", "shard2")


def build_source(src):
    """Seeded 3-shard Common Voice-style source; idempotent across reruns."""
    import numpy as np

    from tokenize_audio_tpu.datasets.parquet_utils import write_parquet

    rng = np.random.default_rng(11)
    for shard in SHARDS:
        rows = []
        for i in range(4):
            dur = float(rng.uniform(0.3, 0.6))
            audio = (rng.standard_normal(int(48_000 * dur)) * 0.2).astype(np.float32)
            rows.append(
                {
                    "id": f"{shard}_cv{i}",
                    "sentence": f"{shard} phrase {i}",
                    "client_id": f"spk{i % 2}",
                    "audio": {"array": audio, "sampling_rate": 48_000},
                }
            )
        path = os.path.join(src.root, "tmp_build.parquet")
        write_parquet(rows, path)
        src.upload_file(path, f"en/{shard}.parquet")
        os.unlink(path)


def main():
    srcdir, dstdir, work, prog = sys.argv[1:5]
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.mimi_fixtures import make_oracle, tiny_hf_config
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.parquet_corpus import SPECS, process_shard
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.hub import LocalHub
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()  # kills + reruns shouldn't pay CPU recompiles
    _, params, cfg = make_oracle(tiny_hf_config())
    engine = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=2.0),
    )
    src = LocalHub(srcdir)
    build_source(src)
    dst = LocalHub(dstdir)
    print("READY", flush=True)
    reports = [
        process_shard(SPECS["common_voice"], s, "en", src, dst, engine, work, prog)
        for s in SHARDS
    ]
    print("DONE " + json.dumps(reports), flush=True)


if __name__ == "__main__":
    main()
