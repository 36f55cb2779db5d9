"""Child process for the MLS SIGKILL chaos test (test_mls_chaos).

Runs the full two-stage MLS path — stage-1 content-addressed entry JSONs
(index progress + skip-if-exists) then the stage-2 consecutive-segment
merge into hub parquets — over a deterministic seeded workload. Prints
READY once the engine is built (the parent waits for it before arming the
kill timer) and DONE <report> on completion. Run only via the test driver.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_rows():
    """Deterministic workload: 2 speakers x 2 books x 10 utterances, 16 kHz,
    consecutive times with one mid-book gap (so stage 2 emits >1 segment)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for spk in ("spkA", "spkB"):
        for book in ("bk0", "bk1"):
            t = 0.0
            for i in range(10):
                dur = float(rng.uniform(0.3, 0.7))
                if i == 5:
                    t += 5.0  # continuity break -> new segment
                audio = (rng.standard_normal(int(16_000 * dur)) * 0.2).astype(
                    np.float32
                )
                rows.append(
                    {
                        "speaker_id": spk,
                        "book_id": book,
                        "transcript": f"{spk} {book} line {i}",
                        "begin_time": t,
                        "end_time": t + dur,
                        "original_path": f"orig/{spk}/{book}.flac",
                        "audio": {"array": audio, "sampling_rate": 16_000},
                    }
                )
                t += dur
    return rows


def main():
    out1, prog, hubdir, work2 = sys.argv[1:5]
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.mimi_fixtures import make_oracle, tiny_hf_config
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.mls import (
        MLSStage1Processor,
        create_batch_lists,
        merge_batch,
    )
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
    rows = build_rows()
    print("READY", flush=True)
    stage1 = MLSStage1Processor(
        "sh0", engine, out1, prog, progress_save_interval=2
    ).run(rows)
    hub = LocalHub(hubdir)
    reports = [
        merge_batch(out1, b, f"batch_{i:03d}", hub, work2)
        for i, b in enumerate(create_batch_lists(out1, speakers_per_batch=1))
    ]
    print("DONE " + json.dumps({"stage1": stage1, "stage2": reports}), flush=True)


if __name__ == "__main__":
    main()
