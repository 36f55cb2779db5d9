"""Child process for the YODAS2 SIGKILL chaos test (test_yodas2_chaos).

Runs the flagship shard processor end to end against a local mirror.
Prints READY once the engine is built (the parent waits for it before
arming the kill timer) and DONE <report> on completion. Run only via the
test driver.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mirror, work, prog, hubdir = sys.argv[1:5]
    shard = sys.argv[5] if len(sys.argv) > 5 else "en000"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.mimi_fixtures import make_oracle, tiny_hf_config
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.yodas2 import LocalSource, Yodas2ShardProcessor
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.hub import LocalHub
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()  # kills + reruns shouldn't pay CPU recompiles
    _, params, cfg = make_oracle(tiny_hf_config())
    engine = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=2.0),
        num_codebooks=12,
    )
    proc = Yodas2ShardProcessor(
        shard,
        LocalSource(mirror),
        LocalHub(hubdir),
        engine,
        work,
        prog,
        max_subshards=20,
        max_consecutive_missing=5,
        upload_batch_size=1,  # upload eagerly: more crash windows straddle it
        save_every=1,
    )
    print("READY", flush=True)
    rep = proc.process()
    print("DONE " + json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
