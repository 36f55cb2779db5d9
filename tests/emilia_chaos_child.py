"""Child for the Emilia SIGKILL chaos test: runs EmiliaShardProcessor
end to end against a parent-built source hub. Prints READY after the
engine is built and DONE <report> on completion."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    src_dir, dst_dir, work = sys.argv[1:4]
    conversational = len(sys.argv) > 4 and sys.argv[4] == "conversational"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tests.mimi_fixtures import make_oracle, tiny_hf_config
    from tokenize_audio_tpu.config import EngineConfig
    from tokenize_audio_tpu.datasets.emilia import EmiliaShardProcessor
    from tokenize_audio_tpu.engine import MimiEncoderEngine
    from tokenize_audio_tpu.hub import LocalHub
    from tokenize_audio_tpu.utils import enable_compile_cache

    enable_compile_cache()
    _, params, cfg = make_oracle(tiny_hf_config())
    engine = MimiEncoderEngine(
        params,
        cfg,
        EngineConfig(batch_size=4, min_bucket_seconds=0.25, max_chunk_seconds=2.0),
    )
    proc = EmiliaShardProcessor(
        "Emilia",
        "EN",
        "EN_B00000",
        LocalHub(src_dir),
        LocalHub(dst_dir),
        engine,
        work,
        conversational=conversational,
    )
    print("READY", flush=True)
    rep = proc.process()
    print("DONE " + json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
