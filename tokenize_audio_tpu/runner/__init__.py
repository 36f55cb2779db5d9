from tokenize_audio_tpu.runner.progress import (  # noqa: F401
    ShardProgress,
    append_jsonl,
    atomic_write_json,
    read_json,
    read_jsonl,
)
from tokenize_audio_tpu.runner.shard_runner import ShardRunner, WorkUnit  # noqa: F401
