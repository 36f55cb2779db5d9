from tokenize_audio_tpu.runner.progress import ShardProgress, atomic_write_json, read_json  # noqa: F401
from tokenize_audio_tpu.runner.shard_runner import ShardRunner, WorkUnit  # noqa: F401
