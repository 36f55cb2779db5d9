from tokenize_audio_tpu.bpe.trainer import CodecBPETrainer  # noqa: F401
