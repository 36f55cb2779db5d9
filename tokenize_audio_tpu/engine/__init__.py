from tokenize_audio_tpu.engine.encoder import MimiEncoderEngine  # noqa: F401
from tokenize_audio_tpu.engine.metrics import EngineStats  # noqa: F401
