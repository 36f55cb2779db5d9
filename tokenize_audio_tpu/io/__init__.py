from tokenize_audio_tpu.io.wav import read_wav, write_wav  # noqa: F401
from tokenize_audio_tpu.io.decode import decode_audio, register_decoder  # noqa: F401
