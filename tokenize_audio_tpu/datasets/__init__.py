from tokenize_audio_tpu.datasets.base import (  # noqa: F401
    asr_document,
    interleaved_type1,
    interleaved_type2,
    speaker_tagged_text,
    tts_document,
)
