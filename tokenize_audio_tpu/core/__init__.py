from tokenize_audio_tpu.core.codes import (  # noqa: F401
    chars_to_codes,
    codes_to_chars,
    resolve_codebook,
    validate_unicode_offset,
)
