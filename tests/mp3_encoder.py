"""Shim: the test-only mp3 encoder grew a second consumer (the benchmark
mirror's mp3 container mode), so it now lives in the package at
tokenize_audio_tpu.io.mp3enc; tests import through this name unchanged."""

from tokenize_audio_tpu.io.mp3enc import encode_mp3  # noqa: F401
