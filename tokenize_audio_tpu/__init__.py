"""tokenize_audio_tpu — a TPU-native audio tokenization framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``potsawee/tokenize-audio`` datagen pipeline: the Mimi neural codec encoder
runs on TPU (SEANet conv stack, RoPE transformer bottleneck, split residual
vector quantization), with on-device resampling, length-bucketed batching,
pjit sharding over device meshes, and a shared-nothing shard orchestration
plane (progress files + artifact hub) around it.

Subpackages
-----------
core      : code<->unicode codec, audio DSP (resample/frame/normalize)
mimi      : the JAX Mimi model, weight conversion from HF checkpoints
engine    : length-bucketed batch encoding engine with throughput metrics
parallel  : device mesh / sharding helpers (dp x tp)
hub       : artifact store abstraction (HF hub, local fake for tests)
datasets  : per-corpus dataset builders (LibriSpeech, LibriTTS-R, ...)
runner    : shard orchestration, progress tracking, monitors
io        : audio container decode (wav/flac), parquet helpers
bpe       : codec-BPE tokenizer training over unicode code streams
analytics : token estimation and dataset row counting
"""

__version__ = "0.1.0"

from tokenize_audio_tpu.config import (  # noqa: F401
    CODEBOOK_SIZE,
    FRAME_RATE,
    MIMI_SAMPLE_RATE,
    NUM_CODEBOOKS,
    SAMPLES_PER_FRAME,
    UNICODE_OFFSET,
    UNICODE_OFFSET_LARGE,
)
