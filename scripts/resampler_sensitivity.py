"""Quantify how Mimi code output depends on the resampler's filter design.

Context (VERDICT r1 weak #5): the reference resamples with librosa/soxr_hq
(librispeech-mimi/utils.py:84-87); this framework uses a
scipy.resample_poly-parity polyphase filter (core/audio.py). librosa/soxr
are not installed in this sandbox, so an exact scipy-vs-librosa code delta
cannot be measured here. This script measures the next-best bound: encode
the same fixtures through TWO deliberately different high-quality designs —
  A: production filter (Kaiser beta=5.0, half-width 10, scipy default)
  B: much sharper filter (Kaiser beta=12.0, half-width 24, ~soxr_hq-class
     stopband attenuation)
and report frame exact-match between the resulting codes. If codes barely
move between two HQ filters that differ far more than scipy-vs-soxr_hq do,
the scipy-vs-librosa deviation is bounded tighter still.

Run: python scripts/resampler_sensitivity.py  (CPU, random-weight oracle)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import functools

import tokenize_audio_tpu.core.audio as audio_mod
from tokenize_audio_tpu.core.audio import resample
from tokenize_audio_tpu.mimi import MimiConfig
from tokenize_audio_tpu.mimi.model import encode
from tokenize_audio_tpu.mimi.weights import random_params


def make_fixtures(rng, sr, n=12, max_s=4.0):
    out = []
    for i in range(n):
        secs = 0.5 + rng.random() * (max_s - 0.5)
        t = np.arange(int(secs * sr)) / sr
        kind = i % 3
        if kind == 0:  # harmonic + vibrato
            x = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(
                2 * np.pi * 663 * t * (1 + 0.05 * np.sin(3 * t))
            )
        elif kind == 1:  # speech-ish filtered noise (high-band energy)
            x = rng.standard_normal(len(t)) * 0.3
            x = np.convolve(x, np.ones(5) / 5, mode="same") + 0.1 * rng.standard_normal(len(t))
        else:  # chirp up to near-Nyquist: max antialias stress
            f0, f1 = 100, sr * 0.45
            x = 0.3 * np.sin(2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * t[-1])))
        out.append(x.astype(np.float32))
    return out


def with_filter(half_width, beta):
    """Temporarily swap the polyphase design (clearing the plan cache)."""
    orig = audio_mod._kaiser_sinc_filter

    def f(up, down, half_width_=half_width, beta_=beta):
        return orig(up, down, half_width=half_width_, beta=beta_)

    return f


def encode_with(params, cfg, fixtures, sr, design):
    audio_mod._kaiser_sinc_filter = design
    audio_mod._resample_plan.cache_clear()
    # the jitted batch resampler constant-folds the kernel at trace time;
    # stale traces would silently reuse the previous design
    audio_mod._resample_batch.clear_cache()
    codes = []
    resampled = []
    for x in fixtures:
        y = np.asarray(resample(x, sr, 24_000))
        resampled.append(y)
        n = len(y)
        pad = -(-n // 1920) * 1920 - n
        y = np.pad(y, (0, pad))
        c, v = encode(params, cfg, y[None], np.asarray([n]), num_quantizers=8)
        codes.append(np.asarray(c)[0, :, : int(np.asarray(v)[0])])
    return codes, resampled


def main():
    rng = np.random.default_rng(0)
    cfg = MimiConfig()  # FULL production-size model, random weights
    params = random_params(cfg, seed=0)
    base = audio_mod._kaiser_sinc_filter

    design_a = with_filter(10, 5.0)  # production (scipy default)
    design_b = with_filter(24, 12.0)  # sharper, soxr_hq-class attenuation

    for sr in (16_000, 48_000):
        fixtures = make_fixtures(rng, sr)
        a, wav_a = encode_with(params, cfg, fixtures, sr, design_a)
        b, wav_b = encode_with(params, cfg, fixtures, sr, design_b)
        audio_mod._kaiser_sinc_filter = base
        audio_mod._resample_plan.cache_clear()
        audio_mod._resample_batch.clear_cache()
        wav_delta = max(
            float(np.abs(x - y).max()) for x, y in zip(wav_a, wav_b)
        )
        assert wav_delta > 1e-7, "designs produced identical waveforms — experiment broken"
        print(f"  max |waveform delta| between designs: {wav_delta:.3e}")
        total = match = 0
        per_book = np.zeros(8)
        n_frames = 0
        for ca, cb in zip(a, b):
            total += ca.size
            match += (ca == cb).sum()
            per_book += (ca == cb).sum(axis=1)
            n_frames += ca.shape[1]
        frames_all_match = sum(
            ((ca == cb).all(axis=0)).sum() for ca, cb in zip(a, b)
        )
        print(
            f"{sr} Hz -> 24 kHz over {len(fixtures)} fixtures / {n_frames} frames: "
            f"code match {100.0 * match / total:.2f}%  "
            f"frame all-8-match {100.0 * frames_all_match / n_frames:.2f}%  "
            f"per-book {np.round(100 * per_book / n_frames, 2).tolist()}"
        )


if __name__ == "__main__":
    main()
