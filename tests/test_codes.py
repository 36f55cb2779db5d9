"""Unit + property tests for the code<->unicode codec.

Covers the behaviors documented at pretraining-data/converter.py:17-140 and
librispeech-mimi/utils.py:18-55, plus an optional exact-parity sweep against
the reference converter when /root/reference is mounted.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tokenize_audio_tpu.config import (
    CODEBOOK_SIZE,
    NUM_CODEBOOKS,
    UNICODE_OFFSET,
    UNICODE_OFFSET_LARGE,
)
from tokenize_audio_tpu.core.codes import (
    chars_to_codes,
    codes_to_chars,
    resolve_codebook,
    validate_unicode_offset,
)

K, S = NUM_CODEBOOKS, CODEBOOK_SIZE


def random_codes(rng, k=K, t=40):
    return rng.integers(0, S, size=(k, t), dtype=np.int64)


def test_roundtrip_basic(rng):
    codes = random_codes(rng)
    s = codes_to_chars(codes, S, unicode_offset=UNICODE_OFFSET_LARGE)
    assert len(s) == codes.size
    back = chars_to_codes(s, K, S, return_tensors="np", unicode_offset=UNICODE_OFFSET_LARGE)
    np.testing.assert_array_equal(back, codes)


def test_roundtrip_list_and_pt(rng):
    codes = random_codes(rng, t=5)
    s = codes_to_chars(codes.tolist(), S, unicode_offset=UNICODE_OFFSET_LARGE)
    back = chars_to_codes(s, K, S, unicode_offset=UNICODE_OFFSET_LARGE)
    assert back == codes.tolist()
    back_pt = chars_to_codes(s, K, S, return_tensors="pt", unicode_offset=UNICODE_OFFSET_LARGE)
    np.testing.assert_array_equal(back_pt.numpy(), codes)


def test_frame_major_interleave():
    # frame 0 = [0, 1], frame 1 = [2, 3] over 2 codebooks of size 4
    codes = np.array([[0, 2], [1, 3]])
    s = codes_to_chars(codes, 4, unicode_offset=0xE000)
    assert [ord(c) for c in s] == [0xE000 + 0, 0xE004 + 1, 0xE000 + 2, 0xE004 + 3]


def test_default_offset_matches_acoustic_bpe():
    assert UNICODE_OFFSET == 0x4E00
    codes = np.array([[0], [0]])
    s = codes_to_chars(codes, 4)
    assert ord(s[0]) == 0x4E00


def test_surrogate_offset_rejected():
    # 8 x 2048 = 16384 from 0x4E00 tops out at 0x8E00 — clears the surrogates.
    assert validate_unicode_offset(0x4E00, 8, 2048) == 0x4E00
    # 32 x 2048 = 65536 from 0x4E00 crosses 0xD800: rejected.
    with pytest.raises(ValueError, match="surrogate"):
        validate_unicode_offset(0x4E00, 32, 2048)
    with pytest.raises(ValueError):
        codes_to_chars(np.zeros((32, 2), dtype=np.int64), 2048, unicode_offset=0x4E00)
    # Production offset clears the surrogates even at 32 codebooks.
    assert validate_unicode_offset(0xE000, 32, 2048) == 0xE000


def test_resolve_codebook_clamping():
    off = 0xE000
    assert resolve_codebook(off - 1, 4, 16, off) == -1
    assert resolve_codebook(off, 4, 16, off) == 0
    assert resolve_codebook(off + 16 * 3, 4, 16, off) == 3
    # values past the last codebook clamp to K-1 (reference scan behavior)
    assert resolve_codebook(off + 16 * 9, 4, 16, off) == 3


def test_drop_hanging_codes(rng):
    codes = random_codes(rng, t=6)
    s = codes_to_chars(codes, S, unicode_offset=UNICODE_OFFSET_LARGE)
    # chop 3 leading codes (partial frame) and 2 trailing codes
    dirty = s[3:-2]
    out, begin_h, end_h = chars_to_codes(
        dirty,
        K,
        S,
        return_tensors="np",
        return_hanging_codes_chars=True,
        unicode_offset=UNICODE_OFFSET_LARGE,
    )
    np.testing.assert_array_equal(out, codes[:, 1:-1])
    assert begin_h == s[3:K]  # codebooks 3..7 of the first partial frame
    assert end_h == s[-K:-2]  # codebooks 0..5 of the last partial frame


def test_drop_inconsistent_codes():
    off = 0xE000
    k, size = 4, 16
    clean = np.array([[1, 2], [3, 4], [5, 6], [7, 8]])
    s = codes_to_chars(clean, size, unicode_offset=off)
    # Inject a duplicate codebook-2 char mid-frame: should be dropped.
    dirty = s[:2] + s[2] + s[2:]
    out = chars_to_codes(dirty, k, size, return_tensors="np", unicode_offset=off)
    np.testing.assert_array_equal(out, clean)


def test_no_dropping_flags_match_simple_variant(rng):
    """With dropping disabled this is the simple utils.py:40-55 variant."""
    codes = random_codes(rng, t=8)
    s = codes_to_chars(codes, S, unicode_offset=UNICODE_OFFSET_LARGE)
    out = chars_to_codes(
        s,
        K,
        S,
        drop_inconsistent_codes=False,
        drop_hanging_codes=False,
        return_tensors="np",
        unicode_offset=UNICODE_OFFSET_LARGE,
    )
    np.testing.assert_array_equal(out, codes)


def test_non_divisible_without_trim_raises(rng):
    codes = random_codes(rng, t=3)
    s = codes_to_chars(codes, S, unicode_offset=UNICODE_OFFSET_LARGE)
    with pytest.raises(ValueError, match="divisible"):
        chars_to_codes(
            s[1:],
            K,
            S,
            drop_inconsistent_codes=False,
            drop_hanging_codes=False,
            unicode_offset=UNICODE_OFFSET_LARGE,
        )


@requires_reference
@pytest.mark.parametrize("seed", range(5))
def test_parity_with_reference_converter(seed):
    """Exact output parity against pretraining-data/converter.py on random,
    truncated, and corrupted streams."""
    import sys

    sys.path.insert(0, "/root/reference/pretraining-data")
    try:
        import converter as ref
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, S, size=(K, 50), dtype=np.int64)
    s_ref = ref.codes_to_chars(codes.copy(), S, unicode_offset=0xE000)
    s_new = codes_to_chars(codes, S, unicode_offset=0xE000)
    assert s_ref == s_new

    # mangle: random head/tail chop + random char deletions
    lo = int(rng.integers(0, 10))
    hi = len(s_ref) - int(rng.integers(0, 10))
    dirty = s_ref[lo:hi]
    keep = rng.random(len(dirty)) > 0.02
    dirty = "".join(c for c, m in zip(dirty, keep) if m)

    got_ref = ref.chars_to_codes(dirty, K, S, unicode_offset=0xE000)
    got_new = chars_to_codes(dirty, K, S, unicode_offset=0xE000)
    assert got_ref == got_new


def test_lone_surrogates_dropped_not_crash(rng):
    """Corrupted streams with lone surrogates decode (chars dropped as
    inconsistent) instead of raising UnicodeEncodeError."""
    codes = random_codes(rng, t=4)
    s = codes_to_chars(codes, S, unicode_offset=UNICODE_OFFSET_LARGE)
    dirty = s[:8] + "\ud800" + s[8:]
    out = chars_to_codes(dirty, K, S, return_tensors="np", unicode_offset=UNICODE_OFFSET_LARGE)
    np.testing.assert_array_equal(out, codes)


def test_surrogate_offset_boundaries():
    """[lower, upper) vs the inclusive surrogate block [0xD800, 0xDFFF]:
    both boundary offsets must be rejected (0xDFFF was admitted by an
    off-by-one before r2)."""
    from tokenize_audio_tpu.core.codes import validate_unicode_offset

    for bad in (0xDFFF, 0xD800, 0xD000):  # 0xD000+8*2048 crosses into block
        with pytest.raises(ValueError, match="surrogate"):
            validate_unicode_offset(bad, 8, 2048)
    assert validate_unicode_offset(0xE000, 8, 2048) == 0xE000
    assert validate_unicode_offset(0xD800 - 8 * 2048, 8, 2048)  # ends at 0xD800
