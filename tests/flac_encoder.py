"""Minimal FLAC *encoder* used only to generate decoder test fixtures.

Emits spec-conformant streams covering every subframe type the native
decoder implements: CONSTANT, VERBATIM, FIXED(0-4), LPC, rice + escape
residual partitions, and the three stereo decorrelation modes. CRC fields
are zero-filled (the decoder, like many fast decoders, does not verify).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1 if bits < 64 else (1 << 64) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _rice_encode(bw: BitWriter, residuals: Sequence[int], param: int):
    for e in residuals:
        # canonical zigzag: n>=0 -> 2n ; n<0 -> -2n-1
        u = 2 * e if e >= 0 else -2 * e - 1
        q, lo = u >> param, u & ((1 << param) - 1)
        bw.write_unary(q)
        if param:
            bw.write(lo, param)


def _write_residual(bw: BitWriter, residuals: Sequence[int], escape: bool = False):
    bw.write(0, 2)  # method: rice 4-bit
    bw.write(0, 4)  # partition order 0
    if escape:
        bw.write(0xF, 4)
        raw_bits = max(int(np.abs(np.asarray(residuals)).max()).bit_length() + 1, 2)
        bw.write(raw_bits, 5)
        for e in residuals:
            bw.write_signed(e, raw_bits)
    else:
        arr = np.asarray(residuals, dtype=np.int64)
        mean = float(np.abs(arr).mean()) if len(arr) else 0.0
        param = min(14, max(0, int(np.ceil(np.log2(mean + 1))) + 1))
        bw.write(param, 4)
        _rice_encode(bw, residuals, param)


FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_subframe(
    bw: BitWriter,
    samples: np.ndarray,
    bps: int,
    kind: str,
    lpc_order: int = 4,
    escape: bool = False,
    wasted: int = 0,
):
    s = samples.astype(np.int64)
    if wasted:
        assert (s & ((1 << wasted) - 1) == 0).all()
        s = s >> wasted
    ebps = bps - wasted
    bw.write(0, 1)
    if kind == "constant":
        assert (s == s[0]).all()
        bw.write(0b000000, 6)
        _w_wasted(bw, wasted)
        bw.write_signed(int(s[0]), ebps)
    elif kind == "verbatim":
        bw.write(0b000001, 6)
        _w_wasted(bw, wasted)
        for v in s:
            bw.write_signed(int(v), ebps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.write(0b001000 | order, 6)
        _w_wasted(bw, wasted)
        for v in s[:order]:
            bw.write_signed(int(v), ebps)
        coefs = FIXED_COEFS[order]
        res = [
            int(s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs)))
            for i in range(order, len(s))
        ]
        _write_residual(bw, res, escape=escape)
    elif kind == "lpc":
        order = lpc_order
        bw.write(0b100000 | (order - 1), 6)
        _w_wasted(bw, wasted)
        for v in s[:order]:
            bw.write_signed(int(v), ebps)
        precision, shift = 12, 5
        rng = np.random.default_rng(order)
        coef = rng.integers(-(1 << 10), 1 << 10, size=order).tolist()
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coef:
            bw.write_signed(int(c), precision)
        res = [
            int(s[i] - (sum(c * s[i - 1 - j] for j, c in enumerate(coef)) >> shift))
            for i in range(order, len(s))
        ]
        _write_residual(bw, res, escape=escape)
    else:
        raise ValueError(kind)


def _w_wasted(bw: BitWriter, wasted: int):
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def encode_flac(
    audio: np.ndarray,  # int16 (T,) or (T, C)
    sample_rate: int = 24_000,
    blocksize: int = 4096,
    subframe_kinds: Optional[List[str]] = None,
    stereo_mode: str = "independent",  # left_side | right_side | mid_side
    escape: bool = False,
    wasted: int = 0,
    bits: int = 16,
) -> bytes:
    audio = np.asarray(audio, dtype=np.int64)
    if audio.ndim == 1:
        audio = audio[:, None]
    total, channels = audio.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    body = si.getvalue() + b"\x00" * 16  # md5 zeros
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    kinds = subframe_kinds or ["verbatim"]
    frame_idx = 0
    for start in range(0, total, blocksize):
        block = audio[start : start + blocksize]
        n = block.shape[0]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # 16-bit blocksize-1 follows
        bw.write(0, 4)  # sample rate from streaminfo
        if stereo_mode == "independent":
            bw.write(channels - 1, 4)
        else:
            assert channels == 2
            bw.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
        bw.write(4, 3)  # 16-bit samples
        bw.write(0, 1)
        assert frame_idx < 0x80
        bw.write(frame_idx, 8)  # utf8 single byte
        bw.write(n - 1, 16)
        bw.write(0, 8)  # crc8 (unverified)

        if stereo_mode == "independent":
            chans = [(block[:, c], bits) for c in range(channels)]
        else:
            left = block[:, 0]
            right = block[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                chans = [(left, bits), (side, bits + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bits + 1), (right, bits)]
            else:
                mid = (left + right) >> 1
                chans = [(mid, bits), (side, bits + 1)]
        for c, (data, cbps) in enumerate(chans):
            kind = kinds[(frame_idx + c) % len(kinds)]
            if kind == "constant" and not (data == data[0]).all():
                kind = "verbatim"
            _write_subframe(
                bw, data, cbps, kind, escape=escape, wasted=wasted if cbps == bits else 0
            )
        bw.align()
        bw.write(0, 16)  # crc16 (unverified)
        out += bw.getvalue()
        frame_idx += 1
    return bytes(out)
