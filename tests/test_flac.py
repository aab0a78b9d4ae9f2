"""Native FLAC codec: encoder round trips plus hand-built bitstreams
for every decoder path the fixture encoder does not emit (LPC,
stereo decorrelation, 5-bit rice, escape partitions, partition
order > 0, wasted bits, VERBATIM) — each with an independently
computed expectation."""

import struct

import numpy as np
import pytest

from coffea_spark.llmdata.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_code,
    decode_flac,
    encode_flac,
)


def _stream(frames: bytes, rate=8000, chans=1, bps=16, total=0) -> bytes:
    si = _BitWriter()
    si.write(1024, 16); si.write(1024, 16); si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(chans - 1, 3); si.write(bps - 1, 5)
    si.write(total, 36)
    si.align()
    return (b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
            + si.bytes() + b"\x00" * 16 + frames)


def _frame(subframe_bits, bs, ch_code, rate=8000, bps_code=0b100, frame_no=0):
    hdr = bytearray(b"\xff\xf8")
    hdr.append((0b0111 << 4) | 0b0000)       # 16-bit blocksize follows; rate from STREAMINFO
    hdr.append((ch_code << 4) | (bps_code << 1))
    hdr += _utf8_code(frame_no)
    hdr += struct.pack(">H", bs - 1)
    hdr.append(_crc8(bytes(hdr)))
    w = _BitWriter()
    subframe_bits(w)
    w.align()
    f = bytes(hdr) + w.bytes()
    return f + struct.pack(">H", _crc16(f))


def _write_verbatim(w, xs, bps=16):
    w.write(0, 1); w.write(0b000001, 6); w.write(0, 1)
    for v in xs:
        w.write(int(v) & ((1 << bps) - 1), bps)


def _write_rice_residual(w, res, k, pbits=4, po=0, counts=None):
    w.write(0 if pbits == 4 else 1, 2)
    w.write(po, 4)
    parts = counts or [len(res)]
    idx = 0
    for cnt in parts:
        w.write(k, pbits)
        for v in res[idx:idx + cnt]:
            z = 2 * v if v >= 0 else -2 * v - 1
            w.write_unary(z >> k)
            if k:
                w.write(z & ((1 << k) - 1), k)
        idx += cnt


def test_encoder_roundtrips():
    rng = np.random.default_rng(7)
    for shape in ((1500,), (1500, 2), (1024,), (1,)):
        x = rng.integers(-32768, 32767, shape).astype(np.int16)
        y, rate = decode_flac(encode_flac(x, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(y, x.astype(np.int32))
    with pytest.raises(ValueError):
        encode_flac(np.zeros(4, dtype=np.float64), 8000)
    with pytest.raises(ValueError):
        decode_flac(b"RIFFnope")


def test_lpc_subframe_hand_built():
    """LPC order 2, precision 5, shift 2: expectation computed by an
    independent recurrence in the test."""
    warm = [100, -50]
    coefs = [10, -3]  # 5-bit signed range
    res = [5, -7, 0, 12, -1, 3]
    bs = len(warm) + len(res)

    def sub(w):
        w.write(0, 1)
        w.write(32 + (2 - 1), 6)  # LPC order 2
        w.write(0, 1)
        for v in warm:
            w.write(v & 0xFFFF, 16)
        w.write(5 - 1, 4)   # precision 5
        w.write(2, 5)       # shift 2
        for c in coefs:
            w.write(c & 0x1F, 5)
        _write_rice_residual(w, res, k=2)

    data = _stream(_frame(sub, bs, ch_code=0), total=bs)
    y, _ = decode_flac(data)
    exp = list(warm)
    for rv in res:
        acc = coefs[0] * exp[-1] + coefs[1] * exp[-2]
        exp.append(rv + (acc >> 2))
    np.testing.assert_array_equal(y, np.array(exp, dtype=np.int32))


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_hand_built(mode):
    left = np.array([1000, -2000, 15, 7, -32768, 32767], dtype=np.int64)
    right = np.array([999, -2005, -15, 7, -32768, 32760], dtype=np.int64)
    side = left - right
    bs = len(left)
    ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]

    def sub(w):
        if mode == "left_side":
            _write_verbatim(w, left, 16)
            _write_verbatim(w, side, 17)
        elif mode == "right_side":
            _write_verbatim(w, side, 17)
            _write_verbatim(w, right, 16)
        else:
            mid = (left + right) >> 1
            _write_verbatim(w, mid, 16)
            _write_verbatim(w, side, 17)

    data = _stream(_frame(sub, bs, ch_code=ch_code), chans=2, total=bs)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(y[:, 0], left)
    np.testing.assert_array_equal(y[:, 1], right)


def test_partitions_escape_and_5bit_rice():
    """FIXED order 1 with partition order 2 (4 partitions), one escaped
    partition (raw 7-bit residuals), via the 5-bit parameter method."""
    warm = [10]
    res = list(range(-6, 9)) + [40, -50, 33, 2, -2, 7, 1, 0, -1]  # 24 residuals? adjust
    bs = 16  # 4 partitions of 4; first has 3 residuals (order 1)
    res = [3, -2, 1, 7, -8, 2, 0, -1, 5, 60, -63, 12, 4, -4, 2]  # 15 = bs-1

    def sub(w):
        w.write(0, 1)
        w.write(8 + 1, 6)  # FIXED order 1
        w.write(0, 1)
        w.write(warm[0] & 0xFFFF, 16)
        # method 1 (5-bit), po=2 -> partitions of 4 samples (first: 3)
        w.write(1, 2)
        w.write(2, 4)
        parts = [res[0:3], res[3:7], res[7:11], res[11:15]]
        for i, pr in enumerate(parts):
            if i == 2:
                w.write(31, 5)  # escape
                w.write(7, 5)   # 7-bit raw
                for v in pr:
                    w.write(v & 0x7F, 7)
            else:
                k = 3
                w.write(k, 5)
                for v in pr:
                    z = 2 * v if v >= 0 else -2 * v - 1
                    w.write_unary(z >> k)
                    w.write(z & 7, 3)

    data = _stream(_frame(sub, bs, ch_code=0), total=bs)
    y, _ = decode_flac(data)
    exp = [warm[0]]
    for rv in res:
        exp.append(rv + exp[-1])
    np.testing.assert_array_equal(y, np.array(exp, dtype=np.int32))


def test_wasted_bits():
    """Subframe with 3 wasted bits: decoded samples are shifted back."""
    xs = [8, -16, 24, 0]  # all divisible by 8
    bs = len(xs)

    def sub(w):
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(1, 1)         # wasted-bits flag
        w.write_unary(2)      # unary 2 -> wasted = 3
        for v in xs:
            w.write((v >> 3) & 0x1FFF, 13)  # bps 16 - 3

    data = _stream(_frame(sub, bs, ch_code=0), total=bs)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(y, np.array(xs, dtype=np.int32))


def test_crc_corruption_raises():
    x = np.arange(-500, 500, dtype=np.int16)
    enc = bytearray(encode_flac(x, 8000))
    enc[-10] ^= 0xFF  # flip a byte inside the last frame
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(enc))
