"""Pure-stdlib baseline JPEG codec (numpy DCT + Huffman).

Like png.py and wav.py, this needs no external library: baseline JFIF
is public (ITU-T T.81 / ISO 10918-1): 8×8 block DCT, Annex-K
quantization and Huffman tables, byte-stuffed entropy stream. This
module implements:

- ``encode_jpeg``: gray or RGB uint8 → baseline JFIF bytes (4:4:4, no
  subsampling, standard tables scaled by ``quality``);
- ``decode_jpeg``: baseline JFIF bytes → (h, w, ch) uint8. Supports
  sequential baseline (SOF0), gray/3-component, any sampling factors
  (1×1, 2×1, 1×2, 2×2 — chroma upsampled by pixel replication),
  restart markers.

JPEG is lossy: roundtrips are asserted within quantization tolerance,
not bit-exact (unlike PNG/WAV).

Scale note: kernels run per-image inside Arrow-batched ``mapInPandas``
workers. DCT/quantization are numpy-vectorized over all blocks at
once; the entropy coder is a Python bit loop — throughput is
entropy-bound, fine for feature-extraction pipelines, not for
video-rate decode.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "JpegError"]


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


# -- Annex K quantization tables (luminance, chrominance) ------------------

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# zigzag scan order: _ZIGZAG[i] = flat (row*8+col) index of the i-th
# coefficient in scan order
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# -- Annex K typical Huffman tables: (bits, values) ------------------------
# bits[i] = number of codes of length i+1; values in code order.

_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: D @ block @ D.T = 2-D DCT
_DCT = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)) * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _huff_encode_table(bits, values):
    """(bits, values) → {symbol: (code, length)} per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, values):
    """(bits, values) → {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg convention, public)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    t = np.floor((q * s + 50) / 100)
    return np.clip(t, 1, 255)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """v → (size, amplitude bits) per T.81 F.1.2.1 (ones-complement for
    negatives)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    m = img.astype(np.float64)
    r, g, b = m[:, :, 0], m[:, :, 1], m[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[:, :, 0], ycc[:, :, 1] - 128.0, ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate pad to multiples of 8, return (blocks, bh, bw)
    where blocks is (bh*bw, 8, 8) in raster order."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """(h, w[, 1|3]) uint8 → baseline JFIF bytes (4:4:4, Annex-K
    tables scaled by ``quality``)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise JpegError("image must be uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise JpegError("image must be (h, w), (h, w, 1) or (h, w, 3)")
    h, w, ncomp = img.shape
    if h == 0 or w == 0:
        raise JpegError("empty image")

    qt_l = _quality_scale(_Q_LUMA, quality)
    qt_c = _quality_scale(_Q_CHROMA, quality)
    planes = (
        [img[:, :, 0].astype(np.float64)]
        if ncomp == 1
        else [p for p in np.moveaxis(_rgb_to_ycbcr(img), 2, 0)]
    )
    qts = [qt_l] + ([qt_c, qt_c] if ncomp == 3 else [])

    # DCT + quantize, all blocks at once per component
    comp_coeffs = []
    for plane, qt in zip(planes, qts):
        blocks, _, _ = _blockify(plane)
        shifted = blocks - 128.0
        coef = np.einsum("ij,njk,lk->nil", _DCT, shifted, _DCT)
        quant = np.round(coef / qt).astype(np.int32)
        comp_coeffs.append(quant.reshape(-1, 64)[:, _ZIGZAG])

    dc_tabs = [_huff_encode_table(*_HUFF_DC_LUMA), _huff_encode_table(*_HUFF_DC_CHROMA)]
    ac_tabs = [_huff_encode_table(*_HUFF_AC_LUMA), _huff_encode_table(*_HUFF_AC_CHROMA)]

    bw_ = _BitWriter()
    pred = [0] * ncomp
    n_blocks = comp_coeffs[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(ncomp):
            tsel = 0 if ci == 0 else 1
            zz = comp_coeffs[ci][bi]
            dc_tab, ac_tab = dc_tabs[tsel], ac_tabs[tsel]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_tab[size]
            bw_.write(code, length)
            if size:
                bw_.write(bits, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL
                    bw_.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_tab[(run << 4) | size]
                bw_.write(code, length)
                bw_.write(bits, size)
                run = 0
            if last_nz < 63:
                code, length = ac_tab[0x00]  # EOB
                bw_.write(code, length)
    scan = bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT: table 0 (luma) and, for color, table 1 (chroma), zigzag order
    out += seg(0xFFDB, bytes([0]) + bytes(qt_l.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        out += seg(0xFFDB, bytes([1]) + bytes(qt_c.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    # SOF0: 8-bit precision, 4:4:4 (all sampling factors 1×1)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    # DHT segments
    for cls, tid, (bits_, vals) in (
        (0, 0, _HUFF_DC_LUMA),
        (1, 0, _HUFF_AC_LUMA),
        (0, 1, _HUFF_DC_CHROMA),
        (1, 1, _HUFF_AC_CHROMA),
    ):
        if ncomp == 1 and tid == 1:
            continue
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits_) + bytes(vals))
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise JpegError("truncated entropy stream")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:  # stuffed byte
                    self.pos += 2
                else:
                    # a real marker: pad with 1s (only consumed past EOB)
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and skip to just past the next marker
        (used for RSTn)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("expected restart marker")

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, ch) uint8 (ch = 1 or 3).

    Sequential baseline (SOF0) only; sampling factors up to 2×2
    (chroma upsampled by replication); restart markers honored."""
    data = bytes(data or b"")
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT
            b = body
            while b:
                if len(b) < 65:
                    raise JpegError("truncated DQT")
                prec_id = b[0]
                if prec_id >> 4:
                    raise JpegError("16-bit quant tables unsupported")
                tid = prec_id & 0xF
                tab = np.zeros(64, dtype=np.float64)
                tab[_ZIGZAG] = np.frombuffer(b[1:65], dtype=np.uint8)
                qts[tid] = tab.reshape(8, 8)
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                if len(b) < 17:
                    raise JpegError("truncated DHT")
                cls_id = b[0]
                bits_ = list(b[1:17])
                cnt = sum(bits_)
                if len(b) < 17 + cnt:
                    raise JpegError("truncated DHT")
                vals = list(b[17 : 17 + cnt])
                huff[(cls_id >> 4, cls_id & 0xF)] = _huff_decode_table(bits_, vals)
                b = b[17 + cnt :]
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise JpegError("truncated SOF")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            if len(body) < 6 + 3 * ncomp:
                raise JpegError("truncated SOF")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise JpegError("SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise JpegError("truncated SOS")
            ns = body[0]
            scomps = []
            for ci in range(ns):
                cid, tabs = body[1 + ci * 2 : 3 + ci * 2]
                scomps.append({"id": cid, "td": tabs >> 4, "ta": tabs & 0xF})
            return _decode_scan(
                data, pos + 2 + seglen, sof, scomps, qts, huff, restart_interval
            )
        pos += 2 + seglen
    raise JpegError("missing SOS scan")


def _decode_scan(data, pos, sof, scomps, qts, huff, restart_interval):
    h, w, comps = sof
    by_id = {c["id"]: c for c in comps}
    for sc in scomps:
        if sc["id"] not in by_id:
            raise JpegError(f"SOS references undefined component id {sc['id']}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise JpegError("sampling factors beyond 2x2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient planes in units of 8×8 blocks
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    rd = _BitReader(data, pos)
    pred = {sc["id"]: 0 for sc in scomps}
    idct = _DCT.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.align_to_marker()
                pred = {sc["id"]: 0 for sc in scomps}
            for sc in scomps:
                c = by_id[sc["id"]]
                dc_tab = huff.get((0, sc["td"]))
                ac_tab = huff.get((1, sc["ta"]))
                qt = qts.get(c["tq"])
                if dc_tab is None or ac_tab is None or qt is None:
                    raise JpegError("missing table for scan component")
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = rd.decode_symbol(dc_tab)
                        diff = _extend(rd.read_bits(size), size)
                        pred[sc["id"]] += diff
                        zz[0] = pred[sc["id"]]
                        k = 1
                        while k < 64:
                            sym = rd.decode_symbol(ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise JpegError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise JpegError("AC run overflow")
                            zz[k] = _extend(rd.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz
                        coef = block.reshape(8, 8) * qt
                        pix = idct @ coef @ _DCT + 128.0
                        y0 = (my * c["v"] + byy) * 8
                        x0 = (mx * c["h"] + bxx) * 8
                        planes[sc["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        # upsample subsampled components by replication to full res
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)[:, :, None]
    if len(out_planes) == 3:
        return _ycbcr_to_rgb(np.stack(out_planes, axis=2))
    raise JpegError(f"unsupported component count {len(out_planes)}")
