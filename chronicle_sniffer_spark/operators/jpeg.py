"""Pure-numpy baseline JPEG codec (ITU-T T.81): grayscale, 4:4:4 AND
4:2:0 YCbCr color.

The third REAL compressed-format codec next to PNG (deflate) and the
uncompressed BMP/WAV in :mod:`operators.codecs`: a complete baseline
DCT JPEG encoder/decoder for one- or three-component images with
dimensions that are multiples of 8, using the standard Annex-K
luminance AND chrominance quantization/Huffman tables.  Implements the
full entropy pipeline from the public spec — level shift, 8×8 forward/
inverse DCT, zigzag, quantization, per-component DC-difference + AC
run-length Huffman coding with interleaved MCUs, byte stuffing
(0xFF → 0xFF 0x00), and JFIF segment framing (SOI/DQT/SOF0/DHT/SOS/
EOI).

Exactness properties the oracle paths exploit: a FLAT 8×8 block has
DC = 8·(v−128) and all-zero AC, so the value reconstructs bit-exactly
whenever 8·(v−128) is a multiple of the table's Q00 — (v−128) even
for luma (Q00 = 16) and (v−128) ≡ 0 (mod 17) for chroma (Q00 = 17).
Solid images built on those lattices round-trip losslessly, giving
closed-form decoded statistics DuckDB can recompute (catalog
`l5_jpeg_decode`, `l5_jpeg_color_decode`).  The color decoder returns
the YCbCr planes directly (exact); :func:`ycbcr_to_rgb` is the
separate, inherently-rounding display conversion.  General images are
lossy, as JPEG is; the tests bound reconstruction error instead.

Chroma subsampling (4:2:0) is implemented by
:func:`encode_jpeg_ycbcr420` / :func:`decode_jpeg_ycbcr420` (oracle
`l5_jpeg420_decode`): chroma is averaged over 2×2 blocks before the
DCT, so solid images on the chroma lattice stay exact.  MP4 *sample*
decode lives in :mod:`operators.multimodal` on top of this codec.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table (natural order).
QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.3.1: DC luminance Huffman spec (BITS, HUFFVAL).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3.2: AC luminance Huffman spec.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

# Annex K.2 chrominance quantization table (natural order).
QTABLE_C = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.3.3: DC chrominance Huffman spec.
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
# Annex K.3.4: AC chrominance Huffman spec.
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
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
]

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
# Odd diagonals run top-right -> bottom-left (increasing row), even
# diagonals bottom-left -> top-right (increasing col), per T.81 fig. 5.
_ZZ = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 C.2 canonical code generation."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _huff_codes(DC_BITS, DC_VALS)
_AC_ENC = _huff_codes(AC_BITS, AC_VALS)


def _dct_matrix() -> np.ndarray:
    n = 8
    m = np.zeros((n, n))
    for u in range(n):
        cu = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(n):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    """T.81 F.1.2.1: negative amplitudes are stored as v - 1 (i.e.
    one's-complement within `size` bits)."""
    return v if v >= 0 else v + (1 << size) - 1


_DC_ENC_C = _huff_codes(DC_BITS_C, DC_VALS_C)
_AC_ENC_C = _huff_codes(AC_BITS_C, AC_VALS_C)


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qtable: np.ndarray, dc_enc: dict, ac_enc: dict, prev_dc: int
) -> int:
    """Entropy-encode one level-shifted 8×8 block; returns its DC."""
    coeff = _DCT @ block @ _DCT.T
    q = np.round(coeff / qtable).astype(np.int64)
    zz = [int(q[r, c]) for r, c in _ZZ]
    diff = zz[0] - prev_dc
    size = _category(diff)
    code, length = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude_bits(diff, size), size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_enc[(run << 4) | size]
        bw.write(c, ln)
        bw.write(_amplitude_bits(v, size), size)
        run = 0
    if last_nz < 63:
        c, ln = ac_enc[0x00]  # EOB
        bw.write(c, ln)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 grayscale array (H, W multiples of 8)
    as a baseline JFIF JPEG."""
    if pixels.ndim != 2 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape
    if h % 8 or w % 8 or h == 0 or w == 0:
        raise ValueError(f"dimensions must be non-zero multiples of 8, got {h}x{w}")

    bw = _BitWriter()
    prev_dc = 0
    shifted = pixels.astype(np.float64) - 128.0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            prev_dc = _encode_block(
                bw, shifted[by : by + 8, bx : bx + 8], QTABLE, _DC_ENC, _AC_ENC, prev_dc
            )
    scan = bw.flush()

    qz = bytes(QTABLE[r, c] for r, c in _ZZ)
    dqt = _seg(0xFFDB, b"\x00" + qz)
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)) + _seg(
        0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos = _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def encode_jpeg_ycbcr444(planes: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 YCbCr array (no subsampling; H, W
    multiples of 8) as a baseline JFIF JPEG: Y uses the luminance
    quant/Huffman tables, Cb/Cr the chrominance ones, blocks
    interleaved Y,Cb,Cr per MCU with per-component DC predictors."""
    if planes.ndim != 3 or planes.shape[2] != 3 or planes.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8 YCbCr, got {planes.shape} {planes.dtype}")
    h, w, _ = planes.shape
    if h % 8 or w % 8 or h == 0 or w == 0:
        raise ValueError(f"dimensions must be non-zero multiples of 8, got {h}x{w}")

    bw = _BitWriter()
    prev = [0, 0, 0]
    shifted = planes.astype(np.float64) - 128.0
    tabs = [(QTABLE, _DC_ENC, _AC_ENC), (QTABLE_C, _DC_ENC_C, _AC_ENC_C),
            (QTABLE_C, _DC_ENC_C, _AC_ENC_C)]
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            for ci in range(3):
                qt, dc_enc, ac_enc = tabs[ci]
                prev[ci] = _encode_block(
                    bw, shifted[by : by + 8, bx : bx + 8, ci], qt, dc_enc, ac_enc, prev[ci]
                )
    scan = bw.flush()

    dqt = _seg(0xFFDB, b"\x00" + bytes(QTABLE[r, c] for r, c in _ZZ)) + _seg(
        0xFFDB, b"\x01" + bytes(QTABLE_C[r, c] for r, c in _ZZ)
    )
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0])  # Y: no subsampling, quant table 0
        + bytes([2, 0x11, 1])  # Cb: quant table 1
        + bytes([3, 0x11, 1]),  # Cr: quant table 1
    )
    dht = (
        _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
        + _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    )
    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside entropy stream")
            self.pos += 1  # skip stuffed 0x00
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(reader: _BitReader, dct: dict, act: dict, qt: np.ndarray, prev_dc: int):
    """Entropy-decode one block; returns (pixel block, new prev_dc)."""
    zz = [0] * 64
    size = _decode_huff(reader, dct)
    diff = _extend(reader.read_bits(size), size) if size else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = _decode_huff(reader, act)
        if rs == 0x00:  # EOB
            break
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("bad AC run/size")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC index overflow")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    coeff = np.zeros((8, 8))
    for kk, (r, c) in enumerate(_ZZ):
        coeff[r, c] = zz[kk]
    block = _DCT.T @ (coeff * qt) @ _DCT
    return np.clip(np.round(block) + 128, 0, 255).astype(np.uint8), prev_dc


def _decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG (1-component grayscale or 3-component
    4:4:4 color) to an (H, W, C) uint8 array of the raw component
    planes (YCbCr for color - no display conversion)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = -1
    comp_quant: dict[int, int] = {}  # component id -> quant table id
    scan_comps: list[tuple[int, int, int]] = []  # (comp_id, dc_tbl, ac_tbl)
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(_ZZ):
                    tbl[r, c] = body[off + 1 + k]
                qtables[tq] = tbl
                off += 65
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8 or ncomp not in (1, 3):
                raise ValueError(f"unsupported SOF0 (precision={precision}, ncomp={ncomp})")
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci], body[7 + 3 * ci], body[8 + 3 * ci]
                if hv != 0x11:
                    raise ValueError("chroma subsampling unsupported (4:4:4 only)")
                comp_quant[cid] = tq
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decoder(bits, vals)
                off += 17 + nv
        elif marker == 0xFFDA:
            ns = body[0]
            if ns != len(comp_quant) or ns not in (1, 3):
                raise ValueError("scan/frame component mismatch")
            for si in range(ns):
                cid = body[1 + 2 * si]
                tt = body[2 + 2 * si]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if scan_start is None or h <= 0 or w <= 0:
        raise ValueError("missing SOF/SOS")
    if h % 8 or w % 8:
        raise ValueError(f"dimensions must be multiples of 8, got {h}x{w}")
    tabs = []
    for cid, tdc, tac in scan_comps:
        if cid not in comp_quant or comp_quant[cid] not in qtables:
            raise ValueError("missing quant table for scan component")
        if tdc not in dc_tables or tac not in ac_tables:
            raise ValueError("missing Huffman table for scan component")
        tabs.append(
            (dc_tables[tdc], ac_tables[tac], qtables[comp_quant[cid]].astype(np.float64))
        )

    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    reader = _BitReader(data[scan_start:end])
    ncomp = len(tabs)
    out = np.zeros((h, w, ncomp), dtype=np.uint8)
    prev = [0] * ncomp
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            for ci, (dct, act, qt) in enumerate(tabs):
                block, prev[ci] = _decode_block(reader, dct, act, qt, prev[ci])
                out[by : by + 8, bx : bx + 8, ci] = block
    return out


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to an (H, W) uint8 array."""
    out = _decode_jpeg(data)
    if out.shape[2] != 1:
        raise ValueError(f"expected 1 component, got {out.shape[2]}")
    return out[:, :, 0]


def decode_jpeg_ycbcr444(data: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 color JPEG to its (H, W, 3) uint8 YCbCr
    planes - exact, no display conversion (see :func:`ycbcr_to_rgb`)."""
    out = _decode_jpeg(data)
    if out.shape[2] != 3:
        raise ValueError(f"expected 3 components, got {out.shape[2]}")
    return out


def ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    """JFIF YCbCr -> RGB display conversion (inherently rounding; kept
    separate so the decode itself stays exact)."""
    y = planes[:, :, 0].astype(np.float64)
    cb = planes[:, :, 1].astype(np.float64) - 128.0
    cr = planes[:, :, 2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_jpeg_ycbcr420(planes: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 YCbCr array (H, W multiples of 16) as
    a baseline 4:2:0 JPEG: each 16×16 MCU carries four Y blocks and
    one 2×2-mean-downsampled block each of Cb and Cr (Y sampling 2×2,
    chroma 1×1), with per-component DC predictors."""
    if planes.ndim != 3 or planes.shape[2] != 3 or planes.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8 YCbCr, got {planes.shape} {planes.dtype}")
    h, w, _ = planes.shape
    if h % 16 or w % 16 or h == 0 or w == 0:
        raise ValueError(f"dimensions must be non-zero multiples of 16, got {h}x{w}")

    yf = planes[:, :, 0].astype(np.float64) - 128.0
    # 2x2 mean downsample, rounded to the uint8 grid first (what a real
    # subsampler emits), then level-shifted
    sub = planes.astype(np.float64).reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
    sub = np.clip(np.round(sub), 0, 255)
    cbf = sub[:, :, 1] - 128.0
    crf = sub[:, :, 2] - 128.0

    bw = _BitWriter()
    prev = [0, 0, 0]
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            for dy in (0, 8):
                for dx in (0, 8):
                    prev[0] = _encode_block(
                        bw, yf[my + dy : my + dy + 8, mx + dx : mx + dx + 8],
                        QTABLE, _DC_ENC, _AC_ENC, prev[0],
                    )
            cy, cx = my // 2, mx // 2
            prev[1] = _encode_block(
                bw, cbf[cy : cy + 8, cx : cx + 8], QTABLE_C, _DC_ENC_C, _AC_ENC_C, prev[1]
            )
            prev[2] = _encode_block(
                bw, crf[cy : cy + 8, cx : cx + 8], QTABLE_C, _DC_ENC_C, _AC_ENC_C, prev[2]
            )
    scan = bw.flush()

    dqt = _seg(0xFFDB, b"\x00" + bytes(QTABLE[r, c] for r, c in _ZZ)) + _seg(
        0xFFDB, b"\x01" + bytes(QTABLE_C[r, c] for r, c in _ZZ)
    )
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    dht = (
        _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
        + _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    )
    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def decode_jpeg_ycbcr420(data: bytes) -> np.ndarray:
    """Decode a baseline 4:2:0 JPEG (Y 2×2, chroma 1×1 — the shape
    this codec emits and the most common JPEG in the wild) to
    (H, W, 3) uint8 YCbCr planes, chroma upsampled by replication
    (exact for flat chroma, the closed-form-oracle regime)."""
    # reuse the segment parser by re-walking headers here with 4:2:0
    # sampling accepted; scan layout differs from 4:4:4 so the MCU
    # loop is dedicated
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    h = w = -1
    comp_quant: dict[int, int] = {}
    samplings: dict[int, int] = {}
    scan_comps: list[tuple[int, int, int]] = []
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(_ZZ):
                    tbl[r, c] = body[off + 1 + k]
                qtables[tq] = tbl
                off += 65
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8 or ncomp != 3:
                raise ValueError(f"unsupported SOF0 for 4:2:0 (ncomp={ncomp})")
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci], body[7 + 3 * ci], body[8 + 3 * ci]
                comp_quant[cid] = tq
                samplings[cid] = hv
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_decoder(bits, vals)
                off += 17 + nv
        elif marker == 0xFFDA:
            if body[0] != 3:
                raise ValueError("expected 3-component scan")
            for si in range(3):
                cid = body[1 + 2 * si]
                tt = body[2 + 2 * si]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if scan_start is None or h <= 0 or w <= 0:
        raise ValueError("missing SOF/SOS")
    if h % 16 or w % 16:
        raise ValueError(f"dimensions must be multiples of 16, got {h}x{w}")
    ids = [cid for cid, _, _ in scan_comps]
    if samplings.get(ids[0]) != 0x22 or any(samplings.get(c) != 0x11 for c in ids[1:]):
        raise ValueError("only 4:2:0 (Y 2x2, chroma 1x1) supported here")
    tabs = []
    for cid, tdc, tac in scan_comps:
        if cid not in comp_quant or comp_quant[cid] not in qtables:
            raise ValueError("missing quant table for scan component")
        if tdc not in dc_tables or tac not in ac_tables:
            raise ValueError("missing Huffman table for scan component")
        tabs.append(
            (dc_tables[tdc], ac_tables[tac], qtables[comp_quant[cid]].astype(np.float64))
        )
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    reader = _BitReader(data[scan_start:end])
    out = np.zeros((h, w, 3), dtype=np.uint8)
    prev = [0, 0, 0]
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            for dy in (0, 8):
                for dx in (0, 8):
                    block, prev[0] = _decode_block(reader, *tabs[0], prev[0])
                    out[my + dy : my + dy + 8, mx + dx : mx + dx + 8, 0] = block
            for ci in (1, 2):
                block, prev[ci] = _decode_block(reader, *tabs[ci], prev[ci])
                up = np.repeat(np.repeat(block, 2, axis=0), 2, axis=1)
                out[my : my + 16, mx : mx + 16, ci] = up
    return out
