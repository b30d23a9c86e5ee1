"""Pure-numpy media codecs: uncompressed 24-bit BMP and PCM16 WAV.

The container ships no PIL/ffmpeg, but these two formats are simple
enough to implement from their public specifications with ``struct``
and numpy alone — which upgrades the L5 decode step from a stub to a
real byte-level decode for the formats it covers.  Compressed formats
(PNG/JPEG/MP4) remain behind the strict-mode ``NotImplementedError``
in :mod:`operators.multimodal`.

Formats (public specs):
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  24 bpp BI_RGB, rows bottom-up, each row padded to 4 bytes, pixels
  stored B,G,R.
- WAV: RIFF container, ``fmt `` chunk (PCM, mono or interleaved) +
  ``data`` chunk of little-endian int16 samples.

Everything is deterministic and allocation-bounded: decoders validate
headers and sizes before touching pixel/sample data and raise
``ValueError`` on malformed input (callers map that to quarantine
rows, never crashes).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    # rows bottom-up, channels BGR, rows padded to 4-byte multiples
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 RGB array."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    header_size, w, h, planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if header_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_size = (w * 3 + 3) & ~3
    need = pixel_offset + row_size * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} < {need}")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=pixel_offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# WAV (PCM16 little-endian)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (1-D mono or (N, C) interleaved) as PCM WAV."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    if samples.ndim == 1:
        n_channels = 1
    elif samples.ndim == 2:
        n_channels = samples.shape[1]
    else:
        raise ValueError("samples must be 1-D or (N, channels)")
    payload = samples.astype("<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = b"".join(
        [
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(payload)),
            payload,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV to ((N,) or (N, C) int16 samples, sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt_info, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt_info = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_info is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt_info
    if audio_format != 1 or bits != 16 or n_channels < 1:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(pcm[: len(pcm) - (len(pcm) % (2 * n_channels))], dtype="<i2")
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels)
    return samples.copy(), sample_rate
