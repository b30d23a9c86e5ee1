"""Pure-numpy media codecs: uncompressed 24-bit BMP, PCM16 WAV, and
8-bit RGB PNG (deflate + all five filter types).

The container ships no PIL/ffmpeg, but these formats are implementable
from their public specifications with ``struct``, ``zlib`` and numpy
alone — which upgrades the L5 decode step from a stub to a real
byte-level decode for the formats covered.  Baseline JPEG lives in
:mod:`operators.jpeg`; MP4 here covers both the container probe
(:func:`probe_mp4`) and REAL per-sample access: :func:`encode_mp4_mjpeg`
writes a spec-correct sample table (stsd/stts/stsc/stsz/stco) over an
``mdat`` of Motion-JPEG frames and :func:`decode_mp4_samples` walks it
back to the exact per-sample byte ranges — chained with the JPEG
decoder this is a complete video decode for MJPEG tracks.

Formats (public specs):
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  24 bpp BI_RGB, rows bottom-up, each row padded to 4 bytes, pixels
  stored B,G,R.
- WAV: RIFF container, ``fmt `` chunk (PCM, mono or interleaved) +
  ``data`` chunk of little-endian int16 samples.
- PNG (RFC 2083 / W3C spec): signature + chunk stream (IHDR/IDAT/
  IEND, CRC-32 verified), IDAT = zlib-deflated scanlines, each
  scanline prefixed by a filter byte 0-4 (None/Sub/Up/Average/Paeth).
  Supported image type: 8-bit/channel truecolor RGB (color type 2),
  non-interlaced — the compressed-format spirit of the reference's
  decode-at-the-edge step (processor_app.py:150-155) with the most
  common image container.
- GIF87a: logical screen descriptor + 256-entry grayscale color
  table + image descriptor + real LZW (variable-width codes packed
  LSB-first, dictionary growth to the 12-bit ceiling with CLEAR
  resets, the KwKwK special case), sub-block framing, trailer.

Everything is deterministic and allocation-bounded: decoders validate
headers and sizes before touching pixel/sample data and raise
``ValueError`` on malformed input (callers map that to quarantine
rows, never crashes).
"""

from __future__ import annotations

import struct
import zlib

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


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container (box parse only — sample decode is the
# stubbed step; ISO/IEC 14496-12 box grammar is public)
# ---------------------------------------------------------------------------


def encode_mp4_skeleton(duration_ms: int, timescale: int = 1000, n_tracks: int = 1) -> bytes:
    """Minimal valid ISO-BMFF structure: ftyp + moov(mvhd + trak(tkhd)
    per track) + a placeholder mdat.  Carries real container metadata
    (timescale, duration, track count) in spec-correct boxes; no
    samples — the codec layer (H.264 etc.) is out of scope."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    duration = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0, flags
        + struct.pack(">IIII", 0, 0, timescale, duration)  # ctime mtime ts dur
        + struct.pack(">iH2x", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 8  # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", n_tracks + 1),  # next_track_ID
    )
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd = box(
            b"tkhd",
            struct.pack(">B3B", 0, 0, 0, 7)  # version 0, flags=enabled|in-movie
            + struct.pack(">IIIII", 0, 0, tid, 0, duration)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", 640 << 16, 480 << 16),
        )
        traks += box(b"trak", tkhd)
    moov = box(b"moov", mvhd + traks)
    mdat = box(b"mdat", b"")
    return ftyp + moov + mdat


def probe_mp4(data: bytes) -> dict:
    """Parse the box tree and return container metadata:
    ``{major_brand, timescale, duration_ms, n_tracks}``.  Validates
    the box grammar (sizes, nesting) and raises ``ValueError`` on
    malformed input.  This is the real container-level half of video
    ingestion; per-sample decode stays stubbed (no ffmpeg)."""
    if len(data) < 16:
        raise ValueError("not an MP4 payload")

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, pos)
            btype = buf[pos + 4 : pos + 8]
            if size == 1 or size == 0:
                raise ValueError("64-bit/to-end box sizes unsupported")
            if size < 8 or pos + size > end:
                raise ValueError(f"bad box size {size} for {btype!r}")
            yield btype, pos + 8, pos + size
            pos += size
        if pos != end:
            raise ValueError("trailing bytes after last box")

    major = None
    timescale = duration = None
    n_tracks = 0
    top = list(walk(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("missing ftyp")
    for btype, s, e in top:
        if btype == b"ftyp":
            major = data[s : s + 4].decode("ascii", "replace")
        elif btype == b"moov":
            for ityp, is_, ie in walk(data, s, e):
                if ityp == b"mvhd":
                    version = data[is_]
                    if version != 0:
                        raise ValueError("mvhd version 1 unsupported")
                    _, _, timescale, duration = struct.unpack_from(">IIII", data, is_ + 4)
                elif ityp == b"trak":
                    n_tracks += 1
    if major is None or timescale in (None, 0):
        raise ValueError("missing moov/mvhd")
    return {
        "major_brand": major,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
    }


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + body)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    frame_duration_ms: int = 40,
    timescale: int = 1000,
) -> bytes:
    """Write a playable single-track Motion-JPEG MP4 (ISO 14496-12):
    ftyp + moov with a full sample table — stsd('mjpg'
    VisualSampleEntry), stts (constant delta), stsc (one chunk), stsz
    (real per-sample sizes), stco (real file offset into mdat) — over
    an mdat of the concatenated JPEG frame bytes.  The stco offset is
    computable in one pass because every box size is known before the
    mdat is placed (stco itself is fixed-width)."""
    if not frames:
        raise ValueError("MJPEG track needs at least one frame")
    n = len(frames)
    delta = frame_duration_ms * timescale // 1000
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")

    name = b"\x05mjpeg" + b"\x00" * 26  # 32-byte pascal compressorname
    sample_entry = _box(
        b"mjpg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count per sample
        + name
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", struct.pack(">II", 0, n) + b"".join(
        struct.pack(">I", len(f)) for f in frames
    ))
    # stco's 4-byte offset field is size-invariant: build the tree with
    # a placeholder, measure, then fill the real mdat payload offset.
    def build(chunk_offset: int) -> bytes:
        stco = _full(b"stco", struct.pack(">II", 1, chunk_offset))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        url = _full(b"url ", b"", flags=1)  # self-contained
        dref = _full(b"dref", struct.pack(">I", 1) + url)
        dinf = _box(b"dinf", dref)
        vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdhd = _full(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _full(
            b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"mjpeg\x00"
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full(
            b"tkhd",
            struct.pack(">IIIII", 0, 0, 1, 0, duration)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
            flags=7,
        )
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">iH2x", 0x00010000, 0x0100)
            + b"\x00" * 8
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        return ftyp + _box(b"moov", mvhd + trak)

    head_len = len(build(0))
    head = build(head_len + 8)  # mdat payload starts after its 8-byte header
    return head + _box(b"mdat", b"".join(frames))


def decode_mp4_samples(data: bytes) -> dict:
    """Walk the box tree back to the per-sample byte ranges: stsc maps
    chunks to sample runs, stco gives each chunk's file offset, stsz
    the consecutive sample sizes — the inverse of
    :func:`encode_mp4_mjpeg` but general over any single-trak
    stsc/stco layout.  Returns ``{"format": <stsd entry type>,
    "samples": [bytes, ...]}``; raises ``ValueError`` on malformed or
    out-of-bounds tables (callers map that to quarantine rows)."""

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", data, pos)
            btype = data[pos + 4 : pos + 8]
            if size in (0, 1) or size < 8 or pos + size > end:
                raise ValueError(f"bad box size {size} for {btype!r}")
            yield btype, pos + 8, pos + size
            pos += size
        if pos != end:
            raise ValueError("trailing bytes after last box")

    def find(start: int, end: int, btype: bytes) -> tuple[int, int]:
        for t, s, e in walk(start, end):
            if t == btype:
                return s, e
        raise ValueError(f"missing {btype!r} box")

    if len(data) < 16:
        raise ValueError("not an MP4 payload")
    moov = find(0, len(data), b"moov")
    trak = find(*moov, b"trak")
    stbl = find(*find(*find(*trak, b"mdia"), b"minf"), b"stbl")

    s, _ = find(*stbl, b"stsd")
    (n_entries,) = struct.unpack_from(">I", data, s + 4)
    if n_entries < 1:
        raise ValueError("empty stsd")
    fmt = data[s + 12 : s + 16].decode("ascii", "replace")

    s, e = find(*stbl, b"stsz")
    sample_size, n_samples = struct.unpack_from(">II", data, s + 4)
    if sample_size:
        sizes = [sample_size] * n_samples
    else:
        if s + 12 + 4 * n_samples > e:
            raise ValueError("stsz table truncated")
        sizes = list(struct.unpack_from(f">{n_samples}I", data, s + 12))

    s, e = find(*stbl, b"stco")
    (n_chunks,) = struct.unpack_from(">I", data, s + 4)
    if s + 8 + 4 * n_chunks > e:
        raise ValueError("stco table truncated")
    offsets = list(struct.unpack_from(f">{n_chunks}I", data, s + 8))

    s, e = find(*stbl, b"stsc")
    (n_runs,) = struct.unpack_from(">I", data, s + 4)
    if s + 8 + 12 * n_runs > e:
        raise ValueError("stsc table truncated")
    runs = [struct.unpack_from(">III", data, s + 8 + 12 * i) for i in range(n_runs)]
    if not runs or runs[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")

    # chunk index (1-based) -> samples_per_chunk, from the stsc runs
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        if first > last:
            raise ValueError("non-monotonic stsc runs")
        per_chunk.extend([spc] * (last - first + 1))

    samples: list[bytes] = []
    si = 0
    for ci, off in enumerate(offsets):
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            size = sizes[si]
            if off + size > len(data):
                raise ValueError("sample range out of bounds")
            samples.append(data[off : off + size])
            off += size
            si += 1
    if si != n_samples:
        raise ValueError(f"sample table inconsistent: mapped {si} of {n_samples}")
    return {"format": fmt, "samples": samples}


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, filters 0-4, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel (8-bit RGB)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec §6.6), vectorized over int16 inputs."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_row(ftype: int, raw: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Apply filter `ftype` to a raw scanline (encode direction).
    All five filters vectorize on encode because `left` comes from the
    RAW bytes, not the reconstruction."""
    left = np.concatenate([np.zeros(_BPP, np.uint8), raw[:-_BPP]])
    if ftype == 0:
        return raw
    if ftype == 1:
        return raw - left  # uint8 wraparound == mod-256 arithmetic
    if ftype == 2:
        return raw - prev
    if ftype == 3:
        avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
        return raw - avg.astype(np.uint8)
    if ftype == 4:
        up_left = np.concatenate([np.zeros(_BPP, np.uint8), prev[:-_BPP]])
        return raw - _paeth(left, prev, up_left)
    raise ValueError(f"bad PNG filter type {ftype}")


def _unfilter_row(ftype: int, filt: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Invert filter `ftype` (decode direction).  None/Up/Sub
    vectorize; Average/Paeth depend on the RECONSTRUCTED left pixel,
    so they run sequentially — in plain-int bytearray arithmetic,
    which benches ~8x faster than per-pixel numpy slicing (the
    decode-side hot loop for real corpora)."""
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return filt + prev
    if ftype == 1:
        # cumulative sum per channel stride, mod 256
        px = filt.reshape(-1, _BPP).astype(np.int64).cumsum(axis=0) % 256
        return px.astype(np.uint8).reshape(-1)
    if ftype not in (3, 4):
        raise ValueError(f"bad PNG filter type {ftype}")
    out = bytearray(filt.tobytes())
    up_row = prev.tobytes()
    n = len(out)
    if ftype == 3:
        for i in range(n):
            left = out[i - _BPP] if i >= _BPP else 0
            out[i] = (out[i] + ((left + up_row[i]) >> 1)) & 0xFF
    else:
        for i in range(n):
            left = out[i - _BPP] if i >= _BPP else 0
            up = up_row[i]
            ul = up_row[i - _BPP] if i >= _BPP else 0
            p = left + up - ul
            pa = p - left if p >= left else left - p
            pb = p - up if p >= up else up - p
            pc = p - ul if p >= ul else ul - p
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            out[i] = (out[i] + pred) & 0xFF
    return np.frombuffer(bytes(out), np.uint8)


def encode_png(pixels: np.ndarray, filters: int | list[int] | None = None) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG.

    ``filters``: scanline filter selection — None (all 0), a single
    type 0-4 for every row, or a per-row list.  Exercising non-zero
    types produces byte-different IDAT streams that must decode to
    identical pixels (the round-trip tests rely on this).
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w, _ = pixels.shape
    if isinstance(filters, int) or filters is None:
        filters = [filters or 0] * h
    if len(filters) != h:
        raise ValueError(f"need {h} filter types, got {len(filters)}")
    prev = np.zeros(w * _BPP, np.uint8)
    scanlines = bytearray()
    for y in range(h):
        raw = np.ascontiguousarray(pixels[y]).reshape(-1)
        ftype = int(filters[y])
        scanlines.append(ftype)
        scanlines.extend(_filter_row(ftype, raw, prev).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(scanlines), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit truecolor RGB PNG to an (H, W, 3) uint8 array.

    Validates the signature, per-chunk CRC-32, IHDR constraints
    (bit depth 8, color type 2, deflate, adaptive filtering,
    non-interlaced) and the decompressed scanline length before
    unfiltering.  Raises ``ValueError`` on anything malformed."""
    if len(data) < len(_PNG_SIG) + 12 or data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, seen_end = len(_PNG_SIG), None, bytearray(), False
    while pos + 12 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + clen)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + clen
    if ihdr is None or not idat or not seen_end:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, interlace={interlace})"
        )
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG deflate stream: {e}") from None
    stride = 1 + w * _BPP
    if len(raw) != h * stride:
        raise ValueError(f"bad scanline payload: {len(raw)} != {h * stride}")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride)
    out = np.zeros((h, w * _BPP), np.uint8)
    prev = np.zeros(w * _BPP, np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(arr[y, 0]), arr[y, 1:], prev)
        out[y] = prev
    return out.reshape(h, w, _BPP)


# ---------------------------------------------------------------------------
# GIF87a (8-bit indexed, real LZW — the third compression family next
# to PNG's deflate and JPEG's DCT+Huffman)
# ---------------------------------------------------------------------------

_GIF_MCS = 8  # LZW minimum code size for an 8-bit palette


def _lzw_encode(indices: bytes, mcs: int = _GIF_MCS) -> bytes:
    """GIF-flavor LZW: variable-width codes LSB-first, CLEAR resets the
    dictionary when it reaches 4096 entries (the 12-bit ceiling)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(1 << mcs)}
    next_code, width = eoi + 1, mcs + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code, width = eoi + 1, mcs + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, n_pixels: int, mcs: int = _GIF_MCS) -> bytes:
    """Inverse of :func:`_lzw_encode`, including the KwKwK case and
    mid-stream CLEAR resets; validates codes against the live table."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    width = mcs + 1
    prev: bytes | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} outside table of {len(table)}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_pixels:
            raise ValueError("LZW output exceeds pixel count")
    if len(out) != n_pixels:
        raise ValueError(f"LZW decoded {len(out)} of {n_pixels} pixels")
    return bytes(out)


def encode_gif_gray(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 array as a GIF87a with a 256-entry
    grayscale palette (pixel value == palette index == gray level)."""
    if pixels.ndim != 2 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (H, W) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 entries
    for i in range(256):
        out += bytes([i, i, i])  # grayscale palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(_GIF_MCS)
    lzw = _lzw_encode(pixels.tobytes())
    for off in range(0, len(lzw), 255):
        block = lzw[off : off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_gray(data: bytes) -> np.ndarray:
    """Decode a GIF87a/89a written by :func:`encode_gif_gray` back to
    the (H, W) uint8 gray array (validates the palette is grayscale so
    index == gray level)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    if not packed & 0x80:
        raise ValueError("missing global color table")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    palette = data[pos : pos + 3 * n_colors]
    if len(palette) < 3 * n_colors:
        raise ValueError("truncated color table")
    for i in range(n_colors):
        r, g, b = palette[3 * i : 3 * i + 3]
        if not (r == g == b == i):
            raise ValueError("non-grayscale palette unsupported here")
    pos += 3 * n_colors
    while pos < len(data) and data[pos] == 0x21:  # skip extensions
        pos += 2
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
    if pos >= len(data) or data[pos] != 0x2C:
        raise ValueError("missing image descriptor")
    left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
    if (left, top, iw, ih) != (0, 0, w, h) or ipacked & 0xC0:
        raise ValueError("sub-rect/local-table/interlaced GIF unsupported here")
    pos += 10
    mcs = data[pos]
    pos += 1
    if mcs != _GIF_MCS:
        raise ValueError(f"expected 8-bit LZW min code size, got {mcs}")
    lzw = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("missing block terminator")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        lzw += data[pos : pos + n]
        pos += n
    idx = _lzw_decode(bytes(lzw), w * h)
    return np.frombuffer(idx, dtype=np.uint8).reshape(h, w)


# ---------------------------------------------------------------------------
# G.711 mu-law (8-bit companded PCM — REAL compressed audio, the
# logarithmic companding standard of telephony; stateless per-sample,
# so unlike ADPCM its decode is exactly expressible in SQL)
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def ulaw_encode(samples: np.ndarray) -> bytes:
    """Compand int16 PCM to 8-bit mu-law (G.711, 16-bit convention):
    clip, add the 0x84 bias, segment = position of the top set bit
    above bit 7, 4-bit mantissa, ones-complement codeword."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(f"expected 1-D int16 samples, got {samples.dtype}")
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    seg = (np.floor(np.log2(mag)) - 7).astype(np.int32)  # mag >= 132 > 2^7
    mant = (mag >> (seg + 3)) & 0x0F
    return ((~(sign | (seg << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()


def ulaw_decode(data: bytes) -> np.ndarray:
    """Expand 8-bit mu-law back to int16 PCM — the exact G.711
    inverse of :func:`ulaw_encode`:
    ``mag = ((mant << 3 | 0x84) << seg) - 0x84`` — pure integer
    arithmetic, so a SQL oracle can recompute it from the codeword."""
    c = ~np.frombuffer(data, dtype=np.uint8).astype(np.int32) & 0xFF
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) | 0x84) << seg) - _ULAW_BIAS
    return np.where(c & 0x80, -mag, mag).astype(np.int16)


def encode_wav_ulaw(samples: np.ndarray, sample_rate: int) -> bytes:
    """Wrap mu-law-companded samples in a WAV container (format code
    7, 8 bits per sample, block align 1 — the telephony WAV layout)."""
    payload = ulaw_encode(samples)
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    chunks = b"".join(
        [b"fmt ", struct.pack("<I", len(fmt)), fmt,
         b"data", struct.pack("<I", len(payload)), payload]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_ulaw(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a format-7 WAV and expand its mu-law payload to int16."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt_info, payload = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt_info = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + clen + (clen & 1)
    if fmt_info is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt_info
    if audio_format != 7 or bits != 8 or n_channels != 1:
        raise ValueError(f"not mono 8-bit mu-law (format={audio_format}, bits={bits})")
    return ulaw_decode(payload), sample_rate


def encode_gif_anim(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """Encode (H, W) uint8 frames as an animated GIF89a: one graphics
    control extension (delay, no disposal) + full-frame image block
    per frame, all sharing the global grayscale palette."""
    if not frames:
        raise ValueError("animated GIF needs at least one frame")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes([i, i, i])
    for px in frames:
        if px.shape != (h, w) or px.dtype != np.uint8:
            raise ValueError("all frames must be (H, W) uint8 of equal size")
        out += struct.pack("<BBBHBB", 0x21, 0xF9, 4, delay_cs, 0, 0)  # GCE
        out.append(0)  # GCE block terminator
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(_GIF_MCS)
        lzw = _lzw_encode(px.tobytes())
        for off in range(0, len(lzw), 255):
            block = lzw[off : off + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_anim(data: bytes) -> list[np.ndarray]:
    """Decode every full-frame image block of a GIF87a/89a (grayscale
    palette; extensions skipped, sub-rect frames rejected) — the
    multi-frame inverse of :func:`encode_gif_anim`; a single-frame GIF
    yields a one-element list."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    if not packed & 0x80:
        raise ValueError("missing global color table")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    palette = data[pos : pos + 3 * n_colors]
    if len(palette) < 3 * n_colors:
        raise ValueError("truncated color table")
    for i in range(n_colors):
        r, g, b = palette[3 * i : 3 * i + 3]
        if not (r == g == b == i):
            raise ValueError("non-grayscale palette unsupported here")
    pos += 3 * n_colors
    frames: list[np.ndarray] = []
    while pos < len(data):
        marker = data[pos]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        if (left, top, iw, ih) != (0, 0, w, h) or ipacked & 0xC0:
            raise ValueError("sub-rect/local-table/interlaced GIF unsupported here")
        pos += 10
        mcs = data[pos]
        pos += 1
        if mcs != _GIF_MCS:
            raise ValueError(f"expected 8-bit LZW min code size, got {mcs}")
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("missing block terminator")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            lzw += data[pos : pos + n]
            pos += n
        idx = _lzw_decode(bytes(lzw), w * h)
        frames.append(np.frombuffer(idx, dtype=np.uint8).reshape(h, w))
    if not frames:
        raise ValueError("no image blocks in GIF")
    return frames
