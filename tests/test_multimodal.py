"""Multimodal plumbing (L5): schema integrity, deterministic stubs,
frame sampling, strict-mode codec gate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from chronicle_sniffer_spark.operators.multimodal import (
    decode_image,
    extract_features,
    payload_integrity,
    sample_frames,
    synthesize_media,
)
from chronicle_sniffer_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 30)
    return synthesize_media(docs).cache()


def test_payload_integrity_roundtrip(spark, media):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 30)
    expected = {r.doc_id: hashlib.md5(r.text.encode()).hexdigest() for r in docs.collect()}
    got = {r.media_id: r.payload_md5 for r in payload_integrity(media).collect()}
    assert got == expected


def test_decode_image_stub_schema_and_determinism(media):
    out = decode_image(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,width:int,height:int,mode:string,pixel_hash:string>"
    )
    rows = {r.media_id: r for r in out.collect()}
    assert rows and all(mid % 3 == 0 for mid in rows)  # image rows only
    again = {r.media_id: r for r in decode_image(media).collect()}
    assert rows == again


def test_decode_image_strict_rejects_unknown_format(media):
    # the fake-media corpus carries raw text bytes — no magic matches,
    # so the strict path raises the quarantine-contract ValueError
    with pytest.raises(Exception, match="no codec for image payload"):
        decode_image(media, strict=True).collect()


def test_decode_image_strict_decodes_real_bytes(spark):
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import encode_bmp, encode_png
    from chronicle_sniffer_spark.operators.jpeg import encode_jpeg_gray

    rgb = np.arange(16 * 8 * 3, dtype=np.uint8).reshape(16, 8, 3)
    gray = np.full((8, 16), 100, dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_png(rgb)), None),
        (2, "image", bytearray(encode_bmp(rgb)), None),
        (3, "image", bytearray(encode_jpeg_gray(gray)), None),
    ]
    from chronicle_sniffer_spark.operators.multimodal import MEDIA_DDL

    media = spark.createDataFrame(rows, MEDIA_DDL)
    got = {r.media_id: r for r in decode_image(media, strict=True).collect()}
    assert (got[1].width, got[1].height, got[1].mode) == (8, 16, "RGB")
    assert (got[2].width, got[2].height, got[2].mode) == (8, 16, "RGB")
    assert (got[3].width, got[3].height, got[3].mode) == (16, 8, "L")
    # PNG and BMP round-trip the same pixels -> identical decoded hash
    assert got[1].pixel_hash == got[2].pixel_hash
    assert got[3].pixel_hash == hashlib.md5(gray.tobytes()).hexdigest()


def test_mp4_mjpeg_sample_table_roundtrip():
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import (
        decode_mp4_samples,
        encode_mp4_mjpeg,
        probe_mp4,
    )
    from chronicle_sniffer_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    frames = [
        encode_jpeg_gray(np.full((16, 24), 2 * ((7 * i + 3) % 128), dtype=np.uint8))
        for i in range(5)
    ]
    mp4 = encode_mp4_mjpeg(frames, 24, 16, frame_duration_ms=40)
    # container metadata is spec-correct for the existing probe
    info = probe_mp4(mp4)
    assert (info["major_brand"], info["n_tracks"], info["duration_ms"]) == ("isom", 1, 200)
    # sample extraction is byte-exact and ordered
    parsed = decode_mp4_samples(mp4)
    assert parsed["format"] == "mjpg"
    assert parsed["samples"] == frames
    for i, s in enumerate(parsed["samples"]):
        px = decode_jpeg_gray(s)
        assert px.shape == (16, 24)
        assert (px == 2 * ((7 * i + 3) % 128)).all()


def test_mp4_mjpeg_malformed_rejected():
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_mp4_samples, encode_mp4_mjpeg
    from chronicle_sniffer_spark.operators.jpeg import encode_jpeg_gray

    mp4 = encode_mp4_mjpeg(
        [encode_jpeg_gray(np.full((8, 8), 50, dtype=np.uint8))], 8, 8
    )
    with pytest.raises(ValueError):
        decode_mp4_samples(mp4[:40])  # truncated mid-tree
    with pytest.raises(ValueError):
        decode_mp4_samples(mp4.replace(b"stco", b"stcq"))  # missing offsets
    with pytest.raises(ValueError):
        decode_mp4_samples(b"junkjunkjunkjunkjunk")
    with pytest.raises(ValueError):
        encode_mp4_mjpeg([], 8, 8)  # empty track


def test_extract_features_shape(media):
    out = extract_features(media, dim=16).collect()
    assert len(out) == media.count()  # every kind gets a vector
    assert all(len(r.feature) == 16 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r.feature)
    # deterministic: same payload → same vector
    by_id = {r.media_id: list(r.feature) for r in out}
    again = {r.media_id: list(r.feature) for r in extract_features(media, dim=16).collect()}
    assert by_id == again


def test_sample_frames_counts(media):
    frames = sample_frames(media, every_ms=200)
    pdf = frames.toPandas()
    assert set(pdf["media_id"] % 3) == {2}  # video rows only
    meta = {r.media_id: r.meta for r in media.filter(F.col("kind") == "video").collect()}
    for mid, grp in pdf.groupby("media_id"):
        expect_n = (meta[mid]["duration_ms"] - 1) // 200 + 1
        assert len(grp) == expect_n
        assert list(grp.sort_values("frame_idx")["frame_ts_ms"])[:2] == [0, 200]


# ---------------------------------------------------------------------------
# Real codecs (BMP / WAV)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_arbitrary_pixels():
    """encode→decode is the identity for arbitrary (H, W, 3) arrays,
    including widths whose rows need padding (w*3 % 4 != 0)."""
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(42)
    for h, w in ((1, 1), (3, 5), (16, 17), (7, 2), (32, 33)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()


def test_wav_roundtrip_and_stereo():
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, size=1001, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and (s == mono).all()
    stereo = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (500, 2) and (s2 == stereo).all()


def test_codecs_reject_malformed():
    import numpy as np
    import pytest

    from chronicle_sniffer_spark.operators.codecs import decode_bmp, decode_wav, encode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"NOTABMP" + b"\x00" * 100)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    # truncated pixel data
    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_bmp(good[:-8])


def test_encoded_corpus_decodes_on_spark(spark):
    """The Spark-side mapInPandas decode equals a local decode of the
    same payloads (schema, batching, and byte transport are lossless)."""
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_bmp
    from chronicle_sniffer_spark.operators.multimodal import (
        image_stats,
        synthesize_media_encoded,
    )
    from chronicle_sniffer_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = synthesize_media_encoded(docs)
    local = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("kind = 'image'").collect()
    }
    got = {r["media_id"]: r for r in image_stats(media).collect()}
    assert set(got) == set(local)
    for mid, payload in local.items():
        px = decode_bmp(payload)
        r = got[mid]
        assert (r["height"], r["width"]) == px.shape[:2]
        assert abs(r["mean_r"] - float(px[:, :, 0].mean())) < 1e-9


# ---------------------------------------------------------------------------
# PNG codec (deflate + all five scanline filters)
# ---------------------------------------------------------------------------


def test_png_roundtrip_every_filter_type():
    """encode→decode is the identity for arbitrary pixels under every
    scanline filter type (0-4) and under mixed per-row filters."""
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(42)
    for h, w in ((1, 1), (3, 5), (16, 17), (20, 33)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ftype in range(5):
            assert (decode_png(encode_png(px, ftype)) == px).all(), (h, w, ftype)
        mixed = [(y * 3 + 1) % 5 for y in range(h)]
        assert (decode_png(encode_png(px, mixed)) == px).all()


def test_png_decode_handbuilt_vector():
    """Decode a PNG built BY HAND (not by our encoder): a 2x2 image
    with row 0 Sub-filtered and row 1 Up-filtered, filtered bytes
    computed manually from the spec — catches an encoder/decoder pair
    that round-trips through a shared mistake."""
    import struct
    import zlib

    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_png

    # target pixels: [[(10,20,30),(13,24,35)], [(11,22,33),(15,28,41)]]
    # row 0 Sub:   first px raw, second px minus left -> (3,4,5)
    # row 1 Up:    minus row 0   -> (1,2,3), (2,4,6)
    scan = bytes([1, 10, 20, 30, 3, 4, 5]) + bytes([2, 1, 2, 3, 2, 4, 6])

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    expect = np.array(
        [[(10, 20, 30), (13, 24, 35)], [(11, 22, 33), (15, 28, 41)]], dtype=np.uint8
    )
    assert (decode_png(png) == expect).all()


def test_png_rejects_malformed():
    import numpy as np
    import pytest

    from chronicle_sniffer_spark.operators.codecs import decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG" + b"\x00" * 64)
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8), 4)
    with pytest.raises(ValueError):
        decode_png(good[:-6])  # truncated IEND
    corrupt = bytearray(good)
    corrupt[30] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))


def test_png_corpus_decodes_on_spark(spark):
    """Spark-side mapInPandas PNG decode equals a local decode of the
    same payloads, and the cycling filter types really vary per image."""
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_png
    from chronicle_sniffer_spark.operators.multimodal import (
        png_stats,
        synthesize_png_corpus,
    )
    from chronicle_sniffer_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = synthesize_png_corpus(docs)
    local = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert local, "expected doc_id % 3 == 2 rows in the smoke table"
    got = {r["media_id"]: r for r in png_stats(media).collect()}
    assert set(got) == set(local)
    for mid, payload in local.items():
        px = decode_png(payload)
        r = got[mid]
        assert (r["height"], r["width"]) == px.shape[:2]
        assert abs(r["mean_r"] - float(px[:, :, 0].mean())) < 1e-9
        # solid color by construction
        assert int(px[:, :, 0].min()) == int(px[:, :, 0].max()) == (mid * 3) % 256


# ---------------------------------------------------------------------------
# baseline grayscale JPEG (operators/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_flat_even_offsets_exact():
    """Flat blocks with even level-shift offsets survive Annex-K DC
    quantization bit-exactly — the property the closed-form oracle
    relies on — including DC-difference chaining across blocks."""
    import numpy as np

    from chronicle_sniffer_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    for v in (0, 2, 64, 128, 200, 254):
        px = np.full((16, 24), v, dtype=np.uint8)
        assert (decode_jpeg_gray(encode_jpeg_gray(px)) == px).all()
    halves = np.zeros((16, 32), dtype=np.uint8)
    halves[:, :16], halves[:, 16:] = 100, 180
    assert (decode_jpeg_gray(encode_jpeg_gray(halves)) == halves).all()


def test_jpeg_lossy_bounds_and_determinism():
    import numpy as np

    from chronicle_sniffer_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    x = np.linspace(0, 255, 64)
    grad = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(grad))
    assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 12
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    enc = encode_jpeg_gray(noise)
    assert (decode_jpeg_gray(enc) == decode_jpeg_gray(enc)).all()


def test_jpeg_rejects_malformed():
    import numpy as np
    import pytest

    from chronicle_sniffer_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    with pytest.raises(ValueError):
        decode_jpeg_gray(b"NOTAJPEG")
    good = encode_jpeg_gray(np.full((8, 8), 100, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg_gray(good[:-4])  # EOI gone
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((9, 8), dtype=np.uint8))  # not multiple of 8


def test_jpeg_corpus_decodes_on_spark(spark):
    import numpy as np

    from chronicle_sniffer_spark.operators.jpeg import decode_jpeg_gray
    from chronicle_sniffer_spark.operators.multimodal import (
        jpeg_stats,
        synthesize_jpeg_corpus,
    )
    from chronicle_sniffer_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = synthesize_jpeg_corpus(docs)
    local = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert local
    got = {r["media_id"]: r for r in jpeg_stats(media).collect()}
    assert set(got) == set(local)
    for mid, payload in local.items():
        px = decode_jpeg_gray(payload)
        r = got[mid]
        assert (r["height"], r["width"]) == px.shape
        assert r["mean_gray"] == float(px.astype("f8").mean()) == 2 * ((mid * 7) % 128)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF container probe
# ---------------------------------------------------------------------------


def test_mp4_skeleton_probe_roundtrip():
    from chronicle_sniffer_spark.operators.codecs import encode_mp4_skeleton, probe_mp4

    for dur, tracks in ((1000, 1), (3500, 2), (40, 1)):
        info = probe_mp4(encode_mp4_skeleton(dur, n_tracks=tracks))
        assert info["major_brand"] == "isom"
        assert info["timescale"] == 1000
        assert info["duration_ms"] == dur
        assert info["n_tracks"] == tracks


def test_mp4_probe_rejects_malformed():
    import pytest

    from chronicle_sniffer_spark.operators.codecs import encode_mp4_skeleton, probe_mp4

    with pytest.raises(ValueError):
        probe_mp4(b"\x00FAKEMP4" + (123).to_bytes(8, "little"))  # the old fake bytes
    good = encode_mp4_skeleton(1000)
    with pytest.raises(ValueError):
        probe_mp4(good[:-4])  # truncated box
    with pytest.raises(ValueError):
        probe_mp4(good[8:])  # ftyp gone


# ---------------------------------------------------------------------------
# property-based codec tests (hypothesis)
# ---------------------------------------------------------------------------


def test_png_roundtrip_property():
    """Any uint8 RGB array round-trips under any filter assignment."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chronicle_sniffer_spark.operators.codecs import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
        base_filter=st.integers(0, 4),
    )
    def check(h, w, seed, base_filter):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        filters = [(base_filter + y) % 5 for y in range(h)]
        assert (decode_png(encode_png(px, filters)) == px).all()

    check()


def test_jpeg_flat_exactness_property():
    """EVERY even gray value is bit-exact through the full JPEG
    entropy pipeline at every supported block-multiple size."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chronicle_sniffer_spark.operators.jpeg import decode_jpeg_gray, encode_jpeg_gray

    @settings(max_examples=40, deadline=None)
    @given(
        v=st.integers(0, 127),
        bh=st.integers(1, 4),
        bw=st.integers(1, 4),
    )
    def check(v, bh, bw):
        px = np.full((8 * bh, 8 * bw), 2 * v, dtype=np.uint8)
        assert (decode_jpeg_gray(encode_jpeg_gray(px)) == px).all()

    check()


# ---------------------------------------------------------------------------
# 4:4:4 color JPEG
# ---------------------------------------------------------------------------


def test_jpeg_color_flat_lattice_exact():
    """Flat YCbCr planes on the exactness lattices (luma even offset,
    chroma 128+17k) round-trip bit-exactly through the interleaved
    three-component pipeline, including per-component DC chaining."""
    import numpy as np

    from chronicle_sniffer_spark.operators.jpeg import (
        decode_jpeg_ycbcr444,
        encode_jpeg_ycbcr444,
    )

    for y, cb, cr in ((128, 128, 128), (64, 77, 213), (0, 9, 247), (254, 128 - 17, 128 + 17)):
        pl = np.empty((16, 32, 3), dtype=np.uint8)
        pl[:, :, 0], pl[:, :, 1], pl[:, :, 2] = y, cb, cr
        assert (decode_jpeg_ycbcr444(encode_jpeg_ycbcr444(pl)) == pl).all(), (y, cb, cr)
    # two flat halves: per-component DC differences across MCUs
    pl = np.empty((8, 32, 3), dtype=np.uint8)
    pl[:, :16] = (100, 128, 145)
    pl[:, 16:] = (180, 111, 128)
    assert (decode_jpeg_ycbcr444(encode_jpeg_ycbcr444(pl)) == pl).all()


def test_jpeg_color_lossy_bounds_and_component_mismatch():
    import numpy as np
    import pytest

    from chronicle_sniffer_spark.operators.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_ycbcr444,
        encode_jpeg_gray,
        encode_jpeg_ycbcr444,
        ycbcr_to_rgb,
    )

    x = np.linspace(0, 255, 64)
    grad = np.clip(np.add.outer(x[:32], x) / 2, 0, 255).astype(np.uint8)
    pl = np.stack([grad] * 3, axis=2)
    dec = decode_jpeg_ycbcr444(encode_jpeg_ycbcr444(pl))
    assert np.abs(dec.astype(int) - pl.astype(int)).max() <= 20
    rgb = ycbcr_to_rgb(dec)
    assert rgb.shape == dec.shape and rgb.dtype == np.uint8
    with pytest.raises(ValueError):
        decode_jpeg_gray(encode_jpeg_ycbcr444(pl))
    with pytest.raises(ValueError):
        decode_jpeg_ycbcr444(encode_jpeg_gray(grad))


def test_jpeg_color_corpus_decodes_on_spark(spark):
    import numpy as np

    from chronicle_sniffer_spark.operators.jpeg import decode_jpeg_ycbcr444
    from chronicle_sniffer_spark.operators.multimodal import (
        jpeg_color_stats,
        synthesize_jpeg_color_corpus,
    )
    from chronicle_sniffer_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = synthesize_jpeg_color_corpus(docs)
    local = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert local
    got = {r["media_id"]: r for r in jpeg_color_stats(media).collect()}
    assert set(got) == set(local)
    for mid, payload in local.items():
        px = decode_jpeg_ycbcr444(payload)
        r = got[mid]
        assert (r["height"], r["width"]) == px.shape[:2]
        assert r["mean_y"] == 2 * ((mid * 11) % 128)
        assert r["mean_cb"] == 128 + 17 * ((mid % 15) - 7)
        assert r["mean_cr"] == 128 + 17 * (((mid * 3) % 15) - 7)


def test_jpeg420_flat_lattice_exact_and_bounds():
    """4:2:0: flat lattice planes exact through subsample + entropy +
    replicate-upsample; gradients bounded; wrong-layout rejects."""
    import numpy as np
    import pytest

    from chronicle_sniffer_spark.operators.jpeg import (
        decode_jpeg_ycbcr420,
        encode_jpeg_ycbcr420,
        encode_jpeg_ycbcr444,
    )

    for y, cb, cr in ((128, 128, 128), (64, 77, 213), (0, 9, 247)):
        pl = np.empty((32, 48, 3), dtype=np.uint8)
        pl[:, :, 0], pl[:, :, 1], pl[:, :, 2] = y, cb, cr
        assert (decode_jpeg_ycbcr420(encode_jpeg_ycbcr420(pl)) == pl).all(), (y, cb, cr)
    x = np.linspace(0, 255, 64)
    grad = np.stack([np.clip(np.add.outer(x[:32], x) / 2, 0, 255)] * 3, axis=2).astype(np.uint8)
    dec = decode_jpeg_ycbcr420(encode_jpeg_ycbcr420(grad))
    assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 40
    with pytest.raises(ValueError):
        decode_jpeg_ycbcr420(encode_jpeg_ycbcr444(grad))  # 4:4:4 stream
    with pytest.raises(ValueError):
        encode_jpeg_ycbcr420(grad[:24])  # not a multiple of 16


def test_jpeg420_corpus_decodes_on_spark(spark):
    from chronicle_sniffer_spark.operators.multimodal import (
        jpeg420_stats,
        synthesize_jpeg420_corpus,
    )
    from chronicle_sniffer_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    got = {r["media_id"]: r for r in jpeg420_stats(synthesize_jpeg420_corpus(docs)).collect()}
    assert got
    for mid, r in got.items():
        assert r["mean_y"] == 2 * ((mid * 13) % 128)
        assert r["mean_cb"] == 128 + 17 * ((mid % 13) - 6)
        assert r["mean_cr"] == 128 + 17 * (((mid * 5) % 13) - 6)


def test_ycbcr_to_rgb_known_values():
    """Neutral chroma maps to pure gray exactly; primary-ish vectors
    land on the JFIF closed-form values."""
    import numpy as np

    from chronicle_sniffer_spark.operators.jpeg import ycbcr_to_rgb

    gray = np.empty((2, 2, 3), dtype=np.uint8)
    gray[:, :, 0], gray[:, :, 1], gray[:, :, 2] = 137, 128, 128
    assert (ycbcr_to_rgb(gray) == 137).all()
    # Y=76, Cb=85, Cr=255 is (approximately) pure red's YCbCr
    red = np.empty((1, 1, 3), dtype=np.uint8)
    red[0, 0] = (76, 85, 255)
    r, g, b = ycbcr_to_rgb(red)[0, 0]
    assert r == 254 and g <= 30 and b <= 10, (r, g, b)


def test_gif_lzw_roundtrip_and_validation():
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_gif_gray, encode_gif_gray

    rng = np.random.default_rng(7)
    # odd dims, flat, gradient (dictionary growth), repeated rows
    for px in (
        rng.integers(0, 256, (33, 17)).astype(np.uint8),
        np.full((40, 50), 201, np.uint8),
        np.tile(np.arange(256, dtype=np.uint8), (20, 1)),
        rng.integers(0, 256, (200, 300)).astype(np.uint8),  # 12-bit ceiling + CLEAR
    ):
        assert (decode_gif_gray(encode_gif_gray(px)) == px).all()
    good = encode_gif_gray(np.full((8, 8), 9, np.uint8))
    for bad in (b"NOTAGIF", good[:20], good[:-3]):
        with pytest.raises(ValueError):
            decode_gif_gray(bad)
    with pytest.raises(ValueError):
        encode_gif_gray(np.zeros((4, 4, 3), np.uint8))  # not (H, W)


def test_decode_image_strict_handles_gif():
    import numpy as np

    from chronicle_sniffer_spark.operators.multimodal import _decode_image_bytes
    from chronicle_sniffer_spark.operators.codecs import encode_gif_gray

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    got, mode = _decode_image_bytes(encode_gif_gray(px))
    assert mode == "L" and (got == px).all()


def test_mp4_mjpeg420_color_roundtrip():
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import decode_mp4_samples, encode_mp4_mjpeg
    from chronicle_sniffer_spark.operators.jpeg import (
        decode_jpeg_ycbcr420,
        encode_jpeg_ycbcr420,
    )

    frames = []
    for f in range(3):
        pl = np.empty((16, 32, 3), dtype=np.uint8)
        pl[:, :, 0] = 2 * ((11 + f * 23) % 128)
        pl[:, :, 1], pl[:, :, 2] = 128 + 17, 128 - 34
        frames.append(encode_jpeg_ycbcr420(pl))
    parsed = decode_mp4_samples(encode_mp4_mjpeg(frames, 32, 16))
    assert len(parsed["samples"]) == 3
    for f, s in enumerate(parsed["samples"]):
        px = decode_jpeg_ycbcr420(s)
        assert px.shape == (16, 32, 3)
        assert (px[:, :, 0] == 2 * ((11 + f * 23) % 128)).all()
        assert (px[:, :, 1] == 128 + 17).all() and (px[:, :, 2] == 128 - 34).all()


def test_ulaw_codec_properties():
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import (
        decode_wav_ulaw,
        encode_wav_ulaw,
        ulaw_decode,
        ulaw_encode,
    )

    # decode->encode is the identity on all codewords except the +0/-0
    # pair (codes 127 and 255 both decode to 0 — inherent to G.711)
    codes = np.arange(256, dtype=np.uint8).tobytes()
    vals = ulaw_decode(codes)
    re = np.frombuffer(ulaw_encode(vals), dtype=np.uint8)
    mismatch = [c for c in range(256) if re[c] != c]
    assert mismatch == [127]
    assert int(vals[127]) == 0 and int(vals[255]) == 0
    # full 16-bit range coverage and odd symmetry
    assert vals.min() == -32124 and vals.max() == 32124
    assert (ulaw_decode(bytes(range(128))) == -ulaw_decode(bytes(range(128, 256)))).all()
    # companding error is relatively bounded (log quantizer)
    rng = np.random.default_rng(3)
    x = rng.integers(-32000, 32000, 4096).astype(np.int16)
    y = ulaw_decode(ulaw_encode(x)).astype(np.int32)
    rel = np.abs(x - y) / np.maximum(np.abs(x.astype(np.int32)), 64)
    assert rel.max() < 0.5
    # WAV container round-trip on a lattice wave
    amp = int(ulaw_decode(bytes([200]))[0])
    wave = np.tile(np.array([amp, -amp], np.int16), 300)
    out, rate = decode_wav_ulaw(encode_wav_ulaw(wave, 8000))
    assert rate == 8000 and (out == wave).all()
    with pytest.raises(ValueError):
        decode_wav_ulaw(b"RIFFxxxxNOPE")


def test_gif_anim_roundtrip_and_validation():
    import numpy as np

    from chronicle_sniffer_spark.operators.codecs import (
        decode_gif_anim,
        encode_gif_anim,
        encode_gif_gray,
    )

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (24, 31)).astype(np.uint8) for _ in range(4)]
    got = decode_gif_anim(encode_gif_anim(frames))
    assert len(got) == 4 and all((a == b).all() for a, b in zip(got, frames))
    # a plain single-frame GIF87a decodes as a one-element list
    one = decode_gif_anim(encode_gif_gray(frames[0]))
    assert len(one) == 1 and (one[0] == frames[0]).all()
    with pytest.raises(ValueError):
        decode_gif_anim(encode_gif_anim(frames)[:-5])  # truncated
    with pytest.raises(ValueError):
        encode_gif_anim([])  # empty
    with pytest.raises(ValueError):
        encode_gif_anim([frames[0], frames[0][:8]])  # size mismatch
