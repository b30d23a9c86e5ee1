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


def test_decode_image_strict_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        decode_image(media, strict=True).collect()


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
