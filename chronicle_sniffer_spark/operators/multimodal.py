"""Multimodal column operators (SURVEY §2B L5).

Media travel as opaque ``binary`` payload columns with a typed
metadata struct; every transform is Arrow-batched (``mapInPandas`` /
``pandas_udf``) so payload bytes cross the JVM↔Python boundary in
columnar batches, never row-at-a-time.

The container ships no image/audio codecs (PIL/ffmpeg absent), so the
*decode* step is stubbed two ways, both clearly marked:

- ``decode_image(..., strict=True)`` raises ``NotImplementedError``
  where a real codec would run — the Spark-side plumbing (schema,
  batching, partitioning) is what's real and tested;
- the default path substitutes a **deterministic fake decode** (header
  parse + payload-hash statistics) so downstream operators and tests
  have stable values to assert against.

Scale shape: payloads never shuffle unless the user asks for it —
feature extraction and decode are narrow maps; only the (small)
feature vectors and metadata move in joins/aggregations.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_META_DDL = (
    "struct<format string, width int, height int, sample_rate int,"
    " duration_ms int, n_frames int>"
)
MEDIA_DDL = f"media_id bigint, kind string, payload binary, meta {MEDIA_META_DDL}"

DECODED_IMAGE_DDL = "media_id bigint, width int, height int, mode string, pixel_hash string"
FEATURES_DDL = "media_id bigint, feature array<float>"


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media corpus derived from ``documents`` (binary
    payload = text bytes; metadata derived from doc_id) — the offline
    stand-in for real image/audio/video ingestion."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.expr(
        f"""CAST(named_struct(
            'format', CASE WHEN doc_id % 3 = 0 THEN 'png'
                           WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'mp4' END,
            'width',  CASE WHEN doc_id % 3 = 0 THEN 64 + CAST(doc_id % 8 AS INT) * 32 END,
            'height', CASE WHEN doc_id % 3 = 0 THEN 64 + CAST(doc_id % 5 AS INT) * 32 END,
            'sample_rate', CASE WHEN doc_id % 3 = 1 THEN 16000 END,
            'duration_ms', CASE WHEN doc_id % 3 <> 0 THEN 1000 + CAST(doc_id % 7 AS INT) * 500 END,
            'n_frames', CASE WHEN doc_id % 3 = 2 THEN
                             CAST((1000 + (doc_id % 7) * 500) / 40 AS INT) END
        ) AS {MEDIA_META_DDL})"""
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        meta.alias("meta"),
    )


def payload_integrity(media: DataFrame) -> DataFrame:
    """L5 pass-through check: binary payloads survive the pipeline
    byte-exact (md5 over the payload column, JVM-side)."""
    return media.select("media_id", F.md5(F.col("payload")).alias("payload_md5"))


def decode_image(media: DataFrame, strict: bool = False) -> DataFrame:
    """Image decode over ``mapInPandas``.

    ``strict=True`` marks where the real codec belongs and raises
    ``NotImplementedError`` per batch when no codec is available.  The
    default deterministic fake reports metadata dimensions and a
    payload digest as the "pixel" statistic.
    """
    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict and not _HAS_PIL:
                raise NotImplementedError(
                    "image decode requires an image codec (PIL) — not shipped in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                    "mode": "RGB",
                    "pixel_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, DECODED_IMAGE_DDL)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction (deterministic stub for a real encoder):
    payload → ``array<float>`` embedding.  The Arrow batch shape,
    output schema, and partition-preserving plan are the real artifact;
    swap the hash for a model call in production."""
    import numpy as np
    import pandas as pd

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                h = hashlib.sha256(bytes(b)).digest()
                raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=">u4")
                feats.append((raw.astype("f8") / 2**32).astype("f4"))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(op, FEATURES_DDL)


def sample_frames(media: DataFrame, every_ms: int = 200) -> Column | DataFrame:
    """Video frame sampling: one row per sampled timestamp.  Pure
    column expressions (sequence + posexplode) — the *byte* decode of
    each frame is the stubbed step; offsets/timestamps are real."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_idx", "frame_ts_ms"),
    )
