"""Text-analysis function tests: fingerprint determinism, SimHash
near-dup properties, quality scoring, language heuristic."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronicle_sniffer_spark.functions import text as TX


def _one(spark, text: str, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).collect()[0].v


def test_fingerprint_deterministic_and_normalized(spark):
    a = _one(spark, "The quick  brown fox", TX.fingerprint64(F.col("text")))
    b = _one(spark, "the quick brown fox", TX.fingerprint64(F.col("text")))
    c = _one(spark, "the quick brown cat", TX.fingerprint64(F.col("text")))
    assert a == b  # whitespace + case normalized
    assert a != c


def _hamming(x: int, y: int) -> int:
    return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_simhash_near_dup_property(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different words about spark query engines and parquet files " * 5
    h_base = _one(spark, base.strip(), TX.simhash64(F.col("text")))
    h_near = _one(spark, near.strip(), TX.simhash64(F.col("text")))
    h_far = _one(spark, far.strip(), TX.simhash64(F.col("text")))
    assert _hamming(h_base, h_near) <= 12
    assert _hamming(h_base, h_far) > _hamming(h_base, h_near)


def test_quality_score_bands(spark):
    good = "this is a reasonably long sentence with the usual words of english prose " * 3
    junk = "!!! ??? *** !!!"
    assert _one(spark, good.strip(), TX.quality_score(F.col("text"))) == 1.0
    assert _one(spark, junk, TX.quality_score(F.col("text"))) < 0.5


def test_lang_guess(spark):
    assert _one(spark, "the cat is on the mat and happy", TX.lang_guess(F.col("text"))) == "en"
    assert _one(spark, "el perro de la casa que ladra", TX.lang_guess(F.col("text"))) == "es"
    assert _one(spark, "xyzzy plugh qwerty", TX.lang_guess(F.col("text"))) == "und"
