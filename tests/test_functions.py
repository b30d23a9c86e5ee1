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


def test_column_argument_respected_on_renamed_and_derived_columns(spark):
    """Regression: these functions once hard-coded `split(text, ' ')` in
    F.expr strings, silently ignoring the passed Column.  Calling them
    on a renamed column must equal calling them on one named `text`,
    and a derived column must actually transform the input."""
    s = "the quick brown fox jumps over the lazy dog"
    via_text = {
        "simhash": _one(spark, s, TX.simhash64(F.col("text"))),
        "stop": _one(spark, s, TX.stopword_ratio(F.col("text"))),
        "lang": _one(spark, s, TX.lang_guess(F.col("text"))),
    }
    renamed = spark.createDataFrame([(s,)], "body string")
    row = renamed.select(
        TX.simhash64(F.col("body")).alias("simhash"),
        TX.stopword_ratio(F.col("body")).alias("stop"),
        TX.lang_guess(F.col("body")).alias("lang"),
    ).collect()[0]
    assert row.simhash == via_text["simhash"]
    assert row.stop == via_text["stop"]
    assert row.lang == via_text["lang"]
    # Derived column: uppercasing breaks the lowercase stopword matches,
    # so the result must differ from the plain-text one.
    derived = renamed.select(TX.stopword_ratio(F.upper(F.col("body"))).alias("stop")).collect()[0]
    assert derived.stop == 0.0 != via_text["stop"]
