"""Text-analysis column functions for the LLM-pipeline surface
(SURVEY §2B L4): tokenization, quality scoring, language-ID heuristic,
document fingerprinting.  All native expressions — JVM-side, no UDFs —
so they stay inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# (Real language ID would plug in here as a pandas UDF over fastText or
# similar; the heuristic keeps the operator testable offline.)
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    hits = F.size(F.expr(f"filter(split(text, ' '), w -> w IN ({stop_list}))"))
    return F.round(hits.cast("double") / F.size(toks), 6)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.round(F.length(stripped).cast("double") / F.length(text), 6)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic: length band + low punctuation +
    healthy stopword density (the classic pre-training filter trio)."""
    n = F.length(text)
    length_ok = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) > 0.01, 1.0).otherwise(0.0)
    return F.round((length_ok + punct_ok + stop_ok) / 3.0, 6)


def lang_guess(text: Column) -> Column:
    """Marker-word vote across the lexicons; 'und' (undetermined) when
    nothing matches."""
    toks = tokens(text)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        scores.append(
            F.struct(
                F.size(F.expr(f"filter(split(text, ' '), w -> w IN ({lst}))")).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint64(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    whitespace-normalized lowercased text (rolling-hash-style content
    identity for dedup joins — 8-byte shuffle key instead of the body)."""
    normalized = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.xxhash64(normalized)


def simhash64(text: Column) -> Column:
    """64-bit SimHash over word tokens (near-dup signature; Hamming
    distance ≤ k ⇒ near-duplicate).

    Pure column expressions: per token compute xxhash64, then for each
    bit position sum ±1 votes and take the sign.  aggregate() over 64
    bit positions stays JVM-side.
    """
    # Single pass: hash each token ONCE, fold a 64-counter vote array
    # across tokens, then pack the vote signs into the bigint.  (The
    # earlier per-bit formulation re-split the text and re-hashed every
    # token once per bit — 64x the work, and higher-order functions
    # evaluate interpreted, so it dominated the fingerprint query's
    # wall time at sf0.1.)  For corpus-scale jobs prefer the
    # explode/groupBy formulation in operators/simhash.py, which stays
    # in whole-stage codegen end-to-end.
    return F.expr(
        "aggregate("
        " zip_with("
        "   aggregate(transform(split(text, ' '), w -> xxhash64(w)),"
        "     array_repeat(CAST(0 AS BIGINT), 64),"
        "     (acc, h) -> zip_with(acc, sequence(0, 63),"
        "       (a, i) -> a + IF(((h >> i) & 1) = 1, 1L, -1L))),"
        "   sequence(0, 63),"
        "   (v, i) -> IF(v > 0, shiftleft(1L, i), 0L)),"
        " 0L, (acc, x) -> acc + x)"
    ).alias("simhash")
