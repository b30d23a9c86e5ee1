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
    hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
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

    def _in_markers(markers):
        # single-arg closure: a two-parameter lambda (w, m=...) would be
        # treated by PySpark as an (element, index) function
        return lambda w: w.isin(*markers)

    scores = []
    for lang, markers in LANG_MARKERS.items():
        scores.append(
            F.struct(
                F.size(F.filter(toks, _in_markers(markers))).alias("n"),
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
    # across tokens, then pack the vote signs into the bigint.  Built
    # from the passed Column via Python-side higher-order functions —
    # an earlier version hard-coded `split(text, ' ')` in an F.expr
    # string, silently ignoring the argument on renamed/derived
    # columns.  For corpus-scale jobs prefer the explode/groupBy
    # formulation in operators/simhash.py, which stays in whole-stage
    # codegen end-to-end.
    one = F.lit(1).cast("bigint")
    tok_hashes = F.transform(tokens(text), lambda w: F.xxhash64(w))
    votes = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0).cast("bigint"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(63)),
            lambda a, i: a + F.when(F.bit_get(h, i) == 1, one).otherwise(-one),
        ),
    )
    # Pack sign bits MSB-first: fold acc = (acc << 1) | sign(vote_i),
    # visiting bit 63 down to bit 0 — identical to sum(shiftleft(1, i))
    # over positive votes, but expressible without a variable shift.
    return F.aggregate(
        F.reverse(votes),
        F.lit(0).cast("bigint"),
        lambda acc, v: F.shiftleft(acc, 1) + F.when(v > 0, one).otherwise(F.lit(0).cast("bigint")),
    ).alias("simhash")
