"""Near-duplicate detection by n-gram Jaccard similarity
(SURVEY.md §2B L2; complements the MinHash-LSH path in plans/llm.py
and the SimHash signatures in functions/text.py).

Scale shape (the 100 TB story):

1. **Shingling is a narrow flatMap** — no shuffle; each doc emits its
   distinct word n-grams.
2. **Candidate generation is an inverted-index self-join on the gram**,
   never an all-pairs cross join.  The one skew hazard is a stop-gram
   shared by millions of documents; ``max_df`` drops grams whose
   document frequency exceeds the cap *before* the self-join, which
   bounds the per-gram join fan-out at ``max_df²`` rows.  (Standard
   trick: a gram that common carries no signal anyway.)
3. **Jaccard is then computed exactly** for candidate pairs only, from
   the *uncapped* gram sets, so the cap affects recall of
   candidate generation but never the correctness of a reported score.

Reference tie-in: generalizes the ref's exact-membership dedup
(`sniffer/sniffer_entrypoint.sh:117-128` processed-file set) to
content-similarity dedup for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id → distinct word n-grams (narrow flatMap + distinct).

    Repartition before the explode so the ~|text|× fan-out map stage
    doesn't run in the scan's (possibly single-file) partitioning.
    """
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 1)),"
        f" i -> array_join(slice(split(text, ' '), i, {n}), ' '))"
    )
    return docs.select("doc_id", F.explode(grams).alias("gram")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, max_df: int = 100
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with Jaccard ≥ threshold.

    Three shuffles total: gram-distinct, the per-gram candidate join,
    and the intersection count — each keyed by gram or pair, never by
    document body.
    """
    grams = word_ngrams(docs, n)

    # one row per doc: its sorted gram set (bounded by doc length) —
    # computed ONCE; every later stage joins this one-row-per-doc table
    # instead of re-deriving the exploded gram relation
    gram_sets = grams.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("gram")).alias("grams")
    )

    # candidate pairs from rare grams only (fan-out bounded by max_df²)
    rare = grams.join(
        grams.groupBy("gram").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df),
        "gram",
    ).select("doc_id", "gram")
    a, b = rare.alias("a"), rare.alias("b")
    cand = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # exact Jaccard over the UNCAPPED gram sets, candidates only —
    # array_intersect stays JVM-side, sets travel once per candidate
    sa = gram_sets.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    sb = gram_sets.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    n_inter = F.size(F.array_intersect("grams_a", "grams_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                n_inter / (F.size("grams_a") + F.size("grams_b") - n_inter), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
