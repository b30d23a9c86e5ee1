"""Round-13 catalog additions (SURVEY.md §2B growth).

Families this round:

- g13_degree_cap_audit — the dropped-wedge exposure report for the
  degree-capped common-neighbor candidate generation (round-12
  verdict's named gap: g13 promised a cap it didn't implement; the
  cap now exists and this entry is its honesty twin, the
  l2_ngram_df_cap_audit pattern applied to the graph family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import query
from chronicle_sniffer_spark.plans.round12 import G13_DEG_CAP
from chronicle_sniffer_spark.tables import load_table

_t = load_table


# ---------------------------------------------------------------------------
# G13 audit: dropped-wedge exposure of the degree cap
# ---------------------------------------------------------------------------

_G13AUDIT_ORACLE = f"""
    WITH e AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    cdeg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY c)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN d > {G13_DEG_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hot,
           CAST(max(d) AS BIGINT) AS max_deg,
           CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS wedges_total,
           CAST(sum((least(d, {G13_DEG_CAP}) * (least(d, {G13_DEG_CAP}) - 1)) // 2)
             AS BIGINT) AS wedges_kept,
           CAST(sum((d * (d - 1)) // 2
                - (least(d, {G13_DEG_CAP}) * (least(d, {G13_DEG_CAP}) - 1)) // 2)
             AS BIGINT) AS wedges_dropped
    FROM cdeg
"""


@query("g13_degree_cap_audit", section="G2", oracle=_G13AUDIT_ORACLE)
def g13_degree_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure report for g13's degree cap — the honesty twin every
    capped index needs (the l2_ngram_df_cap_audit pattern): per-corpus
    counts of hot customers (degree > {CAP}), the wedge volume the cap
    admits vs drops, and the max degree.  A pair can be MISSED by the
    capped candidate generation only via dropped wedges, and only if
    ALL its shared customers are hot — so ``wedges_dropped = 0`` is a
    proof of exactness for the corpus, and a small ratio bounds the
    exposure.  The wedge counts are the literal join-volume numbers:
    ``wedges_kept`` is work the capped g13 does, ``wedges_total`` is
    what the uncapped form would have done (the quantity that explodes
    as Σ_c deg(c)² on power-law graphs).

    Spark shapes: one edge distinct + one customer-keyed agg + one
    global fold; every count is exact int64 (DuckDB's BIGINT sums
    promote to HUGEINT, so the oracle casts each sum back — the
    documented int64 contract)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    cdeg = e.groupBy("c").agg(F.count("*").cast("bigint").alias("d"))
    kept = f"(least(d, {G13_DEG_CAP}) * (least(d, {G13_DEG_CAP}) - 1)) div 2"
    return cdeg.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("d") > G13_DEG_CAP, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hot"),
        F.max("d").cast("bigint").alias("max_deg"),
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("bigint").alias("wedges_total"),
        F.sum(F.expr(kept)).cast("bigint").alias("wedges_kept"),
        F.sum(F.expr(f"(d * (d - 1)) div 2 - ({kept})"))
        .cast("bigint")
        .alias("wedges_dropped"),
    )


g13_degree_cap_audit.__doc__ = g13_degree_cap_audit.__doc__.format(
    CAP=G13_DEG_CAP
)


# ---------------------------------------------------------------------------
# S20: WARC record-type / charset-damage accounting
# ---------------------------------------------------------------------------


def _s20mix_oracle() -> str:
    from chronicle_sniffer_spark.sources.warc import (
        LATIN1_MOD,
        METADATA_MOD,
        MISDECLARED_ERRORS,
        MISDECLARED_MOD,
        REQUEST_MOD,
        REVISIT_MOD,
    )

    return f"""
    WITH d AS (SELECT doc_id FROM documents)
    SELECT 'metadata' AS warc_type,
           CAST((SELECT count(*) FROM d WHERE doc_id % {METADATA_MOD} = 0)
             AS BIGINT) AS n_records,
           CAST(0 AS BIGINT) AS n_http_200,
           CAST(0 AS BIGINT) AS decode_errors_total
    UNION ALL
    SELECT 'request',
           CAST((SELECT count(*) FROM d WHERE doc_id % {REQUEST_MOD} = 0)
             AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'response',
           CAST((SELECT count(*) FROM d)
              + (SELECT count(*) FROM d WHERE doc_id % {LATIN1_MOD} = 0)
              + (SELECT count(*) FROM d WHERE doc_id % {MISDECLARED_MOD} = 0)
             AS BIGINT),
           CAST((SELECT count(*) FROM d)
              + (SELECT count(*) FROM d WHERE doc_id % {LATIN1_MOD} = 0)
              + (SELECT count(*) FROM d WHERE doc_id % {MISDECLARED_MOD} = 0)
             AS BIGINT),
           CAST({MISDECLARED_ERRORS}
              * (SELECT count(*) FROM d WHERE doc_id % {MISDECLARED_MOD} = 0)
             AS BIGINT)
    UNION ALL
    SELECT 'revisit',
           CAST((SELECT count(*) FROM d WHERE doc_id % {REVISIT_MOD} = 0)
             AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    """


@query("s20_warc_record_mix", section="S2", oracle=_s20mix_oracle())
def s20_warc_record_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-type + decode-damage accounting over the FULL container
    scan — the bookkeeping a 100 TB ingest runs before anything else:
    how many records of each WARC type arrived, how many carried an
    HTTP 200, and how much charset damage the decode absorbed.  The
    fixture interleaves request/metadata/revisit records with the
    responses on deterministic doc_id grids, ships a correctly-declared
    latin-1 page class AND a latin-1-bytes-declared-utf-8 class
    (sources/warc.py) — the oracle re-derives every count from the
    documents table and pins ``decode_errors_total`` to exactly
    MISDECLARED_ERRORS × |mis-declared class|: a decoder that
    silently mangles (or silently heals) non-UTF-8 bytes hash-fails
    here.

    Spark shapes: the per-file member decode → one warc_type-keyed
    partial agg; nothing else."""
    from chronicle_sniffer_spark.plans.round12 import _warc_dir
    from chronicle_sniffer_spark.sources.warc import read_warc

    recs = read_warc(spark, _warc_dir(spark, sf_dir))
    return recs.groupBy("warc_type").agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(F.when(F.col("http_status") == 200, 1).otherwise(0))
        .cast("bigint")
        .alias("n_http_200"),
        F.sum("decode_errors").cast("bigint").alias("decode_errors_total"),
    )


# ---------------------------------------------------------------------------
# A24b: KMV distinct sketch, production (sketch-only) variant
# ---------------------------------------------------------------------------


def _a24b_oracle() -> str:
    from chronicle_sniffer_spark.plans.round11 import _LEHMER_A, _LEHMER_M, KMV_K

    return f"""
    WITH d AS (
      SELECT DISTINCT o_orderpriority,
             (o_custkey * {_LEHMER_A}) % {_LEHMER_M} AS h
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, h,
             row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
      FROM d
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_sketch,
           CAST(max(CASE WHEN rn = {KMV_K} THEN h END) AS BIGINT) AS kth_min,
           round(CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
                      ELSE ({KMV_K} - 1) * CAST({_LEHMER_M} AS DOUBLE)
                           / CAST(max(CASE WHEN rn = {KMV_K} THEN h END)
                                  AS DOUBLE) END, 6) AS kmv_est
    FROM ranked WHERE rn <= {KMV_K}
    GROUP BY o_orderpriority
    """


@query("a24b_kmv_production", section="A3", oracle=_a24b_oracle())
def a24b_kmv_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV sketch as a 100 TB job actually runs it — SKETCH ONLY:
    a24_kmv_distinct declares n_exact in its output for the oracle's
    benefit, and the round-12 sf10 spot showed exactly that branch
    (count distinct over 15M orders) dominating its wall at 5.64×.
    This variant drops it: per-batch pre-shuffle K-minima caps
    (nothing bigger than K rows per (group, batch) ever crosses the
    exchange), dedup, window-rank, ONE sketch-sized agg.  Groups with
    fewer than K distinct keys report their sketch size as the exact
    count (KMV is exact below K by construction: n_sketch < K means
    the sketch IS the distinct set).  The a24 merge-equivalence
    pytest remains the correctness anchor for the cap; the oracle
    here recomputes the same K-minima from scratch — the GATE pays
    the exact-distinct cost, the production plan never does."""
    from chronicle_sniffer_spark.plans.round11 import _LEHMER_M, KMV_K, _kmv_ranked

    _, ranked = _kmv_ranked(spark, sf_dir)
    sk = ranked.filter(F.col("rn") <= KMV_K)
    return sk.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_sketch"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("h")))
        .cast("bigint")
        .alias("kth_min"),
    ).select(
        "o_orderpriority",
        "n_sketch",
        "kth_min",
        F.round(
            F.when(
                F.col("n_sketch") < KMV_K, F.col("n_sketch").cast("double")
            ).otherwise(
                F.lit(KMV_K - 1)
                * F.lit(float(_LEHMER_M))
                / F.col("kth_min").cast("double")
            ),
            6,
        ).alias("kmv_est"),
    )
