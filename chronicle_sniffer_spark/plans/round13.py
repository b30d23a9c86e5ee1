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
