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
