"""Round-8 catalog additions, third wave.

Three more operators whose value is the distributed plan shape:

- **J15 dynamic partition pruning**: the fact side is STORED
  partitioned on the join key (a year column), the dim side carries a
  selective filter on a NON-key attribute — so the partitions to scan
  are only knowable at RUNTIME, after the dim filter executes.  Spark
  injects a ``dynamicpruningexpression`` into the fact scan's
  PartitionFilters (reusing the join's broadcast as the IN-list), so
  the fact table reads only the matching partition directories.  At
  100 TB this is the difference between scanning the whole fact table
  and scanning the 3 of 7 years the dim actually selected — the same
  runtime-filter machinery as Trino's dynamic filtering.
- **P18 SQL pipe syntax**: the full operator chain written in Spark
  4's pipe syntax (``FROM t |> WHERE |> EXTEND |> AGGREGATE … GROUP BY
  |> WHERE |> ORDER BY |> LIMIT``) — each ``|>`` stage lowers onto the
  same Catalyst operators as classic SQL (the oracle is the classic
  spelling; equality proves the lowering).
- **O12 threshold-pruned exact top-k**: exact per-group top-k where
  the heavy shuffle is pruned by a mergeable sketch.  A
  ``percentile_approx`` pass (map-side-combinable partial sketches —
  the ONLY full-data shuffle is sketch-sized) yields a per-group
  threshold; only rows above it enter the ranking window.  Soundness:
  if a group keeps >= k survivors, its true top-k all sit above the
  threshold, so pruning is lossless; groups that under-prune (the
  sketch cut too deep) fall back to ranking their FULL rows via an
  anti-join split — declaratively, in the same plan.  The oracle is
  the plain global window; equality proves exactness either way.

House determinism rules (plans/catalog.py) apply.
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import dsum, o_dsum, query
from chronicle_sniffer_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# J15: dynamic partition pruning
# ---------------------------------------------------------------------------

# (applicationId, sf_dir) -> (fact dir, dim dir): written once per
# session (the layout is a property of the stored table), reused across
# runs via the sf_dir-derived location.
_DPP_CACHE: dict[tuple[str, str], tuple[str, str]] = {}


def dpp_layout(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders partitioned by o_year (fact) plus a per-year dim
    table whose ``tier`` label is data, not a derivable expression —
    so a tier filter can only prune fact partitions at runtime."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DPP_CACHE:
        suf = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path or "/tmp"
        fact = os.path.join(wh, f"css_dpp_orders_{suf}")
        dim = os.path.join(wh, f"css_dpp_years_{suf}")
        orders = _t(spark, sf_dir, "orders")
        if not os.path.exists(os.path.join(fact, "_SUCCESS")):
            (
                orders.withColumn("o_year", F.year("o_orderdate"))
                .write.mode("overwrite")
                .partitionBy("o_year")
                .parquet(fact)
            )
        if not os.path.exists(os.path.join(dim, "_SUCCESS")):
            (
                orders.groupBy(F.year("o_orderdate").alias("yr"))
                .agg(F.count("*").alias("n_orders"))
                .withColumn(
                    "tier",
                    F.when(F.col("yr") % 2 == 0, F.lit("even")).otherwise(
                        F.lit("odd")
                    ),
                )
                .write.mode("overwrite")
                .parquet(dim)
            )
        _DPP_CACHE[key] = (fact, dim)
    return _DPP_CACHE[key]


_J15_ORACLE = f"""
WITH pick AS (
  SELECT year(o_orderdate) AS yr FROM orders
  GROUP BY 1 HAVING yr % 2 = 0
)
SELECT CAST(f.yr AS INT) AS o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       {o_dsum("f.o_totalprice", "sum_price")}
FROM (SELECT year(o_orderdate) AS yr, o_totalprice FROM orders) f
JOIN pick ON f.yr = pick.yr
GROUP BY 1
"""


@query("j15_dynamic_partition_pruning", section="J1", oracle=_J15_ORACLE)
def j15_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join where the fact partitions to read are decided at
    RUNTIME by the dim filter (dynamic partition pruning).

    The fact table is stored partitioned by ``o_year``; the dim filter
    is on ``tier`` — a stored label the optimizer cannot rewrite into a
    static partition predicate (had the filter been on the join key
    itself, constraint propagation would fold it statically and prove
    nothing).  Spark plans the join as a broadcast hash join and REUSES
    the broadcasted dim as a ``dynamicpruningexpression`` IN-filter on
    the fact scan's PartitionFilters — asserted in
    tests/test_round8c.py — so only the selected year directories are
    listed and read.  At 100 TB, partition elimination at the directory
    level is the first and cheapest filter in the whole plan; this is
    the Spark-native equivalent of Trino/Hive dynamic filtering, and it
    composes with the manifest pruning of s13 (stats inside a
    partition) one level down.
    """
    fact_dir, dim_dir = dpp_layout(spark, sf_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("tier") == "even")
    return (
        fact.join(dim, fact.o_year == dim.yr)
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# P18: SQL pipe syntax
# ---------------------------------------------------------------------------

_P18_ORACLE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_quantity > 10
GROUP BY l_returnflag
HAVING count(*) > 100
ORDER BY l_returnflag
LIMIT 10
"""


@query("p18_pipe_syntax", section="P1", oracle=_P18_ORACLE)
def p18_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax: the same logical chain as classic
    SELECT/WHERE/GROUP BY/HAVING/ORDER BY/LIMIT, written as sequential
    ``|>`` stages.  Each stage lowers onto the identical Catalyst
    operator (the post-AGGREGATE ``|> WHERE`` is HAVING; ``|> EXTEND``
    is a projection) — the classic-SQL oracle matching bit-for-bit
    proves the lowering, and the physical plan is byte-identical to the
    classic spelling, so every pushdown/pruning property is preserved.
    """
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
FROM lineitem
|> WHERE l_quantity > 10
|> EXTEND CAST(l_extendedprice AS DECIMAL(18,4)) AS pd
|> AGGREGATE CAST(count(*) AS BIGINT) AS n_items,
             CAST(SUM(pd) AS DOUBLE) AS sum_price
   GROUP BY l_returnflag
|> WHERE n_items > 100
|> ORDER BY l_returnflag
|> LIMIT 10
"""
    )


# ---------------------------------------------------------------------------
# O12: threshold-pruned exact top-k
# ---------------------------------------------------------------------------

_O12_K = 5
_O12_P = 0.99  # approx-quantile cut: keep ~top 1% as ranking candidates

_O12_ORACLE = f"""
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
  FROM events
)
SELECT event_type, CAST(rk AS INT) AS rk, event_id, value
FROM r WHERE rk <= {_O12_K}
"""


@query("o12_threshold_topk", section="O4", oracle=_O12_ORACLE)
def o12_threshold_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group top-k with the ranking shuffle pruned by a
    mergeable quantile sketch.

    The naive plan shuffles EVERY row into the per-group ranking
    window.  Here the only full-data pass is ``percentile_approx`` —
    whose partial state is a fixed-size sketch, merged map-side, so the
    shuffle is sketch-sized, not data-sized.  Rows below the per-group
    ~p99 threshold are dropped before the window; if the true top-k
    all sit above the threshold (guaranteed whenever a group keeps
    >= k survivors), pruning is lossless.  Groups where the sketch cut
    too deep (< k survivors — the smoke-sf case) fall back to ranking
    their FULL rows, selected declaratively with a broadcast anti-join
    split, in the same plan: correctness never depends on the sketch's
    accuracy, only the pruning RATE does.  The oracle ranks everything
    the classic way; equality proves exactness on both code paths.

    Scale shape: at 100 TB the window input shrinks ~100x (p99) while
    staying exact; thresholds/ok-lists are group-cardinality-sized and
    broadcast.  The same skeleton serves any "exact extremes at scale"
    need (top-k, exact percentile tails, trimmed means).
    """
    K = _O12_K
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    thr = ev.groupBy("event_type").agg(
        F.percentile_approx("value", _O12_P, 10000).alias("thr")
    )
    surv = ev.join(F.broadcast(thr), "event_type").filter(
        F.col("value") >= F.col("thr")
    )
    ok = (
        surv.groupBy("event_type")
        .agg(F.count("*").alias("n_surv"))
        .filter(F.col("n_surv") >= K)
        .select("event_type")
    )
    pruned = surv.join(F.broadcast(ok), "event_type", "semi").select(
        "event_type", "event_id", "value"
    )
    fallback = ev.join(F.broadcast(ok), "event_type", "anti")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        pruned.unionByName(fallback)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .select("event_type", "rk", "event_id", "value")
    )
