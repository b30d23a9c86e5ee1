"""Round-8 catalog additions, second wave.

Continues the round-8 build (plans/round8.py) with operators whose
whole point is the *distributed plan shape*, not just the answer:

- **J14 bucketed range join**: interval-overlap join with NO shared
  equi key.  The naive plan is a BroadcastNestedLoop / theta join —
  O(|A|x|B|) compares, the classic 100 TB killer.  The scalable shape
  maps each interval to the fixed-width time buckets it spans
  (``explode(sequence(...))``), equi-joins on the bucket id (a plain
  shuffle hash join), re-checks the exact overlap predicate, and
  de-duplicates WITHOUT a distinct shuffle by counting each pair only
  in the first bucket both intervals share (``bucket ==
  floor(greatest(a_start, b_start) / W)``).  Candidate volume is
  O(n x span/W) instead of O(n^2).  This is the same decomposition
  Databricks' range-join hint and Flink's interval join use.
- **A19 equi-depth histogram**: exact NTILE(k) semantics with NO
  global single-task window.  ``repartitionByRange`` gives a total
  order across partitions; per-partition counts become starting
  offsets via a tiny broadcast triangle join (P rows); the global row
  number is then a per-partition window (parallel) plus the offset,
  and the standard-SQL NTILE bucket formula (first N%k buckets one
  element larger) is applied arithmetically.  The oracle runs DuckDB's
  native ``ntile(8)`` — matching it exactly proves the distributed
  formulation implements the standard semantics.
- **TS11 seasonal profile**: hour-of-day baseline per event type plus
  the max absolute residual against that baseline — the relational
  core of seasonal-naive anomaly detection.  Two passes over events:
  one shuffle aggregate for the baseline (24 x |types| rows), then a
  broadcast join back and a second aggregate for the residuals.  The
  baseline average goes through exact decimal arithmetic (house rule)
  so the residual subtraction is bit-identical on both engines.

House determinism rules (plans/catalog.py) apply: identical aliases
both engines, money math in exact decimal, ties fully keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import davg, dsum, o_davg, o_dsum, query
from chronicle_sniffer_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# J14: bucketed range join (interval overlap, no equi key)
# ---------------------------------------------------------------------------

_J14_WINDOW_DAYS = 10  # each order "covers" [orderdate, orderdate + 10d]
_J14_BUCKET_DAYS = 16  # bucket width: ceil(window/W) + 1 <= 2 buckets/interval

_J14_ORACLE = f"""
WITH a AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS a_month,
         CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS s
  FROM orders WHERE o_orderpriority = '1-URGENT'
), b AS (
  SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS s
  FROM orders WHERE o_orderpriority = '5-LOW'
)
SELECT a.a_month,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM a JOIN b
  ON a.s <= b.s + {_J14_WINDOW_DAYS}
 AND b.s <= a.s + {_J14_WINDOW_DAYS}
GROUP BY a.a_month
"""


@query("j14_bucketed_range_join", section="J6", oracle=_J14_ORACLE)
def j14_bucketed_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join with no equi key, decomposed into an
    equi join on fixed-width time buckets.

    Counts pairs of (urgent, low-priority) orders whose 10-day windows
    overlap, grouped by the urgent order's month.  The reference's
    query surface has range predicates only riding an equi key
    (j9_interval); this is the general case — the one that degenerates
    to a nested-loop cross product unless decomposed.

    Scale shape: each interval spans at most
    ``ceil(window/bucket) + 1 = 2`` buckets, so the exploded inputs
    are ~2x their source size; the join is a plain shuffle hash join
    on the bucket id; the first-common-bucket filter
    (``bucket == floor(greatest(s_a, s_b) / W)``) makes each
    qualifying pair appear exactly once with NO distinct/dedup
    shuffle.  Candidate pairs per bucket are bounded by the data
    density per W days — at 1000 executors the buckets hash-spread
    evenly and no task ever sees the O(n^2) cross product.
    """
    W = _J14_BUCKET_DAYS
    orders = _t(spark, sf_dir, "orders")
    day = (F.unix_timestamp("o_orderdate") / 86400).cast("bigint")

    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("a_month"),
        day.alias("a_s"),
    )
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select(day.alias("b_s"))

    ae = a.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("a_s") / W),
                F.floor((F.col("a_s") + _J14_WINDOW_DAYS) / W),
            )
        ),
    )
    be = b.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("b_s") / W),
                F.floor((F.col("b_s") + _J14_WINDOW_DAYS) / W),
            )
        ),
    )
    overlap = (F.col("a_s") <= F.col("b_s") + _J14_WINDOW_DAYS) & (
        F.col("b_s") <= F.col("a_s") + _J14_WINDOW_DAYS
    )
    first_common = F.col("bucket") == F.floor(F.greatest("a_s", "b_s") / W)
    return (
        ae.join(be, "bucket")
        .filter(overlap & first_common)
        .groupBy("a_month")
        .agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# A19: equi-depth histogram (distributed NTILE)
# ---------------------------------------------------------------------------

_A19_K = 8

_A19_ORACLE = f"""
WITH r AS (
  SELECT l_extendedprice AS p,
         ntile({_A19_K}) OVER (
           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
  FROM lineitem
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(p) AS min_price,
       max(p) AS max_price,
       {o_dsum("p", "sum_price")}
FROM r GROUP BY bucket
"""


@query("a19_equidepth_histogram", section="A8", oracle=_A19_ORACLE)
def a19_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (NTILE) histogram over lineitem prices with no
    single-task global window.

    The textbook formulation — ``ntile(k) OVER (ORDER BY ...)`` — is a
    global sort into ONE task; at 100 TB that task is the job.  This
    plan reproduces exact NTILE semantics fully partition-parallel:

    1. ``repartitionByRange`` on the (fully tie-keyed) sort key — a
       range-partitioned parallel sort, the same machinery ORDER BY
       uses, but kept partitioned;
    2. per-partition counts (P rows) -> starting offsets via a
       broadcast triangle join, the same window-free pattern as
       l6_token_budget_select (coverage5.py:393);
    3. global row number = per-partition ``row_number()`` (a window
       PARTITIONED by pid — parallel) + offset;
    4. the standard NTILE formula applied arithmetically: with
       N rows and k buckets, the first N%k buckets hold N//k+1 rows.

    Matching DuckDB's native ntile() bit-for-bit proves the
    distributed formulation implements the standard semantics.
    """
    K = _A19_K
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("p"), "l_orderkey", "l_linenumber"
    )
    npart = max(spark.sparkContext.defaultParallelism, 2)
    keys = [F.col("p"), F.col("l_orderkey"), F.col("l_linenumber")]
    parted = li.repartitionByRange(npart, *keys).withColumn(
        "pid", F.spark_partition_id()
    )
    pc = parted.groupBy("pid").agg(F.count("*").alias("pcnt"))
    offsets = (
        pc.alias("a")
        .join(F.broadcast(pc.alias("b")), F.col("b.pid") < F.col("a.pid"), "left")
        .groupBy(F.col("a.pid").alias("pid"))
        .agg(F.coalesce(F.sum("b.pcnt"), F.lit(0)).cast("bigint").alias("offset"))
    )
    total = pc.agg(F.sum("pcnt").cast("bigint").alias("n_total"))
    rn = F.col("offset") + F.row_number().over(
        Window.partitionBy("pid").orderBy(*keys)
    )
    big = F.col("n_total") % K  # number of one-larger buckets
    size_big = (F.col("n_total") / K).cast("bigint") + 1
    size_small = (F.col("n_total") / K).cast("bigint")
    in_big = F.col("rn") <= big * size_big
    bucket = F.when(
        in_big, ((F.col("rn") - 1) / size_big).cast("bigint")
    ).otherwise(
        big + ((F.col("rn") - big * size_big - 1) / size_small).cast("bigint")
    ) + 1
    return (
        parted.join(F.broadcast(offsets), "pid")
        .withColumn("rn", rn)
        .crossJoin(F.broadcast(total))
        .withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("p").alias("min_price"),
            F.max("p").alias("max_price"),
            dsum("p", "sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# TS11: seasonal profile + residual anomaly bound
# ---------------------------------------------------------------------------

_TS11_ORACLE = f"""
WITH base AS (
  SELECT event_type,
         CAST(extract(hour FROM ts) AS INT) AS hr,
         CAST(count(*) AS BIGINT) AS n_events,
         {o_davg("value", "avg_value")}
  FROM events GROUP BY 1, 2
)
SELECT b.event_type, b.hr, b.n_events, b.avg_value,
       max(abs(e.value - b.avg_value)) AS max_abs_residual
FROM events e
JOIN base b
  ON e.event_type = b.event_type
 AND CAST(extract(hour FROM e.ts) AS INT) = b.hr
GROUP BY b.event_type, b.hr, b.n_events, b.avg_value
"""


@query("ts11_seasonal_profile", section="TS1", oracle=_TS11_ORACLE)
def ts11_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline per event type, plus the maximum
    absolute residual of any event against its baseline cell — the
    relational core of seasonal-naive anomaly detection.

    Scale shape: one shuffle aggregate builds the baseline (at most
    24 x |event types| rows — dimension-sized at ANY corpus scale),
    then the baseline broadcast-joins back onto events and a second
    shuffle aggregate computes the residual bound.  The baseline
    average uses exact decimal summation (house rule) so the
    double subtraction ``value - avg_value`` is bit-identical across
    engines; abs/max are order-independent.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr"), "value"
    )
    base = e.groupBy("event_type", "hr").agg(
        F.count("*").alias("n_events"), davg("value", "avg_value")
    )
    return (
        e.join(F.broadcast(base), ["event_type", "hr"])
        .groupBy("event_type", "hr", "n_events", "avg_value")
        .agg(F.max(F.abs(F.col("value") - F.col("avg_value"))).alias("max_abs_residual"))
    )
