"""Round-8 catalog additions, fifth wave.

- **J17 null-safe join**: equi join under ``<=>`` semantics (NULL
  matches NULL).  The naive workaround — ``ON a.k = b.k OR (a.k IS
  NULL AND b.k IS NULL)`` — is NOT an equi predicate, so it degrades
  to a nested-loop join; Spark's ``eqNullSafe`` stays a hash-keyed
  equi join (NULL hashes like any other key value), which is the
  difference between a shuffle join and an O(n·m) disaster at 100 TB.
  Plan-asserted.  Oracle: ``IS NOT DISTINCT FROM``.
- **TS13 M4 downsampling**: the min/max/first/last-per-pixel-bucket
  operator every large-scale time-series UI uses (M4): one hash
  aggregate, every measure order-independent (first/last are lexicographic
  struct-min/max under the total key (ts, event_id), not
  position-dependent).
  Contrast with LTTB, which is inherently sequential — M4 is the
  downsampler you can run on 100 TB.
- **A20 multi-distinct expand**: several exact COUNT(DISTINCT …) over
  DIFFERENT columns in ONE aggregate.  Spark compiles this to a single
  Expand (one pass over the fact table, one row replica per distinct
  clause) instead of N separate scans + self-joins — asserted in the
  plan.  At 100 TB, one Expand pass vs N full passes is the win.

House determinism rules (plans/catalog.py) apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import dsum, o_dsum, query
from chronicle_sniffer_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# J17: null-safe equi join
# ---------------------------------------------------------------------------

_J17_ORACLE = f"""
WITH f AS (
  SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS k, o_totalprice FROM orders
), d AS (
  SELECT k, CAST(count(*) AS BIGINT) AS grp_total FROM f GROUP BY k
)
SELECT f.k AS prio_key, d.grp_total,
       CAST(count(*) AS BIGINT) AS n_orders,
       {o_dsum("f.o_totalprice", "sum_price")}
FROM f JOIN d ON f.k IS NOT DISTINCT FROM d.k
GROUP BY 1, 2
"""


@query("j17_null_safe_join", section="J1", oracle=_J17_ORACLE)
def j17_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on a NULLABLE key with null-safe equality: the NULL group
    joins to the NULL dim row instead of silently dropping (a plain
    equi join loses every NULL-key row — here ~20% of the fact table).

    The key scale point: ``eqNullSafe`` is still an EQUI predicate —
    NULL hashes like any other key, so the join stays a hash/sort-merge
    shuffle join (plan-asserted: no nested loop).  The classic manual
    rewrite ``a.k = b.k OR (a.k IS NULL AND b.k IS NULL)`` is a theta
    predicate and degenerates to BroadcastNestedLoop — the 100 TB trap
    this entry exists to document.  Note the flip side: null-safe
    equality makes the NULL group a single join key, so a mostly-NULL
    column becomes a skew hotspot (the A10 salting pattern applies).
    """
    o = _t(spark, sf_dir, "orders")
    f = o.select(
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("k"),
        "o_totalprice",
    )
    d = f.groupBy("k").agg(F.count("*").alias("grp_total")).withColumnRenamed(
        "k", "dk"
    )
    return (
        f.join(d, f.k.eqNullSafe(d.dk))
        .groupBy(F.col("k").alias("prio_key"), F.col("grp_total"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# TS13: M4 time-series downsampling
# ---------------------------------------------------------------------------

_TS13_BUCKET_US = 3600 * 1_000_000  # one "pixel" = one hour

_TS13_ORACLE = f"""
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
         event_id, value
  FROM events
)
SELECT event_type,
       CAST(ts_us // {_TS13_BUCKET_US} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       min(value) AS min_v,
       max(value) AS max_v,
       (min({{'t': ts_us, 'i': event_id, 'v': value}})).v AS first_v,
       (max({{'t': ts_us, 'i': event_id, 'v': value}})).v AS last_v
FROM e
GROUP BY 1, 2
"""


@query("ts13_m4_downsample", section="TS1", oracle=_TS13_ORACLE)
def ts13_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling: per (series, time-pixel) keep min, max, first
    and last — the lossless-for-rendering reduction every large-scale
    time-series UI applies before plotting (a line through M4 points is
    pixel-identical to the full-resolution line).

    Scale shape: ONE hash aggregate; all four measures are
    order-independent (first/last are lexicographic struct-min/max under
    the TOTAL key ``(ts_us, event_id)``, never "first row seen"), so the aggregate is
    map-side combinable and associative across any partitioning —
    unlike LTTB, whose point selection is inherently sequential.
    Output is O(series × pixels) regardless of input volume: the right
    operator to put in front of a dashboard reading 100 TB of metrics.
    """
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    key = F.struct(
        F.col("ts_us").alias("t"), F.col("event_id").alias("i"), F.col("value").alias("v")
    )
    return (
        e.select("event_type", us.alias("ts_us"), "event_id", "value")
        .groupBy(
            "event_type",
            F.floor(F.col("ts_us") / _TS13_BUCKET_US).cast("bigint").alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.min(key).getField("v").alias("first_v"),
            F.max(key).getField("v").alias("last_v"),
        )
    )


# ---------------------------------------------------------------------------
# A20: multi-column exact distinct in one pass (Expand)
# ---------------------------------------------------------------------------

_A20_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("a20_multi_distinct_expand", section="A2", oracle=_A20_ORACLE)
def a20_multi_distinct_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three exact COUNT(DISTINCT) over THREE different columns plus a
    plain count, in one aggregate.

    Spark compiles multiple distinct clauses into a single **Expand**
    operator — each input row is replicated once per distinct clause
    with the irrelevant columns nulled, then one two-level aggregate
    dedups and counts all clauses together (plan-asserted in
    tests/test_round8d.py).  The alternative — N separate
    distinct-aggregates stitched with self-joins — scans the fact table
    N times and shuffles it N times.  The Expand trades a constant
    row-replication factor for single-pass execution: at 100 TB,
    3 extra in-memory replicas beat 3 extra full scans+shuffles by the
    width of the table.  (When approximate answers suffice, A3's HLL
    sketches drop even the replication; this entry is the EXACT path.)
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count("*").alias("n_rows"),
    )
