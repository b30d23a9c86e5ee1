"""Every catalog plan must be free of UNBOUNDED global windows
(tools/audit_windows.py): an empty — or all-literal — partitionSpec
moves every input row to one task, which is only acceptable over a
relation already bounded by an Aggregate/Limit/literal input.  The
round-8 gate logged ~30 benign 'No Partition Defined' warnings, all
over dimension-sized post-agg relations; this lint keeps the 31st
benign too."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_no_plan_contains_unbounded_global_window(spark):
    from chronicle_sniffer_spark.plans import registry
    from tools.audit_windows import SF_DIR, find_unbounded_global_windows

    bad: list[tuple[str, str]] = []
    for name, spec in sorted(registry().items()):
        df = spec.spark_fn(spark, SF_DIR)
        hits = find_unbounded_global_windows(df._jdf.queryExecution().optimizedPlan())
        bad.extend((name, h) for h in hits)
    assert not bad, bad


def test_audit_detects_the_violations_it_exists_for(spark):
    """The lint must not be vacuous: a global window over a raw scan —
    bare or disguised behind a literal partition key — is flagged; the
    same window post-agg or key-partitioned is not."""
    from tools.audit_windows import find_unbounded_global_windows as find

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    def hits(df):
        return find(df._jdf.queryExecution().optimizedPlan())

    w_global = Window.partitionBy().orderBy("l_orderkey")
    w_lit = Window.partitionBy(F.lit(0)).orderBy("l_orderkey")
    assert hits(li.withColumn("rn", F.row_number().over(w_global)))
    assert hits(li.withColumn("rn", F.row_number().over(w_lit)))

    agg = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    w_n = Window.partitionBy().orderBy("n")
    assert not hits(agg.withColumn("rn", F.row_number().over(w_n)))
    w_key = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    assert not hits(li.withColumn("rn", F.row_number().over(w_key)))
    # a join that mixes an agg with a raw scan is unbounded again
    joined = agg.join(li.select("l_returnflag", "l_quantity"), "l_returnflag")
    assert hits(joined.withColumn("rn", F.row_number().over(w_n)))


def test_empirical_layer_flags_corpus_tracking_aggregate(spark):
    """The round-13 loophole: a global window over an Aggregate whose
    group key is near-row-cardinality (ml27's original distinct-cents
    cumsum) passed the structural rule.  The EMPIRICAL layer counts
    the window input at two SFs and must FAIL that shape, while a
    fixed-bucket histogram (bounded group domain) passes."""
    from tools.audit_windows import measure_conditional_windows

    def old_ml27_shape(spark, sf_dir):
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        v = (
            o.select(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .alias("cents")
            )
            .groupBy("cents")
            .agg(F.count("*").cast("bigint").alias("t"))
        )
        w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
        return v.select(F.coalesce(F.sum("t").over(w), F.lit(0)).alias("before"))

    assert measure_conditional_windows(spark, old_ml27_shape)

    def bucketed_shape(spark, sf_dir):
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        v = (
            o.select(
                F.expr("CAST(o_totalprice AS BIGINT) div 10000").alias("bkt")
            )
            .groupBy("bkt")
            .agg(F.count("*").cast("bigint").alias("t"))
        )
        w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
        return v.select(F.coalesce(F.sum("t").over(w), F.lit(0)).alias("off"))

    assert not measure_conditional_windows(spark, bucketed_shape)


def test_rewritten_ml27_is_empirically_bounded(spark):
    """The shipped ml27 two-phase form's only remaining global window
    runs over the ≤~60-row bucket-offset aggregate — the measuring
    layer must wave it through."""
    from chronicle_sniffer_spark.plans.round13 import ml27_mann_whitney_u
    from tools.audit_windows import measure_conditional_windows

    assert not measure_conditional_windows(spark, ml27_mann_whitney_u)
