"""A3/A4 approximate aggregates: approx results within tolerance of
exact (the sketch path used at 100 TB where exact percentiles would
require a full sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronicle_sniffer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_approx_percentile_within_tolerance(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 1000).alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("exact"),
    ).collect()[0]
    for a, e in zip(row.approx, row.exact):
        assert abs(a - e) / e < 0.02  # within 2%


def test_approx_count_distinct_within_tolerance(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05
