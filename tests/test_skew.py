"""Skew-mitigation operators: salted aggregate / join equal their
unsalted plans; salts are deterministic (retry-safe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronicle_sniffer_spark.operators.skew import salted_aggregate, salted_join
from chronicle_sniffer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _sorted(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_aggregate_equals_plain(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    salted = salted_aggregate(
        o.withColumn("price_dec", F.col("o_totalprice").cast("decimal(18,2)")),
        keys=["o_orderpriority"],
        salt_on="o_orderkey",
        n_salts=16,
        sums={"price_dec": "total_price"},
    )
    plain = o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_price"),
        F.count("*").alias("n"),
    )
    assert _sorted(salted, "o_orderpriority", "total_price", "n") == _sorted(
        plain, "o_orderpriority", "total_price", "n"
    )


def test_salted_join_equals_plain(spark):
    c = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    dim = n.withColumnRenamed("n_nationkey", "c_nationkey")
    salted = salted_join(c, dim, key="c_nationkey", salt_on="c_custkey", n_salts=8)
    plain = c.join(dim, "c_nationkey", "inner")
    assert _sorted(salted, "c_custkey", "n_name") == _sorted(plain, "c_custkey", "n_name")
    # deterministic: same result twice (no rand() in the salt)
    again = salted_join(c, dim, key="c_nationkey", salt_on="c_custkey", n_salts=8)
    assert _sorted(salted, "c_custkey", "n_name") == _sorted(again, "c_custkey", "n_name")
