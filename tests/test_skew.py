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


def test_salted_join_skew_path_engages(spark):
    """The a10b catalog entry's skew mitigation must actually engage:
    the physical join keys include the salt (so the hot key hashes to
    n_salts different reducers), the join is NOT a broadcast (a
    broadcast join has no skew to solve), and the hot key's fact rows
    really spread across every salt."""
    from chronicle_sniffer_spark.operators.skew import _salt

    li = load_table(spark, SF_SMOKE, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0))
        .otherwise(F.col("l_orderkey") % 100)
        .cast("bigint")
        .alias("hot_key"),
        "l_orderkey",
        "l_extendedprice",
    )
    dim = (
        load_table(spark, SF_SMOKE, "part")
        .groupBy((F.col("p_partkey") % 100).alias("hot_key"))
        .agg(F.count("*").alias("dim_n"))
        .hint("shuffle_hash")
    )
    joined = salted_join(fact, dim, key="hot_key", salt_on="l_orderkey", n_salts=8)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_lines = [ln for ln in plan.split("\n") if "Join" in ln and "hot_key" in ln]
    assert join_lines, f"no join on hot_key in plan:\n{plan}"
    assert all("_salt" in ln for ln in join_lines), f"salt not in join keys:\n{join_lines}"
    assert "BroadcastHashJoin" not in plan, "skew demo must not broadcast the dim"
    # the hot key (~70% of rows) spreads across ALL salts
    spread = (
        fact.filter(F.col("hot_key") == 0)
        .withColumn("_salt", _salt(F.col("l_orderkey"), 8))
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(spread) == 8, f"hot key landed on only {len(spread)} salts"
    counts = [r["count"] for r in spread]
    assert max(counts) < sum(counts), "one salt still owns the whole hot key"
