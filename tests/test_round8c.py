"""Plan-shape/property tests for the round-8 third-wave operators
(oracle parity runs via the auto-parametrized tests/test_catalog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_j15_injects_dynamic_pruning(spark):
    """The fact scan must carry a dynamicpruningexpression partition
    filter (runtime pruning from the dim side), and only even-year
    partitions may be read."""
    from chronicle_sniffer_spark.plans.round8c import (
        j15_dynamic_partition_pruning,
    )

    df = j15_dynamic_partition_pruning(spark, SF_SMOKE)
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower()
    rows = df.collect()
    years = {r.o_year for r in rows}
    assert years and all(y % 2 == 0 for y in years)


def test_j15_pruned_partitions_never_read(spark, tmp_path):
    """Behavioral proof of directory-level pruning: corrupt an odd-year
    partition file in a throwaway layout — the dim-filtered join still
    succeeds (the pruned scan never opens it) while a full scan fails.
    (df.inputFiles() can't show this: it lists the STATIC file index,
    before the runtime filter executes.)"""
    import glob
    import os

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    fact = str(tmp_path / "fact")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(fact)
    )
    dim = (
        orders.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.count("*").alias("n_orders"))
        .withColumn(
            "tier",
            F.when(F.col("yr") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
        )
    )
    victims = glob.glob(os.path.join(fact, "o_year=1995", "*.parquet"))
    assert victims
    for v in victims:
        with open(v, "wb") as fh:
            fh.write(b"not a parquet file")
    schema = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string, o_year int"
    scan = spark.read.schema(schema).parquet(fact)
    pruned = (
        scan.join(dim.filter(F.col("tier") == "even"), scan.o_year == F.col("yr"))
        .groupBy("o_year")
        .agg(F.count("*").alias("n"))
    )
    got = {(r.o_year, r.n) for r in pruned.collect()}  # must NOT touch 1995
    expect = {
        (r.yr, r.n_orders)
        for r in dim.filter(F.col("tier") == "even").collect()
    }
    assert got == expect
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):  # full scan DOES open the corrupt file
        spark.read.schema(schema).parquet(fact).count()


def test_p18_pipe_plan_equals_classic_sql(spark):
    """Every |> stage must lower onto the same Catalyst operators as
    the classic spelling: the optimized logical plans are identical."""
    from chronicle_sniffer_spark.plans.round8c import p18_pipe_syntax

    piped = p18_pipe_syntax(spark, SF_SMOKE)
    # the classic spelling of the SAME stages (|> EXTEND is the inner
    # projection; the post-AGGREGATE |> WHERE is HAVING)
    classic = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n_items,
               CAST(SUM(pd) AS DOUBLE) AS sum_price
        FROM (SELECT l_returnflag,
                     CAST(l_extendedprice AS DECIMAL(18,4)) AS pd
              FROM lineitem WHERE l_quantity > 10)
        GROUP BY l_returnflag
        HAVING count(*) > 100
        ORDER BY l_returnflag
        LIMIT 10
        """
    )
    canon_piped = piped._jdf.queryExecution().optimizedPlan().canonicalized()
    canon_classic = classic._jdf.queryExecution().optimizedPlan().canonicalized()
    assert canon_piped.toString() == canon_classic.toString()


def test_o12_both_paths_exact(spark):
    """The threshold-pruned plan must be exact on BOTH code paths: at
    smoke scale groups under-prune (< k survivors -> full fallback);
    forcing a loose cut exercises the pruned path.  Both must equal the
    plain global window."""
    from chronicle_sniffer_spark.plans import round8c
    from chronicle_sniffer_spark.plans.round8c import _O12_K, o12_threshold_topk

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    expect = {
        (r.event_type, r.rk, r.event_id, r.value)
        for r in ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _O12_K)
        .select("event_type", "rk", "event_id", "value")
        .collect()
    }

    got = {
        (r.event_type, r.rk, r.event_id, r.value)
        for r in o12_threshold_topk(spark, SF_SMOKE).collect()
    }
    assert got == expect

    # per-type counts at smoke scale: ~66 rows/type, p99 keeps < k=5
    # survivors -> the fallback path ran above.  Now force the pruned
    # path with a loose quantile and re-check exactness.
    orig = round8c._O12_P
    try:
        round8c._O12_P = 0.5
        got_loose = {
            (r.event_type, r.rk, r.event_id, r.value)
            for r in o12_threshold_topk(spark, SF_SMOKE).collect()
        }
    finally:
        round8c._O12_P = orig
    assert got_loose == expect


def test_j16_deletes_applied_and_broadcast(spark):
    """Merge-on-read must drop exactly the union of positional and
    equality deletes (overlap counted once), the positional delete file
    must store physical coordinates, and both anti-joins must
    broadcast."""
    from chronicle_sniffer_spark.plans.round8c import j16_merge_on_read, mor_layout

    base, posd, eqd = mor_layout(spark, SF_SMOKE)
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_total = orders.count()
    n_dead = orders.filter(
        (F.col("o_orderkey") % 97 == 0) | (F.col("o_custkey") % 89 == 0)
    ).count()
    df = j16_merge_on_read(spark, SF_SMOKE)
    rows = df.collect()
    assert sum(r.n_rows for r in rows) == n_total - n_dead
    pos = spark.read.parquet(posd)
    assert set(pos.columns) == {"file_path", "row_index"}
    assert pos.count() > 0 and pos.select("file_path").distinct().count() > 1
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "LeftAnti" in plan


def test_l6_temperature_mix_upsamples_tail(spark):
    """Quotas must sum exactly to the budget (largest-remainder), every
    quota must be met, and temperature alpha=0.5 must move shares
    toward uniform: tail languages get a HIGHER share than their corpus
    share, the head language a LOWER one."""
    from chronicle_sniffer_spark.plans.round8c import (
        _L6T_BUDGET,
        l6_temperature_mix,
    )

    rows = l6_temperature_mix(spark, SF_SMOKE).collect()
    assert sum(r.target_docs for r in rows) == _L6T_BUDGET
    assert all(r.n_selected == r.target_docs for r in rows)
    n_corpus = sum(r.n_docs for r in rows)
    head = max(rows, key=lambda r: r.n_docs)
    for r in rows:
        corpus_share = r.n_docs / n_corpus
        quota_share = r.target_docs / _L6T_BUDGET
        if r.lang == head.lang:
            assert quota_share < corpus_share
        else:
            assert quota_share > corpus_share


def test_ml7_bins_partition_the_corpus(spark):
    """Bin counts must sum to the corpus, probabilities must respect
    their bin's [bin/10, (bin+1)/10) range, and frac_pos must be a
    valid rate."""
    from chronicle_sniffer_spark.plans.round8c import ml7_calibration_curve

    rows = ml7_calibration_curve(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.frac_pos <= 1
        assert r.bin / 10 <= r.min_p <= r.max_p
        if r.bin < 9:
            assert r.max_p < (r.bin + 1) / 10
