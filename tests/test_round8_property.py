"""Property tests (hypothesis) for the round-8 distributed-plan
algorithms whose correctness rests on a non-obvious decomposition:

- interval union by running-max-of-end (ts12's shape): random
  variable-length interval sets, including duplicates, containment,
  and exact-touch adjacency;
- threshold-pruned exact top-k (o12's shape): random skew, random
  quantile cuts — the fallback split must keep the result exact for
  EVERY pruning rate;
- seam-safe sequence-gap detection (o16's shape): random punctured id
  sets across adversarial partition counts — partition seams must
  neither lose nor invent gaps.

Each example rebuilds the same plan shape as the catalog entry on an
in-memory frame and checks it against a python model.  One Spark
action per example is expensive, so examples are few but end-to-end.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_SET = dict(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 25)),  # (start, length)
    min_size=1,
    max_size=14,
)


@settings(**_SET)
@given(ivs=intervals)
def test_interval_union_running_max(spark, ivs):
    rows = [(1, s, s + ln) for s, ln in ivs]
    df = spark.createDataFrame(rows, "user_id int, s long, en long")
    order = [F.col("s"), F.col("en")]
    prev = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = df.withColumn(
        "flag",
        F.when(
            F.col("s") > F.coalesce(F.max("en").over(prev), F.lit(-(2**63) + 1)), 1
        ).otherwise(0),
    )
    isl = (
        marked.withColumn("island", F.sum("flag").over(run))
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("i_start"), F.max("en").alias("i_end"))
    )
    got = sorted((r.i_start, r.i_end) for r in isl.collect())

    merged: list[list[int]] = []
    for s, e in sorted((s, s + ln) for s, ln in ivs):
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    assert got == [tuple(m) for m in merged]


@settings(**_SET)
@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    k=st.integers(1, 5),
    frac=st.floats(0.05, 0.95),
)
def test_threshold_topk_exact_for_any_cut(spark, vals, k, frac):
    rows = [(i % 3, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, id long, v double")
    thr = df.groupBy("g").agg(F.percentile_approx("v", frac, 100).alias("thr"))
    surv = df.join(F.broadcast(thr), "g").filter(F.col("v") >= F.col("thr"))
    ok = (
        surv.groupBy("g")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= k)
        .select("g")
    )
    pruned = surv.join(F.broadcast(ok), "g", "semi").select("g", "id", "v")
    fb = df.join(F.broadcast(ok), "g", "anti")
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    got = {
        (r.g, r.rk, r.id)
        for r in pruned.unionByName(fb)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    }
    by_g: dict = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((-v, i))
    expect = set()
    for g, items in by_g.items():
        for rk, (_, i) in enumerate(sorted(items)[:k], 1):
            expect.add((g, rk, i))
    assert got == expect


@settings(**_SET)
@given(
    ids=st.sets(st.integers(0, 120), min_size=2, max_size=40),
    npart=st.integers(2, 9),
)
def test_sequence_gaps_survive_any_partitioning(spark, ids, npart):
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    parted = df.repartitionByRange(npart, "id").withColumn(
        "pid", F.spark_partition_id()
    )
    w = Window.partitionBy("pid").orderBy("id")
    inner = parted.withColumn("nxt", F.lead("id").over(w))
    bounds = parted.groupBy("pid").agg(
        F.min("id").alias("p_min"), F.max("id").alias("p_max")
    )
    nxt_part = bounds.select(
        (F.col("pid") - 1).alias("pid"), F.col("p_min").alias("nxt")
    )
    seams = bounds.join(F.broadcast(nxt_part), "pid").select(
        F.col("p_max").alias("id"), "nxt"
    )
    adj = (
        inner.filter(F.col("nxt").isNotNull()).select("id", "nxt").unionByName(seams)
    )
    got = sorted(
        (r.gap_start, r.gap_end)
        for r in adj.filter(F.col("nxt") - F.col("id") > 1)
        .select(
            (F.col("id") + 1).alias("gap_start"), (F.col("nxt") - 1).alias("gap_end")
        )
        .collect()
    )
    s = sorted(ids)
    expect = [
        (a + 1, b - 1) for a, b in zip(s, s[1:]) if b - a > 1
    ]
    assert got == expect
