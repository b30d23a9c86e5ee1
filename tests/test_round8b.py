"""Property/plan-shape tests for the round-8 second-wave operators
(oracle parity itself runs via the auto-parametrized
tests/test_catalog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_j14_equals_theta_join(spark):
    """The bucket-decomposed range join returns exactly the pairs the
    direct theta join finds — the decomposition neither drops pairs
    (bucket coverage) nor double-counts (first-common-bucket rule)."""
    from chronicle_sniffer_spark.plans.round8b import (
        _J14_WINDOW_DAYS,
        j14_bucketed_range_join,
    )

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    day = (F.unix_timestamp("o_orderdate") / 86400).cast("bigint")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("a_month"), day.alias("a_s")
    )
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select(day.alias("b_s"))
    brute = (
        a.join(
            b,
            (F.col("a_s") <= F.col("b_s") + _J14_WINDOW_DAYS)
            & (F.col("b_s") <= F.col("a_s") + _J14_WINDOW_DAYS),
        )
        .groupBy("a_month")
        .agg(F.count("*").alias("n_pairs"))
    )
    expect = {(r.a_month, r.n_pairs) for r in brute.collect()}
    got = {
        (r.a_month, r.n_pairs)
        for r in j14_bucketed_range_join(spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) > 0


def test_j14_plan_is_equi_join_not_nested_loop(spark):
    """The whole point: the physical join must be a hash/sort-merge
    equi join on the bucket key, never a BroadcastNestedLoop theta."""
    from chronicle_sniffer_spark.plans.round8b import j14_bucketed_range_join

    plan = _plan(j14_bucketed_range_join(spark, SF_SMOKE))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_a19_ntile_invariants_and_no_global_sort(spark):
    """Equi-depth buckets: sizes differ by at most one, first buckets
    are the larger ones, value ranges are non-decreasing across
    buckets, and the plan contains NO single-partition exchange (the
    global-window formulation this entry exists to avoid)."""
    from chronicle_sniffer_spark.plans.round8b import a19_equidepth_histogram

    df = a19_equidepth_histogram(spark, SF_SMOKE)
    rows = sorted(df.collect(), key=lambda r: r.bucket)
    n = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    assert [r.bucket for r in rows] == list(range(1, 9))
    sizes = [r.n_rows for r in rows]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # big buckets first
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_price <= hi.min_price
    # The data-bearing row_number window must be PARTITIONED (by pid);
    # a global-ntile formulation would show a Window node with an empty
    # partition spec ("], [], [").  Scalar single-partition exchanges
    # (the P-row total count) are fine — only windows are checked.
    plan = _plan(df)
    for line in plan.splitlines():
        if "Window [" in line:
            assert "], [], [" not in line, f"global (unpartitioned) window: {line}"
    assert "rangepartitioning" in plan


def test_ts11_baseline_covers_every_cell(spark):
    """Every (event_type, hour) cell present in events appears exactly
    once, counts sum to the event count, and the residual bound is
    non-negative; the baseline join is a broadcast."""
    from chronicle_sniffer_spark.plans.round8b import ts11_seasonal_profile

    df = ts11_seasonal_profile(spark, SF_SMOKE)
    rows = df.collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_cells = ev.select("event_type", F.hour("ts")).distinct().count()
    assert len(rows) == n_cells
    assert sum(r.n_events for r in rows) == ev.count()
    assert all(r.max_abs_residual >= 0.0 for r in rows)
    assert "BroadcastHashJoin" in _plan(df)


def test_s13_prunes_files_and_matches_full_scan(spark):
    """Data skipping must be real (fewer files than the layout) and
    sound (pruned scan ≡ full scan under the same predicate)."""
    from chronicle_sniffer_spark.plans.round8b import (
        _S13_FILES,
        _S13_HI,
        _S13_LO,
        manifest_layout,
        prune_files,
        s13_manifest_file_prune,
    )

    base, manifest = manifest_layout(spark, SF_SMOKE)
    assert len(manifest) == _S13_FILES
    keep = prune_files(manifest, _S13_LO, _S13_HI)
    assert 0 < len(keep) < _S13_FILES  # pruning actually skipped files
    # soundness: the pruned plan equals the same aggregate over ALL files
    full = (
        spark.read.parquet(base)
        .filter(
            (F.col("o_orderdate") >= F.lit(_S13_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_S13_HI).cast("timestamp"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .count()
    )
    expect = {(r.month, r["count"]) for r in full.collect()}
    got = {
        (r.month, r.n_orders)
        for r in s13_manifest_file_prune(spark, SF_SMOKE).collect()
    }
    assert got == expect and len(got) == 12
    # the pruned scan's file list is exactly the kept set
    pruned_files = set(s13_manifest_file_prune(spark, SF_SMOKE).inputFiles())
    assert pruned_files == set(keep)


def test_u12_schema_follows_constant_argument(spark):
    """Polymorphism proof: the same registered UDTF yields different
    output schemas for different constant arguments, resolved at plan
    time by analyze(); values match Python's split."""
    from chronicle_sniffer_spark.functions.udfs import register_polymorphic_udtf

    register_polymorphic_udtf(spark)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    for n in (2, 5):
        df = spark.sql(
            "SELECT s.* FROM documents d,"
            f" LATERAL split_fixed(d.doc_id, d.text, {n}) s WHERE d.doc_id < 5"
        )
        assert df.columns == ["doc_id"] + [f"w{i}" for i in range(n)]
        rows = {r.doc_id: r for r in df.collect()}
        src = {r.doc_id: r.text for r in docs.filter("doc_id < 5").collect()}
        for doc_id, text in src.items():
            toks = text.split(" ")
            expect = tuple(toks[i] if i < len(toks) else None for i in range(n))
            assert tuple(rows[doc_id])[1:] == expect


def test_ts12_matches_python_interval_union(spark):
    """The running-max island merge equals a brute-force per-user
    interval union (including intervals fully CONTAINED in earlier
    ones — the case gap-based sessionize cannot merge), and both
    windows are partitioned (no global single-task window)."""
    from chronicle_sniffer_spark.plans.round8b import ts12_interval_coverage

    df = ts12_interval_coverage(spark, SF_SMOKE)
    got = {r.user_id: (r.n_islands, r.covered_us) for r in df.collect()}

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").selectExpr(
        "user_id",
        "unix_micros(cast(ts as timestamp)) AS s",
        "unix_micros(cast(ts as timestamp)) + (3600 + event_id % 20 * 7200) * 1000000 AS en",
    )
    by_user: dict[int, list[tuple[int, int]]] = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append((r.s, r.en))
    expect = {}
    for uid, ivs in by_user.items():
        ivs.sort()
        islands = []
        for s, en in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], en)
            else:
                islands.append([s, en])
        expect[uid] = (len(islands), sum(e - s for s, e in islands))
    assert got == expect
    # at least one user must exercise the containment case (an interval
    # ending before the running max), else the fixture proves nothing
    contained = any(
        any(en < max(e for _, e in ivs[:i]) for i, (s, en) in enumerate(ivs) if i)
        for ivs in by_user.values()
    )
    assert contained
    plan = _plan(df)
    for line in plan.splitlines():
        if "Window [" in line:
            assert "], [], [" not in line, f"global (unpartitioned) window: {line}"
