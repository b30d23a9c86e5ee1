"""Focused tests for round-15 optimization internals.

The py4j fastpath (chronicle_sniffer_spark/py4j_fastpath.py) memoizes
py4j's per-call reflection lookups — the dominant residual
plan-construction cost after round 14's dataFrameDebugging cut.  The
cache must (a) actually be installed by the package import, (b)
eliminate reflection round trips for repeated function resolution,
(c) never cache static FIELD reads (a field's value can change), and
(d) leave query results byte-identical (the whole suite covers this
broadly; the expression test below is the focused smoke check).
"""

from __future__ import annotations

import contextlib


def test_fastpath_installed():
    from chronicle_sniffer_spark import py4j_fastpath

    assert py4j_fastpath.is_installed()


@contextlib.contextmanager
def _count_reflection():
    from py4j.java_gateway import GatewayClient

    counts = {"r": 0, "total": 0}
    orig = GatewayClient.send_command

    def counting(self, command, *args, **kwargs):
        counts["total"] += 1
        if isinstance(command, str) and command[:1] == "r":
            counts["r"] += 1
        return orig(self, command, *args, **kwargs)

    GatewayClient.send_command = counting
    try:
        yield counts
    finally:
        GatewayClient.send_command = orig


def test_fastpath_steady_state_function_calls_issue_no_reflection(spark):
    """After the first resolution, an F.<fn>() build must cost its
    invocation round trip only — zero reflection commands.  Round-trip
    counts are deterministic, so this is the noise-free guard for the
    round's main lever."""
    from pyspark.sql import functions as F

    F.upper(F.lower(F.col("x")))  # warm: resolves + caches handles
    with _count_reflection() as counts:
        F.upper(F.lower(F.col("x")))
    assert counts["total"] > 0  # the invocations themselves happened
    assert counts["r"] == 0


def test_fastpath_static_field_reads_are_not_cached(spark):
    """Static METHOD handles are memoized; static FIELD reads must
    re-read every time (the value can change)."""
    jvm = spark.sparkContext._jvm
    integer_cls = getattr(jvm, "java.lang.Integer")
    assert integer_cls.parseInt("41") == 41
    assert integer_cls.MAX_VALUE == 2147483647
    cache = integer_cls.__dict__.get("_css_attr_cache", {})
    assert "parseInt" in cache
    assert "MAX_VALUE" not in cache
    # and a second field read still works (fresh reflection each time)
    assert integer_cls.MAX_VALUE == 2147483647


def test_fastpath_expression_results_unchanged(spark):
    """End-to-end: an expression chain built entirely through cached
    handles evaluates to the same values."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        (F.col("id") * 2 + 1).alias("n"),
    )
    assert [(r.s, r.n) for r in df.collect()] == [
        ("v0", 1),
        ("v1", 3),
        ("v2", 5),
    ]


def test_load_table_memo_is_per_session_and_per_path(spark):
    """load_table memoizes the lazy PLAN per (session, sf_dir, table)
    — a warm spark.read.parquet costs ~100 ms that every plan build
    (and every timed bench rep) was re-paying.  The memo must return
    the same DataFrame object within a session, distinct plans for
    distinct sf_dirs, and the data must still come from the parquet
    (every action re-scans; nothing is persisted)."""
    from tests.conftest import SF_SMOKE
    from chronicle_sniffer_spark.tables import load_table

    a1 = load_table(spark, SF_SMOKE, "nation")
    a2 = load_table(spark, SF_SMOKE, "nation")
    assert a1 is a2
    b = load_table(spark, "/root/testdata/sf0.01", "nation")
    assert b is not a1
    assert a1.count() == 25 and b.count() == 25
    # and the memoized plan still evaluates per-action (no result pin)
    assert a1.filter("n_nationkey = 0").count() == 1


def test_fastpath_survives_session_restart():
    """SparkSession.stop() keeps the JVM and gateway alive, so cached
    handles stay valid across the bench's stop()/get_spark() cycle.
    Run in a subprocess so the suite's session fixture is untouched."""
    import os
    import subprocess
    import sys

    code = (
        "from chronicle_sniffer_spark.session import get_spark\n"
        "from pyspark.sql import functions as F\n"
        "s1 = get_spark('fastpath-restart-a')\n"
        "assert s1.range(1).select(F.lit(7).alias('x')).collect()[0].x == 7\n"
        "s1.stop()\n"
        "s2 = get_spark('fastpath-restart-b')\n"
        "assert s2.range(1).select(F.lit(8).alias('x')).collect()[0].x == 8\n"
        "s2.stop()\n"
        "print('RESTART_OK')\n"
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RESTART_OK" in out.stdout
