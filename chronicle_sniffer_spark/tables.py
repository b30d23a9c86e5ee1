"""Testdata table loaders.

The driver-generated TPC-H-ish tables live at
``/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`` (TESTDATA.md).
Loaders return plain DataFrames so Catalyst sees the parquet scan
directly (predicate pushdown / column pruning reach the file).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Per-session memo of loaded base-table DataFrames (lazy logical
# plans, NOT data): a warm `spark.read.parquet` costs ~90-130 ms per
# call (footer/schema read + Dataset analysis), and every catalog
# entry re-loads its 1-3 tables on every plan build — including every
# timed bench repetition.  Memoizing the PLAN per (session, sf_dir,
# table) removes that fixed cost while every action still scans the
# parquet in full (nothing is persisted or precomputed; this is the
# same class of metadata caching as Spark's own
# filesourcePartitionFileCache, guide §6).  WeakKeyDictionary keyed on
# the session object: a stopped session's memo dies with it, and a
# driver-owned session gets its own entry.
import weakref

_LOAD_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    try:
        per_session = _LOAD_MEMO[spark]
    except KeyError:
        per_session = _LOAD_MEMO.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    hit = per_session.get(key)
    if hit is not None:
        return hit
    if name == "events":
        # defensive: a caller-owned session (the driver's) may lack the
        # nanos config that session.get_spark sets; it is runtime-settable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file; with
        # spark.sql.legacy.parquet.nanosAsLong=true it surfaces as long
        # nanos.  Truncate to micros (integer div) — identical to how
        # DuckDB reads the same column, so oracle comparisons line up.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    per_session[key] = df
    return df


def session_tmpdir(prefix: str) -> str:
    """``mkdtemp`` that does not outlive the process: per-session
    fixture/staging directories (the WARC corpus, IVF index layouts,
    gzip fixtures, per-pid build tables) are registered for atexit
    removal — round-12 advisor finding: bare mkdtemp dirs accumulated
    across sessions and pytest workers with nothing ever reclaiming
    them.  ``ignore_errors`` because a hard-killed JVM may still hold
    a file handle; leftover cleanup is best-effort by design."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def cleanup_at_exit(path: str) -> str:
    """Register an existing directory for atexit removal (the per-pid
    warehouse build tables); returns the path for chaining."""
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def spread(df: DataFrame) -> DataFrame:
    """Conditionally repartition a narrow scan to the session's core
    count, for operators whose per-row map-side CPU (per-token md5,
    shingle hashing, codec work) dominates the stage.

    The testbed tables are single parquet files with ONE row group, so
    Spark's byte-range splitting yields ONE scan task no matter what
    ``maxPartitionBytes`` says — the round-6 sf1 soak showed the
    simhash/shingle family running all its hashing on one core.  At
    100 TB the same table arrives as thousands of splits, and this
    helper sees ``>= cores`` input partitions and becomes a no-op —
    it never adds a shuffle to a properly-split source; locally it
    moves only the slim (id, text) projection.

    Probe order (cheapest first): streaming DataFrames pass through
    untouched (``.rdd`` would raise AnalysisException and a stream's
    micro-batch partitioning is the source's to decide); then the
    input-file probe (``df.inputFiles()`` — file listing only, no
    physical planning) proves a well-split source with ≥cores files
    that are ALSO non-trivially sized (Spark bin-packs small files
    into partitions by ``maxPartitionBytes``/``openCostInBytes``, so
    a many-tiny-files source can have ≥cores files yet scan with one
    task — exactly the case this helper exists to fix); only then
    fall back to the exact ``rdd.getNumPartitions()`` probe, which
    forces physical planning of the sub-plan."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    sc = spark.sparkContext
    par = sc.defaultParallelism
    try:
        files = df.inputFiles()
        if len(files) >= par:
            # file COUNT alone is not proof — require enough total
            # bytes that the split planner would open >= cores tasks
            jvm = sc._jvm
            jconf = sc._jsc.hadoopConfiguration()
            max_pb = jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
            )
            total = 0
            fs = None
            for f in files:
                p = jvm.org.apache.hadoop.fs.Path(f)
                if fs is None:
                    fs = p.getFileSystem(jconf)
                total += fs.getFileStatus(p).getLen()
                if total >= max_pb * par:
                    return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for spark.sql use."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
