"""Incrementally maintained aggregate table (streaming materialized
view): a ``foreachBatch`` sink that MERGEs each micro-batch's partial
aggregates into a persistent per-key table.

This is the production pattern behind "keep a rollup table fresh under
an event stream": the stream never holds the full aggregate in state
(unbounded keys would grow checkpoint state forever); instead each
micro-batch computes a batch-local partial agg (map-side combinable,
tiny) and upserts it into the table with read-modify-write MERGE
semantics — the same full-outer-join + coalesce shape as the batch
MERGE entry (plans/quality.py s8_merge_upsert), generalizing the
reference's per-file counter accumulation (R23/R26) to a keyed,
restart-safe table.

Storage & merge shape (the 100 TB design; the data path is fully
distributed): the table is hash-bucketed on user_id; each micro-batch
full-outer-merges its partials into ONLY the buckets its keys hash
into, stages them as WRITE-ONCE files under ``data/commit=E/
bucket=NN``, and publishes with ONE atomic manifest flip
(streaming/manifest.py) — no delete+rename window anywhere, so a
crash at any point leaves readers on the previous manifest seeing a
consistent cross-bucket snapshot.  Untouched buckets' files are never
rewritten, so per-batch write cost tracks the batch's key spread, not
the table size.

Exactly-once: the manifest records each bucket's applied epoch and
commits atomically with the bucket paths.  On redelivery, buckets
whose manifest epoch already reached E are skipped; staged-but-never-
published residue is discarded and merged exactly once.  Values
accumulate through exact DECIMAL(18,4) so association order across
micro-batches can never matter.  Driver-side actions are
control-plane only (affected-bucket ids + the manifest file) — the
same metadata a Delta/Iceberg commit writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.streaming import manifest as mf

TABLE_SCHEMA = "user_id bigint, n_events bigint, total_value decimal(18,4)"
N_BUCKETS = 32


def _bucket_of(col: str = "user_id"):
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def _read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Resolve through ONE manifest version (default latest): a frozen,
    consistent cross-bucket snapshot (time travel via ``version``)."""
    m = mf.read_manifest(table_dir, version)
    paths = mf.bucket_paths(table_dir, m)
    if not paths:
        return spark.createDataFrame([], TABLE_SCHEMA)
    return spark.read.schema(TABLE_SCHEMA).parquet(*paths)


def merge_batch(
    spark: SparkSession,
    table_dir: str,
    batch_df: DataFrame,
    epoch_id: int,
    fail_before_commit: bool = False,
) -> None:
    """MERGE one micro-batch's partial aggregates into the table,
    idempotently — only affected buckets whose manifest epoch has not
    yet reached ``epoch_id`` are merged, staged write-once, and
    published by one atomic manifest flip.  ``fail_before_commit``
    injects a crash between the data write and the flip (tests)."""
    part = (
        batch_df.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("d_n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("d_total"),
        )
        .withColumn("bucket", _bucket_of())
    )
    m = mf.read_manifest(table_dir)
    done = [b for b, e in mf.bucket_epochs(m).items() if e >= int(epoch_id)]
    todo = part.filter(~F.col("bucket").isin(done)) if done else part
    affected = sorted(r["bucket"] for r in todo.select("bucket").distinct().collect())
    if not affected:
        return  # fully-applied replay (or empty batch): no-op
    # a rewritten bucket carries ALL its keys forward: read the
    # affected buckets by exact manifest path (untouched keys in an
    # affected bucket flow through the full-outer join unchanged)
    stored_paths = mf.bucket_paths(table_dir, m, set(affected))
    stored = (
        spark.read.schema(TABLE_SCHEMA).parquet(*stored_paths)
        if stored_paths
        else spark.createDataFrame([], TABLE_SCHEMA)
    )
    merged = stored.join(todo.drop("bucket"), "user_id", "full_outer").select(
        "user_id",
        (F.coalesce("n_events", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
        .cast("bigint")
        .alias("n_events"),
        (
            F.coalesce(F.col("total_value"), F.lit(0).cast("decimal(18,4)"))
            + F.coalesce(F.col("d_total"), F.lit(0).cast("decimal(18,4)"))
        )
        .cast("decimal(18,4)")
        .alias("total_value"),
        _bucket_of().alias("bucket"),
    )
    staging = mf.staging_dir(table_dir, epoch_id)
    merged.write.partitionBy("bucket").parquet(staging)
    if fail_before_commit:
        raise RuntimeError("injected crash before manifest commit")
    mf.commit(table_dir, int(epoch_id), affected)


def maintain_rollup(events_stream: DataFrame, table_dir: str, checkpoint_dir: str):
    """Run the stream-maintained rollup to completion (AvailableNow)."""
    spark = events_stream.sparkSession

    q = (
        events_stream.writeStream.foreachBatch(
            lambda bdf, eid: merge_batch(spark, table_dir, bdf, eid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_table(spark, table_dir).select("user_id", "n_events", "total_value")


def compact_table(
    spark: SparkSession, table_dir: str, fail_before_commit: bool = False
) -> int:
    """Small-file compaction through the SAME atomic protocol as the
    merges (round-12): a long-lived stream-maintained table accretes
    one commit directory per epoch — every bucket's live file sits in
    whichever epoch last rewrote it, so a full read touches O(epochs)
    directories and the file count grows without bound.  Compaction
    reads the CURRENT snapshot through one manifest, rewrites every
    live bucket into ONE new write-once epoch directory (one file per
    bucket — ``repartition(bucket)`` before ``partitionBy``), and
    publishes with one manifest flip; buckets that vanished (none in
    practice — compaction preserves data) leave the map in the same
    flip.  Readers never see a half-compacted table: they hold either
    the old manifest (all old paths, still on disk — write-once) or
    the new one; prune() then reclaims the dead epoch directories.
    This is exactly Delta OPTIMIZE / Iceberg rewrite_data_files
    re-expressed on the self-contained manifest store.  Returns the
    committed manifest version."""
    m = mf.read_manifest(table_dir)
    if m is None:
        raise ValueError(f"nothing to compact at {table_dir}")
    cur = _read_table(spark, table_dir)
    epoch = int(m["epoch"]) + 1
    staging = mf.staging_dir(table_dir, epoch)
    (
        cur.withColumn("bucket", _bucket_of())
        .repartition("bucket")
        .write.partitionBy("bucket")
        .parquet(staging)
    )
    import os

    written = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(staging)
        if name.startswith("bucket=")
    )
    if fail_before_commit:
        raise RuntimeError("injected crash before manifest commit")
    dropped = [b for b in mf.bucket_epochs(m) if b not in set(written)]
    return mf.commit(table_dir, epoch, written, dropped_buckets=dropped)
