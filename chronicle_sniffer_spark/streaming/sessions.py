"""Stream-maintained SESSION table: a ``foreachBatch`` sink that
merges each micro-batch's events into a persistent per-user session
store — the streaming twin of the batch ``o18_incremental_sessionize``
entry, and the production shape for "keep sessions fresh under an
event stream" when the native session_window's state (T3) would have
to hold every open session in the checkpoint forever.

Invariant the merge preserves: every stored row is a session FRAGMENT
— an interval whose internal event gaps are ≤ G.  Merging a new batch
is then the ts12 interval-union-with-gap over (stored fragments ∪
batch points), per affected user: sort by start, a fragment opens a
new session iff its start exceeds the running max end by more than G.
This equals full re-sessionization of the underlying points for ANY
arrival order (late or out-of-order batches included): overlapping or
within-gap fragments merge exactly when their point sets would, and a
merged interval's internal gaps stay ≤ G, re-establishing the
invariant for the next batch.  tests/test_streaming.py proves the
stream-maintained table equals the batch one-shot sessionization.

Storage & merge shape (the 100 TB design, all distributed — no driver
collect anywhere on the merge path): the table is hash-bucketed on
user_id into ``bucket=NN`` parquet partitions, and each micro-batch
rewrites ONLY the buckets its users hash into, via dynamic-partition
overwrite (the s8c technique).  Per-batch work is one user-keyed
shuffle of the micro-batch plus a bucket-pruned read of affected
buckets; untouched buckets' files are physically never rewritten.

Exactly-once: the applied epoch is a COLUMN of the data itself —
every row written for micro-batch E carries epoch=E, so the epoch
marker commits in the same artifact as the merge (no separate
marker-file write to crash between, the round-9 advisor finding).  On
redelivery, buckets whose stored epoch already reached E are skipped;
buckets the crashed attempt never replaced are merged exactly once.
Granularity of the guarantee is the bucket directory: replacement of
one partition dir is delegated to the file committer (delete + rename
at job commit), the same window every Hive-style table has; a
production deployment swaps the parquet overwrite for a Delta/Iceberg
MERGE where that final commit is a single atomic log append — the
merge plan is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSIONS_SCHEMA = "user_id bigint, s bigint, e bigint, n bigint"
_FULL_SCHEMA = SESSIONS_SCHEMA + ", epoch bigint, bucket int"
N_BUCKETS = 32


def _bucket_of(col: str = "user_id"):
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def _read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    # dynamic-partition-overwrite commits do not leave a root _SUCCESS
    # marker; existence = at least one committed bucket directory
    if os.path.isdir(table_dir) and any(
        name.startswith("bucket=") for name in os.listdir(table_dir)
    ):
        return spark.read.parquet(table_dir)
    return spark.createDataFrame([], _FULL_SCHEMA)


def interval_union_with_gap(items: DataFrame, gap_us: int) -> DataFrame:
    """Merge session fragments (user_id, s, e, n) whose gaps are ≤ G:
    the ts12/o18 gaps-and-islands pass, user-partitioned."""
    run_end = F.max("e").over(
        Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
            Window.unboundedPreceding, -1
        )
    )
    flagged = items.select(
        "user_id",
        "s",
        "e",
        "n",
        F.when(run_end.isNull() | (F.col("s") > run_end + gap_us), 1)
        .otherwise(0)
        .alias("st"),
    )
    wrun = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        flagged.select(
            "user_id", "s", "e", "n", F.sum("st").over(wrun).alias("island")
        )
        .groupBy("user_id", "island")
        .agg(
            F.min("s").alias("s"),
            F.max("e").alias("e"),
            F.sum("n").cast("bigint").alias("n"),
        )
        .drop("island")
    )


def merge_session_batch(
    spark: SparkSession, table_dir: str, batch_df: DataFrame, epoch_id: int, gap_us: int
) -> None:
    """Merge one micro-batch of events into the session table,
    idempotently — only affected buckets whose stored epoch has not
    yet reached ``epoch_id`` are merged and rewritten."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = batch_df.select(
        "user_id", us.alias("s"), us.alias("e"), F.lit(1).cast("bigint").alias("n")
    ).withColumn("bucket", _bucket_of())
    cur = _read_table(spark, table_dir)
    # buckets already carrying this (or a later) epoch were fully
    # committed by a previous attempt — redelivery skips them
    done = cur.filter(F.col("epoch") >= F.lit(int(epoch_id))).select("bucket").distinct()
    todo_pts = pts.join(done, "bucket", "left_anti")
    affected = todo_pts.select("bucket").distinct()
    if affected.isEmpty():
        return  # fully-applied replay (or empty batch): no-op
    # a rewritten bucket must carry ALL its users forward, not just the
    # batch's: pull every stored row of the affected buckets (stored
    # fragments of untouched users pass through the union unchanged —
    # they are already maximal, so the gaps-and-islands pass is the
    # identity on them)
    stored = cur.join(affected, "bucket", "left_semi").select("user_id", "s", "e", "n")
    merged = interval_union_with_gap(
        stored.unionByName(todo_pts.select("user_id", "s", "e", "n")), gap_us
    )
    out = merged.select(
        "user_id",
        "s",
        "e",
        "n",
        F.lit(int(epoch_id)).cast("bigint").alias("epoch"),
        _bucket_of().alias("bucket"),
    )
    # localCheckpoint materializes the merge BEFORE the overwrite job,
    # cutting lineage to the very files being replaced (Spark refuses
    # to overwrite a path it is still reading from); on a multi-node
    # cluster swap for reliable checkpoint(dir) — same call shape
    out = out.localCheckpoint()
    (
        out.write.partitionBy("bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(table_dir)
    )


def maintain_sessions(
    events_stream: DataFrame, table_dir: str, checkpoint_dir: str, gap_us: int
) -> DataFrame:
    """Run the stream-maintained session table to completion
    (AvailableNow) and return it."""
    spark = events_stream.sparkSession
    q = (
        events_stream.writeStream.foreachBatch(
            lambda bdf, eid: merge_session_batch(spark, table_dir, bdf, eid, gap_us)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_table(spark, table_dir).select("user_id", "s", "e", "n")
