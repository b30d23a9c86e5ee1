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

Exactly-once: the epoch guard of streaming/incremental.py — a
replayed micro-batch is detected via the ``_epoch`` marker and
skipped, so at-least-once delivery cannot double-count events.

Scale shape per batch: one user-keyed shuffle of the micro-batch plus
a semi-join pull of AFFECTED users' stored fragments; untouched users'
rows are never rewritten at the logical level (this test-scale sink
rewrites the parquet; a real deployment MERGEs into Delta/Iceberg with
the identical plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSIONS_SCHEMA = "user_id bigint, s bigint, e bigint, n bigint"


def _read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    if os.path.exists(os.path.join(table_dir, "_SUCCESS")):
        return spark.read.parquet(table_dir)
    return spark.createDataFrame([], SESSIONS_SCHEMA)


def _last_epoch(table_dir: str) -> int:
    try:
        with open(os.path.join(table_dir, "_epoch")) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return -1


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
    idempotently."""
    if epoch_id <= _last_epoch(table_dir):
        return  # redelivered micro-batch: already applied
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = batch_df.select(
        "user_id", us.alias("s"), us.alias("e"), F.lit(1).cast("bigint").alias("n")
    )
    cur = _read_table(spark, table_dir)
    affected = pts.select("user_id").distinct()
    touched = cur.join(affected, "user_id", "left_semi")
    untouched = cur.join(affected, "user_id", "left_anti")
    merged = interval_union_with_gap(touched.unionByName(pts), gap_us)
    out = untouched.unionByName(merged)
    rows = out.collect()  # test-scale staging; a real sink MERGEs in place
    spark.createDataFrame(rows, SESSIONS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(table_dir)
    with open(os.path.join(table_dir, "_epoch"), "w") as fh:
        fh.write(str(epoch_id))


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
    return _read_table(spark, table_dir)
