"""Streaming crawl ingest — the file-arrival-driven twin of the batch
crawl funnel (the round-13 verdict's #3: every T-entry streams
``events`` while the crawl path was batch-only, yet the reference's
whole architecture is file-arrival-driven — a new container lands,
gets decoded, and its documents join the corpus;
``sniffer_entrypoint.sh:156-207`` is exactly this loop for pcap).

Shape:

- ``readStream.format("binaryFile")`` over the container directory —
  the file-notification emulation SURVEY §4.3 declares as the
  offline-testable stand-in for Pub/Sub: Structured Streaming's file
  source IS a durable arrival log (checkpointed, replayable,
  AvailableNow for catch-up);
- each micro-batch runs the SAME stages as the batch path — member
  decode (sources/warc.py decode_members), HTML extraction, C4
  quality gate — nothing is reimplemented stream-side;
- the sink is a manifest-committed bucket store (streaming/
  manifest.py), bucketed by CONTAINER FILE: each batch MERGEs its
  files' documents into only the buckets those files hash into
  (existing rows for OTHER files are carried forward; rows for the
  batch's own files are REPLACED).  A bucket's content is therefore a
  deterministic function of the container files mapping to it — the
  S7 idempotence contract holds structurally: re-delivering a
  container (duplicate notification, checkpoint loss, operator
  replay) rewrites its bucket with byte-identical rows instead of
  appending duplicates, and publication stays one atomic manifest
  flip per batch (a crash mid-batch leaves readers on the previous
  consistent snapshot).

At 100 TB: the data path is fully distributed (decode/extract/gate
run on executors; the MERGE is a bucket-pruned anti-join + union);
driver work is O(touched buckets) control-plane metadata per batch,
and per-batch write cost tracks the BATCH's file spread, never the
table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.streaming import manifest as mf

BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, content binary"
)
CRAWL_TABLE_SCHEMA = "doc_id bigint, file string, n_tokens bigint, text string"
N_BUCKETS = 32


def gated_extract(recs: DataFrame) -> DataFrame:
    """WARC records → gated training documents: main-document
    responses → HTML → text (operators/html.py) → the C4 quality gate
    (plans/quality.py constants) — the batch funnel's stages 1–2
    expressed once and shared by the stream's micro-batches and the
    batch twin (plans/round14.py), so stream ≡ batch is a property of
    shared code, not of parallel reimplementation."""
    from chronicle_sniffer_spark.operators.html import html_extract
    from chronicle_sniffer_spark.plans.quality import (
        MAX_SYMBOL_RATIO,
        MEAN_WL_HI,
        MEAN_WL_LO,
        MIN_WORDS,
    )
    from chronicle_sniffer_spark.plans.round11 import _DENSITY_PCT

    main = (
        recs.filter(
            (F.col("warc_type") == "response")
            & F.col("target_uri").rlike(r"/doc/\d+$")
        )
        .select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("bigint")
            .alias("doc_id"),
            "file",
            F.col("text").alias("html"),
        )
        # three consumers below (title branch, block branch, the file
        # join-back) — materialize so the container decode runs once
        .localCheckpoint(eager=True)
    )
    ext = (
        html_extract(main, max_density_pct=_DENSITY_PCT)
        .select("doc_id", "text")
        .join(main.select("doc_id", "file"), "doc_id")
    )
    n_words = F.size(F.split("text", " "))
    sig = ext.select(
        "doc_id",
        "file",
        "text",
        n_words.cast("bigint").alias("n_tokens"),
        n_words.alias("n_words"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")) * 1.0 / n_words, 6
        ).alias("mean_word_len"),
        F.round(
            F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", "")) * 1.0
            / F.length("text"),
            6,
        ).alias("symbol_ratio"),
    )
    return sig.filter(
        (F.col("n_words") >= MIN_WORDS)
        & F.col("mean_word_len").between(MEAN_WL_LO, MEAN_WL_HI)
        & (F.col("symbol_ratio") < MAX_SYMBOL_RATIO)
    ).select("doc_id", "file", "n_tokens", "text")


def _bucket_of(col: str = "file"):
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def read_crawl_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """One consistent manifest snapshot of the ingested document
    table (time travel via ``version``)."""
    m = mf.read_manifest(table_dir, version)
    paths = mf.bucket_paths(table_dir, m)
    if not paths:
        return spark.createDataFrame([], CRAWL_TABLE_SCHEMA)
    return spark.read.schema(CRAWL_TABLE_SCHEMA).parquet(*paths)


def merge_containers(
    spark: SparkSession, table_dir: str, files: DataFrame
) -> int | None:
    """MERGE one micro-batch of container (path, content) rows into
    the bucket store; returns the committed manifest version (None
    for an empty batch).  Exposed separately so tests can drive the
    exact re-delivery case without a second stream."""
    from chronicle_sniffer_spark.sources.warc import decode_members

    batch_files = [
        r.path for r in files.select("path").distinct().collect()
    ]
    if not batch_files:
        return None
    # touched buckets are a function of the batch's FILES, not of the
    # docs that happen to survive the gate: a re-delivered container
    # whose (changed) content now yields zero gated docs must still
    # have its old rows replaced — pruning on doc buckets would leave
    # them stale in an "untouched" bucket.  O(batch files) driver work.
    touched = {
        r.bucket
        for r in spark.createDataFrame(
            [(p,) for p in batch_files], "file string"
        )
        .select(_bucket_of("file").alias("bucket"))
        .distinct()
        .collect()
    }
    docs = gated_extract(decode_members(files)).withColumn(
        "bucket", _bucket_of("file")
    )
    m = mf.read_manifest(table_dir)
    epoch = (m["epoch"] + 1) if m else 0
    old_paths = mf.bucket_paths(table_dir, m, touched)
    if old_paths:
        carried = (
            spark.read.schema(CRAWL_TABLE_SCHEMA)
            .parquet(*old_paths)
            # REPLACE the batch's own files' rows: re-delivery must
            # rewrite, not append (the S7 contract).  The IN list is
            # bounded by maxFilesPerTrigger; an unbounded batch would
            # want a broadcast anti-join instead.
            .filter(~F.col("file").isin(batch_files))
            .withColumn("bucket", _bucket_of("file"))
        )
        merged = carried.unionByName(docs)
    else:
        merged = docs
    staging = mf.staging_dir(table_dir, epoch)
    merged.write.partitionBy("bucket").parquet(staging)
    import os

    written = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(staging)
        if d.startswith("bucket=")
    )
    # a touched bucket the merge drained to zero rows writes no
    # bucket=NN dir; it must leave the manifest in the SAME flip or
    # its stale path would keep serving the replaced rows
    drained = sorted(b for b in touched if b not in set(written))
    mf.commit(table_dir, epoch, written, dropped_buckets=drained)
    return epoch


def stream_crawl_ingest(
    spark: SparkSession,
    warc_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Run the streaming ingest (AvailableNow by default — process
    every container currently in the directory, then stop; drop the
    flag for a continuously tailing query).  ``max_files_per_trigger``
    bounds each micro-batch's container count — several real batches
    per replay instead of one big gulp."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARYFILE_SCHEMA)
        .option("pathGlobFilter", "*.warc.gz")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(warc_dir)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        merge_containers(batch_df.sparkSession, table_dir, batch_df)

    writer = (
        files.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
