"""End-to-end streaming UDM pipeline: capture dir replayed as a stream
equals the batch conversion; restart from checkpoint processes only new
files (R4 dedup); metrics rows match R23 counters."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from chronicle_sniffer_spark.etl import convert_directory, per_file_metrics
from chronicle_sniffer_spark.streaming.udm_pipeline import run_udm_stream

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
PROC_TIME = "2025-09-05T12:00:00.000000Z"


def _key(df):
    # canonical serialization of the typed event struct (the streamed
    # table stores `event`, the batch side can serve either form)
    rows = df.select(
        F.to_json(F.struct(F.col("event").alias("event"))).alias("j"), "source_file"
    ).collect()
    return sorted((r.j, os.path.basename(r.source_file)) for r in rows)


def test_stream_pipeline_equals_batch_and_resumes(spark):
    base = tempfile.mkdtemp(prefix="css_udmstream_")
    in_dir = os.path.join(base, "captures")
    out_dir = os.path.join(base, "out")
    os.makedirs(in_dir)
    fixtures = sorted(f for f in os.listdir(FIXDIR) if f.endswith(".json"))
    first, second = fixtures[:-2], fixtures[-2:]
    for f in first:
        shutil.copy(os.path.join(FIXDIR, f), in_dir)

    run_udm_stream(spark, in_dir, out_dir, PROC_TIME)
    got1 = spark.read.parquet(os.path.join(out_dir, "udm_events"))
    batch1 = convert_directory(spark, os.path.join(in_dir, "*.json"), PROC_TIME)
    assert _key(got1) == _key(batch1)

    # restart: two more files arrive; checkpoint must skip the old ones
    for f in second:
        shutil.copy(os.path.join(FIXDIR, f), in_dir)
    run_udm_stream(spark, in_dir, out_dir, PROC_TIME)
    got2 = spark.read.parquet(os.path.join(out_dir, "udm_events"))
    batch2 = convert_directory(spark, os.path.join(in_dir, "*.json"), PROC_TIME)
    assert _key(got2) == _key(batch2)  # no duplicates, nothing missed

    # R23 metrics: counters per file match the batch-side aggregation
    metrics = spark.read.parquet(os.path.join(out_dir, "file_metrics"))
    m_stream = {
        r.file: (r.processed_packet_count, r.error_event_count) for r in metrics.collect()
    }
    m_batch = {
        r.file: (r.processed_packet_count, r.error_event_count)
        for r in per_file_metrics(batch2).collect()
    }
    assert m_stream == m_batch
    # every observed epoch wrote its files exactly once
    assert metrics.groupBy("file").count().filter(F.col("count") > 1).count() == 0
