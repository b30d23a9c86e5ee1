"""Stream-vs-batch equivalence (SURVEY §5.2-3) and reliability
patterns: T1/T2 window parity, T4 watermark late-drop, T5 dedup,
T6 stateful, T7 AvailableNow replay, S6 queue validation, S7
idempotency, T8 bounded-attempt DLQ."""

from __future__ import annotations

import json
import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from chronicle_sniffer_spark.streaming.reliability import DlqSink, dedup_stream, read_notifications
from chronicle_sniffer_spark.streaming.runtime import (
    EVENTS_STREAM_SCHEMA,
    read_events_stream,
    run_to_completion,
    stage_events_as_files,
)
from chronicle_sniffer_spark.streaming.stateful import running_counts_batch, running_counts_stream
from chronicle_sniffer_spark.streaming.windows import tumbling_counts, windowed_with_watermark
from chronicle_sniffer_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def staged(spark):
    return stage_events_as_files(spark, SF_SMOKE, n_files=4)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_t1_t7_stream_equals_batch(spark, staged):
    stream = read_events_stream(spark, staged)
    result = run_to_completion(tumbling_counts(stream), "t1_stream", "complete")
    batch = tumbling_counts(load_table(spark, SF_SMOKE, "events"))
    assert _rows(result, "w_start", "n", "total_value") == _rows(
        batch, "w_start", "n", "total_value"
    )


def test_t2_sliding_stream_equals_batch(spark, staged):
    from chronicle_sniffer_spark.streaming.windows import sliding_counts

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    result = run_to_completion(sliding_counts(stream), "t2_stream", "complete")
    batch = sliding_counts(load_table(spark, SF_SMOKE, "events"))
    assert _rows(result, "w_start", "n") == _rows(batch, "w_start", "n")


def test_t3_session_stream_equals_batch(spark, staged):
    """Native session_window merges sessions incrementally in streaming
    state; final merged sessions equal the batch plan's."""
    from chronicle_sniffer_spark.streaming.windows import session_aggregate

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    result = run_to_completion(session_aggregate(stream), "t3_stream", "complete")
    batch = session_aggregate(load_table(spark, SF_SMOKE, "events"))
    cols = ("user_id", "s_start", "s_end", "n_events", "session_value")
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_t5_stream_dedup(spark, staged):
    # redeliver every file twice via a doubled staging dir
    double_dir = os.path.join(tempfile.mkdtemp(prefix="css_dup_"), "events")
    ev = spark.read.parquet(staged)
    ev.unionByName(ev).repartition(6).write.mode("overwrite").parquet(double_dir)
    stream = read_events_stream(spark, double_dir, max_files_per_trigger=2)
    deduped = dedup_stream(stream).groupBy().count()
    result = run_to_completion(deduped, "t5_stream", "complete")
    expected = load_table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    assert result.collect()[0][0] == expected


def test_t3b_dynamic_session_stream_equals_batch(spark, staged):
    """Dynamic-gap session_window merges sessions incrementally in
    streaming state; final merged sessions equal the batch plan's —
    including sessions extended only through a purchase's longer gap."""
    from chronicle_sniffer_spark.streaming.windows import dynamic_session_aggregate

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    result = run_to_completion(
        dynamic_session_aggregate(stream), "t3b_stream", "complete"
    )
    batch = dynamic_session_aggregate(load_table(spark, SF_SMOKE, "events"))
    cols = ("user_id", "s_start", "s_end", "n_events", "session_value")
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_t5b_dedup_within_watermark_semantics(spark):
    """dropDuplicatesWithinWatermark, the ALWAYS-watermark-evicted
    dedup (plain dropDuplicates only expires state when the event-time
    column is part of the key): (a) a redelivery inside the horizon is
    dropped; (b) after the watermark passes an id's state, the SAME id
    re-arriving with a fresh in-horizon timestamp is emitted again —
    the visible proof that state was evicted, i.e. bounded."""
    from datetime import datetime

    from chronicle_sniffer_spark.streaming.reliability import (
        dedup_stream_within_watermark,
    )

    base = tempfile.mkdtemp(prefix="css_dupw_")
    d = os.path.join(base, "events")
    os.makedirs(d)
    checkpoint = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")

    def run_once():
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(d)
        q = (
            dedup_stream_within_watermark(stream, delay="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: id=1 plus an in-horizon duplicate of it -> ONE emission;
    # a second row advances the watermark to 10:50
    batch1 = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 1, "click", 1.0, "{}"),
        (1, datetime(2024, 1, 1, 10, 0, 5), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 11, 0, 0), 1, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(batch1, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    run_once()
    # batch 2 (restart from checkpoint, watermark persisted at 10:50):
    # id=1 again with a FRESH in-horizon ts — its state expired at
    # 10:10, so it is emitted a second time
    time.sleep(0.2)
    batch2 = [(1, datetime(2024, 1, 1, 10, 59, 0), 1, "click", 1.0, "{}")]
    spark.createDataFrame(batch2, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    run_once()

    emitted = sorted(
        (r.event_id, r.ts.isoformat()) for r in spark.read.parquet(out).collect()
    )
    assert emitted == [
        (1, "2024-01-01T10:00:00"),   # first arrival kept, duplicate dropped
        (1, "2024-01-01T10:59:00"),   # re-admitted after state eviction
        (2, "2024-01-01T11:00:00"),
    ]


def test_t4_watermark_drops_late_rows(spark):
    """A row arriving after the watermark passed its window is dropped
    from the append-mode aggregate."""
    base = tempfile.mkdtemp(prefix="css_late_")
    d = os.path.join(base, "events")
    os.makedirs(d)
    from datetime import datetime

    on_time = [
        (1, datetime(2024, 1, 1, 10, 0, 10), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 30, 0), 1, "click", 1.0, "{}"),  # advances watermark far
    ]
    late = [(3, datetime(2024, 1, 1, 10, 0, 20), 1, "click", 1.0, "{}")]  # >10 min behind
    checkpoint = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")

    def run_once():
        stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(d)
        agg = windowed_with_watermark(stream, width="60 seconds", delay="10 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: on-time rows advance the watermark to 10:20
    spark.createDataFrame(on_time, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    run_once()
    # batch 2 (restart from checkpoint — watermark persisted): a row
    # 20 min behind the watermark arrives and must be dropped
    time.sleep(0.2)
    spark.createDataFrame(late, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode("append").parquet(d)
    run_once()

    got = {r.w_start.isoformat(): r.n for r in spark.read.parquet(out).collect()}
    # the 10:00 window closed with ONE row; the late event_id=3 was dropped
    assert got.get("2024-01-01T10:00:00") == 1


def test_t6_stateful_running_counts(spark, staged):
    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    result = run_to_completion(running_counts_stream(stream), "t6_stream", "update")
    # update mode emits one row per user per batch — keep the last
    import pandas as pd

    pdf = result.toPandas()
    last = pdf.groupby("user_id").tail(1).set_index("user_id").sort_index()
    batch = running_counts_batch(load_table(spark, SF_SMOKE, "events")).toPandas()
    batch = batch.set_index("user_id").sort_index()
    assert list(last.index) == list(batch.index)
    assert (last["n_events"] == batch["n_events"]).all()
    assert (last["total_value"] - batch["total_value"]).abs().max() < 1e-6


def test_j10_stream_static_join(spark, staged):
    """J10: streaming events ⋈ static customer dimension equals the
    batch join (the static side is broadcast into every micro-batch)."""
    from pyspark.sql import functions as F

    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_mktsegment")

    def joined_counts(events_df):
        return (
            events_df.join(F.broadcast(cust), events_df.user_id == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    result = run_to_completion(joined_counts(stream), "j10_stream", "complete")
    batch = joined_counts(load_table(spark, SF_SMOKE, "events"))
    assert _rows(result, "c_mktsegment", "n") == _rows(batch, "c_mktsegment", "n")


def test_t6b_transform_with_state(spark, staged):
    """transformWithStateInPandas (Spark 4 typed-state API) running
    counts equal the batch aggregation.  Needs the RocksDB provider."""
    from chronicle_sniffer_spark.streaming.stateful import running_counts_tws, tws_available

    if not tws_available():
        pytest.skip("google.protobuf not installed — TWS state protocol unavailable")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, staged, max_files_per_trigger=2)
        result = run_to_completion(running_counts_tws(stream), "t6b_stream", "update")
        pdf = result.toPandas()
        last = pdf.groupby("user_id").tail(1).set_index("user_id").sort_index()
        batch = running_counts_batch(load_table(spark, SF_SMOKE, "events")).toPandas()
        batch = batch.set_index("user_id").sort_index()
        assert list(last.index) == list(batch.index)
        assert (last["n_events"] == batch["n_events"]).all()
        assert (last["total_value"] - batch["total_value"]).abs().max() < 1e-6
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_s6_notification_validation(spark):
    d = tempfile.mkdtemp(prefix="css_notif_")
    msgs = [
        {"filename": "capture_001.pcap", "publish_ts": "2024-01-01T00:00:00Z", "attributes": {}},
        {"filename": "", "publish_ts": "2024-01-01T00:00:01Z", "attributes": {}},
        {"filename": "../evil.pcap", "publish_ts": "2024-01-01T00:00:02Z", "attributes": {}},
        {"filename": "capture_002.pcap", "publish_ts": "2024-01-01T00:00:03Z", "attributes": {}},
    ]
    with open(os.path.join(d, "msgs.json"), "w") as f:
        f.write("\n".join(json.dumps(m) for m in msgs))
    ok = read_notifications(spark, d)
    assert sorted(r.filename for r in ok.collect()) == ["capture_001.pcap", "capture_002.pcap"]


def test_t8_s7_dlq_and_idempotency(spark):
    base = tempfile.mkdtemp(prefix="css_dlq_")
    sink = DlqSink(
        out_dir=os.path.join(base, "out"),
        state_dir=os.path.join(base, "state"),
        max_attempts=3,
        fail_filenames={"poison.pcap"},
    )
    batch = spark.createDataFrame(
        [("good_a.pcap",), ("good_b.pcap",), ("poison.pcap",)], "filename string"
    )
    # five redeliveries (the ref's Pub/Sub retry budget shape)
    for epoch in range(5):
        sink.process(batch, epoch)
    st = sink.state()
    assert sorted(st["done"]) == ["good_a.pcap", "good_b.pcap"]
    assert st["dlq"] == ["poison.pcap"]  # exactly once, after max_attempts
    assert st["attempts"]["poison.pcap"] == 3  # no further attempts once dead-lettered
    # outputs written exactly once each, still present
    outs = sorted(os.listdir(sink.out_dir))
    assert outs == ["good_a.pcap.out", "good_b.pcap.out"]
    # S7: full redelivery after completion → no duplicates, no new attempts
    before = st["attempts"]["good_a.pcap"]
    sink.process(batch, 99)
    assert sink.state()["attempts"]["good_a.pcap"] == before


def test_t9_stream_stream_interval_join(spark, staged):
    """Stream–stream watermarked interval join (clicks ⋈ purchases per
    user within 1 hour) equals the same join run as a batch plan.
    Append mode: inner-join rows emit as soon as both sides match."""
    from chronicle_sniffer_spark.streaming.joins import click_purchase_attribution

    def split(df):
        return (
            df.filter(df.event_type == "click"),
            df.filter(df.event_type == "purchase"),
        )

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    result = run_to_completion(
        click_purchase_attribution(*split(stream)), "t9_stream", "append"
    )
    batch = click_purchase_attribution(*split(load_table(spark, SF_SMOKE, "events")))
    cols = ("user_id", "click_id", "purchase_id", "purchase_value")
    assert len(_rows(batch, *cols)) > 0
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_t9c_stream_stream_full_outer_join(spark):
    """FULL OUTER stream-stream join: matched rows equal the batch
    plan everywhere; unmatched CLICKS below the click cutoff and
    unmatched PURCHASES below the purchase cutoff equal batch too
    (both sides' state provably expired and emitted); no spurious
    null rows on either side."""
    import datetime

    from pyspark.sql import functions as F

    from chronicle_sniffer_spark.streaming.joins import (
        click_purchase_attribution_full_outer,
    )
    from chronicle_sniffer_spark.streaming.runtime import stage_events_time_ordered

    def split(df):
        return (
            df.filter(df.event_type == "click"),
            df.filter(df.event_type == "purchase"),
        )

    staged2, bounds = stage_events_time_ordered(spark, SF_SMOKE, n_files=4)
    stream = read_events_stream(spark, staged2, max_files_per_trigger=2)
    result = run_to_completion(
        click_purchase_attribution_full_outer(*split(stream)), "t9c_stream", "append"
    )
    events = load_table(spark, SF_SMOKE, "events")
    batch = click_purchase_attribution_full_outer(*split(events))
    cols = ("user_id", "click_id", "purchase_id", "purchase_value")

    matched = F.col("purchase_id").isNotNull() & F.col("click_id").isNotNull()
    m_stream = _rows(result.filter(matched), *cols)
    m_batch = _rows(batch.filter(matched), *cols)
    assert len(m_batch) > 0
    assert m_stream == m_batch

    wm_last = bounds[1] - datetime.timedelta(minutes=1)
    click_cutoff = wm_last - datetime.timedelta(hours=1, seconds=1)
    p_null = F.col("purchase_id").isNull() & (F.col("click_ts") < F.lit(click_cutoff))
    assert _rows(result.filter(p_null), *cols) == _rows(batch.filter(p_null), *cols)
    assert len(_rows(batch.filter(p_null), *cols)) > 0

    purchase_cutoff = wm_last - datetime.timedelta(seconds=1)
    c_null = F.col("click_id").isNull() & (
        F.col("purchase_ts") < F.lit(purchase_cutoff)
    )
    assert _rows(result.filter(c_null), *cols) == _rows(batch.filter(c_null), *cols)
    assert len(_rows(batch.filter(c_null), *cols)) > 0

    # no spurious nulls: every stream null-side row exists in batch
    for cond in (F.col("purchase_id").isNull(), F.col("click_id").isNull()):
        s = set(map(tuple, _rows(result.filter(cond), *cols)))
        b = set(map(tuple, _rows(batch.filter(cond), *cols)))
        assert s <= b


def test_t9b_stream_stream_outer_join(spark):
    """LEFT OUTER stream–stream join equals the batch plan in the
    watermark-closed region.  Input replays in event-time order
    (time-ordered staging — the real rotated-capture regime); below
    the cutoff click_ts < wm_last - window, where wm_last is the
    watermark entering the final micro-batch, every click has either
    matched or provably expired and been emitted, so stream and batch
    agree row-for-row including null-purchase rows.  Above the cutoff
    the stream legitimately withholds unmatched clicks (their expiry
    is decided only by the post-final watermark update) — matched
    rows are still compared everywhere."""
    import datetime

    from pyspark.sql import functions as F

    from chronicle_sniffer_spark.streaming.joins import click_purchase_attribution_outer
    from chronicle_sniffer_spark.streaming.runtime import stage_events_time_ordered

    def split(df):
        return (
            df.filter(df.event_type == "click"),
            df.filter(df.event_type == "purchase"),
        )

    staged2, bounds = stage_events_time_ordered(spark, SF_SMOKE, n_files=4)
    stream = read_events_stream(spark, staged2, max_files_per_trigger=2)
    result = run_to_completion(
        click_purchase_attribution_outer(*split(stream)), "t9b_stream", "append"
    )
    events = load_table(spark, SF_SMOKE, "events")
    batch = click_purchase_attribution_outer(*split(events))
    cols = ("user_id", "click_id", "purchase_id", "purchase_value")

    # matched rows need no watermark eviction: equal everywhere
    m_stream = _rows(result.filter(F.col("purchase_id").isNotNull()), *cols)
    m_batch = _rows(batch.filter(F.col("purchase_id").isNotNull()), *cols)
    assert len(m_batch) > 0
    assert m_stream == m_batch

    # watermark entering the final micro-batch = max ts of batch 1
    # (files 0-1) minus the 1 min delay; unmatched clicks below
    # cutoff = wm_last - window were evicted+emitted before the end
    wm_last = bounds[1] - datetime.timedelta(minutes=1)
    cutoff = wm_last - datetime.timedelta(hours=1, seconds=1)
    s_rows = _rows(result.filter(F.col("click_ts") < F.lit(cutoff)), *cols)
    b_rows = _rows(batch.filter(F.col("click_ts") < F.lit(cutoff)), *cols)
    assert len(b_rows) > 0
    assert any(r[2] is None for r in b_rows)  # nulls actually exercised
    assert s_rows == b_rows

    # no spurious nulls anywhere: stream null rows are a subset of batch's
    sn = _rows(result.filter(F.col("purchase_id").isNull()), *cols)
    bn = set(_rows(batch.filter(F.col("purchase_id").isNull()), *cols))
    assert all(r in bn for r in sn)


def test_s10_python_datasource_stream_resumes(spark, tmp_path):
    """The custom Python Data Source's streaming reader checkpoints
    plain-dict offsets: each restarted run resumes at the committed
    offset and processes exactly one micro-batch (simple stream
    readers run single-batch under AvailableNow), so five runs drain
    the 5000-row source exactly once — no gaps, no duplicates."""
    from pyspark.sql import functions as F

    from chronicle_sniffer_spark.sources.packet_source import register

    register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for _ in range(5):
        stream = (
            spark.readStream.format("synth_packets")
            .option("n", 5000)
            .option("batch_size", 1000)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 5000
    assert got.select("pkt_id").distinct().count() == 5000
    assert got.agg(F.min("pkt_id"), F.max("pkt_id")).collect()[0][0:2] == (0, 4999)


def test_media_decode_stream_equals_batch(spark, tmp_path):
    """Continuous media ingest: the Arrow-batched decode operators
    compose unchanged with Structured Streaming (mapInPandas on a
    streaming DataFrame), and an AvailableNow replay over a staged
    media directory decodes exactly what the batch plan decodes — the
    shape a 100 TB training-data pipeline uses for rolling media
    drops."""
    from chronicle_sniffer_spark.operators.multimodal import (
        MEDIA_DDL,
        jpeg_stats,
        synthesize_jpeg_corpus,
    )
    from chronicle_sniffer_spark.streaming.runtime import run_to_completion

    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 60)
    media = synthesize_jpeg_corpus(docs)
    staged = str(tmp_path / "media")
    media.repartition(4).write.mode("overwrite").parquet(staged)

    stream = (
        spark.readStream.schema(MEDIA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    result = run_to_completion(jpeg_stats(stream), "media_stream", "append")
    batch = jpeg_stats(spark.read.parquet(staged))
    cols = ("media_id", "width", "height", "n_pixels", "mean_gray")
    assert sorted(tuple(r) for r in result.select(*cols).collect()) == sorted(
        tuple(r) for r in batch.select(*cols).collect()
    )
    assert result.count() > 0


def test_t12_m4_stream_equals_batch(spark, staged):
    """M4 downsampling is associative/order-independent by
    construction, so the SAME expression maintained incrementally in
    streaming state must equal the batch plan — including first/last,
    which would diverge under redelivery/ordering if they were
    positional instead of key-ordered."""
    from chronicle_sniffer_spark.streaming.windows import m4_windowed

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    result = run_to_completion(m4_windowed(stream), "t12_stream", "complete")
    batch = m4_windowed(load_table(spark, SF_SMOKE, "events"))
    cols = ("w_start", "event_type", "n_events", "min_v", "max_v", "first_v", "last_v")
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_t9d_semi_stream_equals_batch(spark, staged):
    """LEFT SEMI stream-stream join: converted clicks emitted exactly
    once each, stream ≡ batch, and no purchase columns leak."""
    from chronicle_sniffer_spark.streaming.joins import clicks_with_conversion_semi

    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    s_clicks = stream.filter(F.col("event_type") == "click")
    s_purch = stream.filter(F.col("event_type") == "purchase")
    result = run_to_completion(
        clicks_with_conversion_semi(s_clicks, s_purch), "t9d_stream", "append"
    )
    batch_ev = load_table(spark, SF_SMOKE, "events")
    b = clicks_with_conversion_semi(
        batch_ev.filter(F.col("event_type") == "click"),
        batch_ev.filter(F.col("event_type") == "purchase"),
    )
    assert result.columns == ["user_id", "click_id", "click_ts"]
    got = _rows(result, "user_id", "click_id")
    expect = _rows(b, "user_id", "click_id")
    assert got == expect and len(got) > 0
    assert len({c for _, c in got}) == len(got)  # each click at most once


def test_t13_checkpoint_restart_no_dups_no_loss(spark):
    """File-source exactly-once across a RESTART: run an AvailableNow
    pass over 4 staged files into a durable parquet sink with a
    checkpoint, then add 2 more files and run a SECOND query from the
    SAME checkpoint — the sink must end with every row exactly once
    (old files not reprocessed, new files not missed)."""
    import shutil

    base = tempfile.mkdtemp(prefix="css_restart_")
    stage_all = os.path.join(base, "all")
    stream_dir = os.path.join(base, "stream")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(stream_dir)
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(6).write.mode("overwrite").parquet(stage_all)
    files = sorted(
        f for f in os.listdir(stage_all) if f.endswith(".parquet")
    )
    assert len(files) == 6

    def run_pass():
        stream = read_events_stream(spark, stream_dir, max_files_per_trigger=1)
        q = (
            stream.select("event_id", "user_id", "value")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:4]:
        shutil.copy(os.path.join(stage_all, f), os.path.join(stream_dir, f))
    run_pass()
    n_first = spark.read.parquet(sink).count()
    assert n_first == spark.read.parquet(
        *[os.path.join(stage_all, f) for f in files[:4]]
    ).count()

    for f in files[4:]:
        shutil.copy(os.path.join(stage_all, f), os.path.join(stream_dir, f))
    run_pass()  # second query instance, same checkpoint = a restart
    out = spark.read.parquet(sink)
    assert out.count() == ev.count()  # no loss
    assert out.select("event_id").distinct().count() == ev.count()  # no dups


def test_t11_stream_maintained_sessions_equal_batch(spark, staged):
    """Stream-maintained session table (foreachBatch interval-union
    merge, streaming/sessions.py) must equal the one-shot batch
    sessionization of the same events — across micro-batch boundaries
    and with files delivered 2 at a time (so sessions DO span
    batches), plus a replayed epoch that must not double-count."""
    import tempfile as _tf

    from chronicle_sniffer_spark.plans.coverage5 import SESSION_GAP_MIN
    from chronicle_sniffer_spark.streaming.sessions import (
        _read_table,
        maintain_sessions,
        merge_session_batch,
    )
    from chronicle_sniffer_spark.streaming.runtime import read_events_stream
    from pyspark.sql import Window as W

    gap_us = SESSION_GAP_MIN * 60 * 1000000
    table_dir = os.path.join(_tf.mkdtemp(prefix="css_t11_"), "sessions")
    ckpt = _tf.mkdtemp(prefix="css_t11_ckpt_")
    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    got = maintain_sessions(stream, table_dir, ckpt, gap_us)

    ev = load_table(spark, SF_SMOKE, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(w)
    marked = ev.select(
        "user_id", "ts", "event_id",
        F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0).alias("st"),
    )
    wrun = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    want = (
        marked.select("user_id", "ts", F.sum("st").over(wrun).alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts").cast("timestamp")).alias("s"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("e"),
            F.count("*").cast("bigint").alias("n"),
        )
        .drop("sid")
    )
    cols = ("user_id", "s", "e", "n")
    assert _rows(got, *cols) == _rows(want, *cols)
    # sessions must actually span micro-batch boundaries for this to
    # prove anything: multi-fragment merges happened iff some session
    # holds more events than any single file could... cheaper: at least
    # one stored session has n > 1 (fragments merged at SOME point)
    assert got.filter(F.col("n") > 1).count() > 0
    # replayed epoch (at-least-once redelivery) is a no-op
    before = _rows(_read_table(spark, table_dir), *cols)
    merge_session_batch(spark, table_dir, ev.limit(50), epoch_id=0, gap_us=gap_us)
    assert _rows(_read_table(spark, table_dir), *cols) == before


def test_t11_crash_never_exposes_mixed_epochs(spark, tmp_path):
    """Round-10 verdict item 4: the old dynamic-partition-overwrite
    protocol delegated bucket replacement to the file committer, so a
    crash MID-JOB could leave some buckets at epoch E and others at
    E-1 (each bucket consistent, the cross-bucket read NOT a
    snapshot).  The manifest protocol (streaming/manifest.py) stages
    write-once files and publishes with ONE atomic rename — inject a
    crash BETWEEN the data write and the manifest flip and prove a
    reader sees exactly the pre-crash snapshot (never a mix), then
    that redelivery completes the merge exactly once."""
    from chronicle_sniffer_spark.streaming import manifest as mf
    from chronicle_sniffer_spark.streaming.sessions import (
        _read_table,
        merge_session_batch,
    )

    gap_us = 60 * 60 * 1000000
    ev = load_table(spark, SF_SMOKE, "events")
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    cols = ("user_id", "s", "e", "n")

    want_dir = str(tmp_path / "want")
    merge_session_batch(spark, want_dir, b0, 0, gap_us)
    merge_session_batch(spark, want_dir, b1, 1, gap_us)
    want = _rows(_read_table(spark, want_dir), *cols)

    crash_dir = str(tmp_path / "crash")
    merge_session_batch(spark, crash_dir, b0, 0, gap_us)
    v0 = mf.latest_version(crash_dir)
    before = _rows(_read_table(spark, crash_dir), *cols)
    # epoch 1 writes ALL its staged bucket files, then crashes before
    # the manifest flip — the worst case for the old protocol
    import pytest as _pt

    with _pt.raises(RuntimeError, match="injected crash"):
        merge_session_batch(
            spark, crash_dir, b1, 1, gap_us, fail_before_commit=True
        )
    # the staged (unpublished) epoch-1 data exists on disk...
    assert os.path.isdir(os.path.join(crash_dir, "data", "commit=1"))
    # ...but the manifest never flipped: a reader resolves the
    # IDENTICAL pre-crash snapshot — zero mixed-epoch exposure
    assert mf.latest_version(crash_dir) == v0
    assert _rows(_read_table(spark, crash_dir), *cols) == before
    epochs = set(mf.bucket_epochs(mf.read_manifest(crash_dir)).values())
    assert epochs == {0}

    # at-least-once redelivery of epoch 1 completes the merge exactly
    merge_session_batch(spark, crash_dir, b1, 1, gap_us)
    assert _rows(_read_table(spark, crash_dir), *cols) == want
    # and a THIRD delivery is a pure no-op (manifest version frozen)
    v2 = mf.latest_version(crash_dir)
    merge_session_batch(spark, crash_dir, b1, 1, gap_us)
    assert mf.latest_version(crash_dir) == v2
    assert _rows(_read_table(spark, crash_dir), *cols) == want


def test_t11_snapshot_isolation_and_prune(spark, tmp_path):
    """A reader that resolved manifest version k keeps a frozen
    consistent view while later commits land (time travel), and
    prune() removes only data unreferenced by the retained manifest
    tail — never a path a retained version can resolve."""
    from chronicle_sniffer_spark.streaming import manifest as mf
    from chronicle_sniffer_spark.streaming.sessions import (
        _read_table,
        merge_session_batch,
    )

    gap_us = 60 * 60 * 1000000
    ev = load_table(spark, SF_SMOKE, "events")
    cols = ("user_id", "s", "e", "n")
    table = str(tmp_path / "t")
    merge_session_batch(spark, table, ev.filter(F.col("event_id") % 3 == 0), 0, gap_us)
    v0 = mf.latest_version(table)
    at_v0 = _rows(_read_table(spark, table, version=v0), *cols)
    merge_session_batch(spark, table, ev.filter(F.col("event_id") % 3 == 1), 1, gap_us)
    merge_session_batch(spark, table, ev.filter(F.col("event_id") % 3 == 2), 2, gap_us)
    # time travel: version v0 still reads byte-identically
    assert _rows(_read_table(spark, table, version=v0), *cols) == at_v0
    latest = _rows(_read_table(spark, table), *cols)
    assert latest != at_v0
    # prune to the last 2 versions: v0 drops, latest survives intact
    removed = mf.prune(table, keep_last=2)
    assert any(r.startswith("manifest/") for r in removed)
    assert _rows(_read_table(spark, table), *cols) == latest
    # every retained version still resolves (no referenced dir lost)
    for v in (mf.latest_version(table) - 1, mf.latest_version(table)):
        _read_table(spark, table, version=v).count()


def test_manifest_prune_survives_noncontiguous_retained_range(tmp_path):
    """prune() after an earlier, more aggressive prune: the retained
    version range spans versions that no longer exist on disk, and the
    loop must skip them instead of crashing on a missing v{N}.json
    (round-11 advisor finding); read_manifest() of an explicitly-named
    pruned version RAISES — a time-travel read of a pruned snapshot
    must fail loudly, never silently serve an empty table (round-12
    advisor finding)."""
    import os

    import pytest as _pytest

    from chronicle_sniffer_spark.streaming import manifest as mf

    table = str(tmp_path / "t")
    for epoch in range(4):
        d = mf.staging_dir(table, epoch)
        os.makedirs(os.path.join(d, f"bucket={epoch % 2}"))
        mf.commit(table, epoch, [epoch % 2])
    mf.prune(table, keep_last=1)  # drops v0..v2
    with _pytest.raises(FileNotFoundError, match="version 1"):
        mf.read_manifest(table, 1)  # explicit pruned version
    assert mf.read_manifest(table, 1, missing_ok=True) is None  # prune's view
    # the wider re-prune's keep range {1,2,3} includes deleted versions
    removed = mf.prune(table, keep_last=3)
    assert mf.latest_version(table) == 3
    assert mf.read_manifest(table, 3) is not None
    assert all(not r.endswith("v3.json") for r in removed)
