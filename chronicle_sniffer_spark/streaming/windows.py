"""Windowed aggregations (T1-T3) — one logical plan, batch or stream.

Generalizes the reference's time-bucketed operational metrics: the
60 s tshark rotation window (sniffer_entrypoint.sh:15), the 60 s
dashboard alignment + rates (dashboards/main_operational_dashboard.json:30-38),
and the heartbeat liveness window (terraform/main.tf:583-622).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Exact-decimal value sums (see plans/catalog.py rationale).
_DEC = "decimal(18,4)"


def tumbling_counts(events: DataFrame, width: str = "60 seconds") -> DataFrame:
    """T1: tumbling event-time window counts + value sum per window."""
    return (
        events.groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "total_value")
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """T2: sliding window counts (dashboard-rate shape, R28)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )


def session_aggregate(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """T3: gap-based session windows per user.

    Uses the native ``session_window`` operator — in streaming mode
    state merges sessions incrementally; in batch mode Catalyst plans
    the same merge over a single shuffle on user_id.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
            "session_value",
        )
    )


def dynamic_session_aggregate(
    events: DataFrame,
    purchase_gap: str = "45 minutes",
    default_gap: str = "10 minutes",
) -> DataFrame:
    """T3b: session windows with a DYNAMIC (per-event) gap — a
    purchase keeps the session alive longer than browsing noise, the
    engagement-modeling refinement a fixed gap cannot express.  Uses
    the native ``session_window(ts, <gap expression>)``: each event
    contributes the window [ts, ts + its own gap) and overlapping
    windows merge, in streaming state exactly as in batch."""
    gap = (
        F.when(F.col("event_type") == "purchase", F.lit(purchase_gap))
        .otherwise(F.lit(default_gap))
    )
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
            "session_value",
        )
    )


def windowed_with_watermark(
    events: DataFrame, width: str = "60 seconds", delay: str = "10 minutes"
) -> DataFrame:
    """T4: watermarked tumbling agg — late rows beyond `delay` dropped
    from the aggregate (the engine's late-data policy routes them to a
    quarantine sink instead of silent loss; see reliability.py)."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", width).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )


def m4_windowed(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """T12: M4 downsampling (plans/round8d.py ts13) as a WINDOWED
    aggregate — because every M4 measure (min/max plus lexicographic
    struct-min/max for first/last under the total (ts, event_id) key)
    is associative and order-independent, the identical expression runs
    incrementally in streaming state and in batch, and must agree.
    This is the dashboard feed shape: the stream maintains the pixel
    table; the UI only ever reads O(series x pixels) rows."""
    key = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("i"),
        F.col("value").alias("v"),
    )
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.min(key).getField("v").alias("first_v"),
            F.max(key).getField("v").alias("last_v"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "min_v",
            "max_v",
            "first_v",
            "last_v",
        )
    )
