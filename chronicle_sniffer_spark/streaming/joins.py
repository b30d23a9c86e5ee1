"""Stream–stream joins (Structured Streaming; completes the join
surface beyond J10's stream–static case).

The reference correlates two event streams only implicitly — the
dashboard charts upload events against processing-latency events by
label (`terraform/dashboards/main_operational_dashboard.json:30-128`).
Here that becomes a first-class *watermarked interval equi-join*: two
streams co-partitioned by key, each side buffering state bounded by
its watermark plus the join's time interval.

Scale notes (100 TB): state size = key cardinality × interval width —
the watermark delay is the knob that bounds it; both sides shuffle
once on the join key into the same state-store partitioning, so the
join adds exactly one stateful stage.  AQE does not apply inside a
streaming stage: size `spark.sql.shuffle.partitions` to the key
cardinality up front (state-store partition count is fixed at first
checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark_delay: str = "45 days",
) -> DataFrame:
    """Inner stream–stream join: purchases attributed to a same-user
    click at-or-before the purchase within ``attribution_window``.

    Both inputs need ``user_id``, ``event_id``, ``ts``, ``value``.
    The interval condition (purchase.ts in [click.ts, click.ts + w])
    lets Spark expire click state once the purchase-side watermark
    passes click.ts + w.  Works identically on static DataFrames, so
    tests assert stream ≡ batch on the same inputs.
    """
    c = (
        clicks.withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def click_purchase_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """LEFT OUTER stream–stream join: every click emits, with its
    attributed purchase when one exists and nulls otherwise.

    Outer stream–stream semantics (Structured Streaming): a matched
    row emits as soon as both sides meet; an UNMATCHED click emits
    only once the watermark proves no purchase can still arrive —
    i.e. when watermark > click_ts + attribution_window.  State stays
    bounded by the same rule.  The default watermark delay here is
    deliberately small (unlike the inner variant's 45 days) because
    null-side emission waits on watermark advancement; tests compare
    against the batch plan below a click_ts cutoff of
    max(ts) - window - delay, the region where stream and batch
    provably agree.
    """
    c = clicks.withWatermark("ts", watermark_delay).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark_delay).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")),
        "left_outer",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def click_purchase_attribution_full_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """FULL OUTER stream–stream join (T9c): every click AND every
    purchase emits — matched pairs as soon as both sides meet,
    unmatched rows once the watermark proves no partner can still
    arrive.  The interval condition bounds BOTH states: click state
    expires when the watermark passes click_ts + window (no later
    purchase can match), purchase state when it passes purchase_ts
    (every matching click has click_ts ≤ purchase_ts, and arrivals
    are watermark-late beyond that).  This is the audit-complete
    attribution table — unmatched purchases are exactly the
    'conversion with no tracked click' rows a funnel report must not
    silently drop.  Works identically on static DataFrames, so tests
    assert stream ≡ batch in the watermark-closed region."""
    c = clicks.withWatermark("ts", watermark_delay).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark_delay).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")),
        "full_outer",
    ).select(
        F.coalesce("c_user", "p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def clicks_with_conversion_semi(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark_delay: str = "45 days",
) -> DataFrame:
    """T9d: LEFT SEMI stream-stream join — emit each click exactly once
    iff SOME same-user purchase lands within ``attribution_window``
    after it; purchase columns never surface, so no duplication when
    several purchases qualify (the EXISTS shape, as a streaming join).

    State story: identical to the inner join — both sides keyed on
    user_id in the same state-store partitioning; the time-interval
    condition lets the engine drop click state once the purchase-side
    watermark passes click.ts + window, and purchase state once seen.
    Works identically on static DataFrames (tests assert stream ≡
    batch).
    """
    c = clicks.withWatermark("ts", watermark_delay).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark_delay).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        "left_semi",
    ).select(F.col("c_user").alias("user_id"), "click_id", "click_ts")
