"""Catalog entries for the streaming surface (T-series), checked in
BATCH mode against DuckDB oracles — the same logical plans run as
streams (stream-vs-batch equivalence lives in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import query
from chronicle_sniffer_spark.streaming.windows import (
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)
from chronicle_sniffer_spark.tables import load_table


@query(
    "t1_tumbling_window",
    section="T1",
    oracle="""
    SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS w_start,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def t1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60 s tumbling window agg (= the ref's rotation/dashboard cadence)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@query(
    "t2_sliding_window",
    section="T2",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS tb FROM events
    ), assigned AS (
      SELECT tb AS w_start FROM buckets
      UNION ALL
      SELECT tb - INTERVAL '5 minutes' FROM buckets
    )
    SELECT CAST(w_start AS TIMESTAMP) AS w_start, count(*) AS n
    FROM assigned GROUP BY 1
    """,
)
def t2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 min window sliding by 5 min (dashboard-rate shape, R28);
    each event lands in exactly two windows."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


@query(
    "t3_session_window",
    section="T3",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ), f AS (
      SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '5 minutes'
                     THEN 1 ELSE 0 END AS new_s
      FROM o
    ), g AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM f
    )
    SELECT user_id,
           min(ts) AS s_start,
           max(ts) + INTERVAL '5 minutes' AS s_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
    FROM g GROUP BY user_id, sid
    """,
)
def t3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window vs the classic lag+cumsum sessionization
    oracle (gap 5 min; session end = last event + gap, end-exclusive)."""
    return session_aggregate(load_table(spark, sf_dir, "events"))


@query(
    "t9_interval_join_batch",
    section="T9/J9",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_id % 2 = 0),
         p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                      value AS purchase_value
               FROM events WHERE event_id % 2 = 1)
    SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts, purchase_value
    FROM c JOIN p ON c.user_id = p.user_id
     AND purchase_ts >= click_ts
     AND purchase_ts <= click_ts + INTERVAL 1 HOUR
    """,
)
def t9_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the T9 watermarked stream-stream interval join
    (streaming/joins.py — identical plan minus the state store; the
    stream ≡ batch parity is asserted in tests/test_streaming.py).
    Gives the T9 surface a hard oracle row and a benchable shape."""
    from chronicle_sniffer_spark.streaming.joins import click_purchase_attribution

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_attribution(
        ev.filter(F.col("event_id") % 2 == 0), ev.filter(F.col("event_id") % 2 == 1)
    )


@query(
    "t5_dedup",
    section="T5",
    oracle="SELECT count(DISTINCT event_id) AS n FROM events",
)
def t5_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup of a redelivered (doubled) stream collapses to distinct
    ids (batch form; watermark-bounded stream form in reliability.py)."""
    ev = load_table(spark, sf_dir, "events")
    redelivered = ev.unionByName(ev)
    return redelivered.dropDuplicates(["event_id"]).agg(F.count("*").alias("n"))


@query(
    "t9b_outer_join_batch",
    section="T9",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                      value AS purchase_value
               FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts, purchase_value
    FROM c LEFT JOIN p ON c.user_id = p.user_id
     AND purchase_ts >= click_ts
     AND purchase_ts <= click_ts + INTERVAL 1 HOUR
    """,
)
def t9b_outer_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the T9b LEFT OUTER stream-stream join — identical
    plan minus the state store (the stream emits the same rows in the
    watermark-closed region, asserted in tests/test_streaming.py).
    Gives the outer-join streaming surface a hard oracle row."""
    from chronicle_sniffer_spark.streaming.joins import click_purchase_attribution_outer

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_attribution_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
