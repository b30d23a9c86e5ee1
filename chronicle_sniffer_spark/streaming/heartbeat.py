"""Heartbeat / liveness surface (ref R6 + the inactive-sniffer alert).

The reference emits ``TSHARK_STATUS: running|stopped`` every 60 s from
a background loop (`sniffer/sniffer_entrypoint.sh:93-104,114`) and
alerts when a sniffer's heartbeat metric is absent for a window
(`terraform/main.tf:583-622`).  Engine equivalents:

- :func:`heartbeat_source` — a rate-source stream shaped like the
  reference's log lines (one per sniffer per tick);
- :func:`liveness_windows` — per-sniffer per-window heartbeat counts;
- :func:`inactive_alerts` — the alert: for each observed time window,
  every registered sniffer with NO heartbeat in that window.  Absence
  can't fall out of a groupBy (no rows → no group), so the plan is
  windows × registered-sniffers (broadcast cross of two tiny dims)
  anti-joined against observed pairs — the R3-style anti-join again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def heartbeat_source(
    spark: SparkSession, n_sniffers: int = 3, rows_per_second: int = 10
) -> DataFrame:
    """Streaming heartbeat lines from the rate source (live-demo path;
    tests replay file-backed heartbeats instead for determinism)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    sniffer = F.concat(F.lit("sniffer-"), (F.col("value") % n_sniffers).cast("string"))
    return rate.select(
        F.col("timestamp").alias("ts"),
        sniffer.alias("sniffer_id"),
        F.concat(F.lit("TSHARK_STATUS: running (sniffer: "), sniffer, F.lit(")")).alias("line"),
    )


def parse_heartbeats(lines: DataFrame) -> DataFrame:
    """R27-style regex extraction over heartbeat log lines."""
    return lines.select(
        "ts",
        F.regexp_extract("line", r"sniffer: ([^)]+)", 1).alias("sniffer_id"),
        F.regexp_extract("line", r"TSHARK_STATUS: (\w+)", 1).alias("status"),
    )


def liveness_windows(heartbeats: DataFrame, width: str = "60 seconds") -> DataFrame:
    """Per-sniffer per-window heartbeat counts (the log-based metric)."""
    return (
        heartbeats.groupBy(F.window("ts", width).alias("w"), "sniffer_id")
        .agg(
            F.count("*").alias("n_beats"),
            F.count(F.when(F.col("status") == "running", 1)).alias("n_running"),
        )
        .select(F.col("w.start").alias("w_start"), "sniffer_id", "n_beats", "n_running")
    )


def inactive_alerts(
    heartbeats: DataFrame, registered: DataFrame, width: str = "60 seconds"
) -> DataFrame:
    """(w_start, sniffer_id) pairs where a registered sniffer emitted no
    heartbeat during an observed window — the terraform alert condition.

    ``registered`` is the (tiny) sniffer registry; both build sides of
    the cross join are bounded (windows in the evaluation horizon ×
    fleet size), the anti-join probe is the only large input.
    """
    observed = liveness_windows(heartbeats, width).select("w_start", "sniffer_id")
    windows = observed.select("w_start").distinct()
    expected = windows.crossJoin(F.broadcast(registered.select("sniffer_id")))
    return expected.join(observed, ["w_start", "sniffer_id"], "left_anti")
