"""Delivery-reliability patterns: streaming dedup (T5), idempotent
file sink (S7), bounded-attempt DLQ (T8), queue-source emulation (S6).

These re-express the reference's Pub/Sub + Cloud Run reliability
contract (SURVEY §2C.8):

- redelivered filename ⇒ no duplicate outputs (blob-overwrite
  idempotency, processor_app.py:171; processed-set dedup,
  sniffer_entrypoint.sh:117-128)
- transient failure ⇒ retry; 5 failed deliveries ⇒ DLQ
  (terraform/main.tf:219-222)
- missing object ⇒ ack-and-skip, never retry (processor_app.py:181-183)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_stream(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """T5: exactly-once per event_id within the watermark horizon.
    State is bounded by the watermark — at 100 TB/day the dedup map
    holds only `delay` worth of keys per partition."""
    return events.withWatermark("ts", delay).dropDuplicates(["event_id"])


def dedup_stream_within_watermark(
    events: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """T5b: ``dropDuplicatesWithinWatermark`` (Spark 3.5+) — the
    variant whose state is ALWAYS watermark-evicted.  Plain
    ``dropDuplicates`` only expires state when the event-time column
    is itself part of the dedup key; keyed on a pure id (the common
    case — upstream redelivery produces the same event_id with the
    same ts), its state map grows without bound.  This form keeps the
    id-only key AND bounds state to the watermark horizon — the
    correct 100 TB/day shape for at-least-once sources."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


def read_notifications(spark: SparkSession, path: str) -> DataFrame:
    """S6: Pub/Sub-shaped queue emulation — a directory of JSON
    messages ``{filename, publish_ts, attributes}`` (the push envelope
    carries a base64 filename, processor_app.py:120-133; emulated
    offline per SURVEY §4.3-2)."""
    schema = "filename string, publish_ts timestamp, attributes map<string,string>"
    df = spark.read.schema(schema).json(path)
    # filename validation as in the reference: non-empty, no slash (R7)
    return df.filter(
        F.col("filename").isNotNull()
        & (F.col("filename") != "")
        & ~F.col("filename").contains("/")
    )


@dataclass
class DlqSink:
    """T8/S7: foreachBatch sink with filename-keyed idempotency and
    bounded-attempt dead-lettering.

    ``process(batch)`` is called per micro-batch with rows carrying a
    ``filename`` key.  Output files are written once per filename
    (overwrite = idempotent under redelivery); a failing filename is
    retried up to ``max_attempts`` deliveries, then routed to the DLQ
    exactly once.

    The ledger is EXECUTOR-SIDE marker files under ``state_dir``
    (``done/<fn>``, ``dlq/<fn>``, ``attempts/<fn>/<k>``) — one write
    per filename event, no driver ``collect()`` and no single mutable
    state blob.  ``distinct()`` gives each filename exactly one owner
    task per batch, so marker writes never race; on a cluster the same
    layout lands on shared storage (the pattern of Spark's own
    ``_spark_metadata`` commit logs).  Earlier rounds collected the
    filenames to the driver and rewrote one attempts.json per batch —
    bounded by ``maxFilesPerTrigger``, but a needless driver hop and a
    serialization point at 100× the file count.  The reference
    delegates this accounting to Pub/Sub delivery counts.
    """

    out_dir: str
    state_dir: str
    max_attempts: int = 5
    fail_filenames: set[str] = field(default_factory=set)  # test hook: simulated failures

    def process(self, batch_df: DataFrame, epoch_id: int) -> None:
        out_dir, state_dir = self.out_dir, self.state_dir
        max_attempts, fail = self.max_attempts, set(self.fail_filenames)

        def handle(rows) -> None:
            import os as _os

            for row in rows:
                fn = row.filename
                done_m = _os.path.join(state_dir, "done", fn)
                dlq_m = _os.path.join(state_dir, "dlq", fn)
                if _os.path.exists(done_m) or _os.path.exists(dlq_m):
                    continue  # redelivery of a completed file: idempotent no-op
                att_dir = _os.path.join(state_dir, "attempts", fn)
                _os.makedirs(att_dir, exist_ok=True)
                attempts = len(_os.listdir(att_dir)) + 1
                with open(_os.path.join(att_dir, f"{attempts:06d}"), "w") as f:
                    f.write(f"epoch={epoch_id}\n")
                try:
                    if fn in fail:
                        raise RuntimeError(f"simulated processing failure for {fn}")
                    _os.makedirs(out_dir, exist_ok=True)
                    out = _os.path.join(out_dir, fn + ".out")
                    tmp = out + ".tmp"
                    with open(tmp, "w") as f:
                        f.write(f"processed epoch={epoch_id}\n")
                    _os.replace(tmp, out)  # atomic publish (R5)
                    _os.makedirs(_os.path.dirname(done_m), exist_ok=True)
                    with open(done_m, "w") as f:
                        f.write(f"epoch={epoch_id}\n")
                except Exception:  # noqa: BLE001
                    if attempts >= max_attempts:
                        _os.makedirs(_os.path.dirname(dlq_m), exist_ok=True)
                        with open(dlq_m, "w") as f:
                            f.write(f"epoch={epoch_id}\n")  # dead-letter exactly once

        batch_df.select("filename").distinct().foreachPartition(handle)

    def state(self) -> dict:
        """Aggregate the marker ledger into the classic shape
        ``{attempts: {fn: n}, done: [...], dlq: [...]}``."""

        def names(sub: str) -> list[str]:
            try:
                return sorted(os.listdir(os.path.join(self.state_dir, sub)))
            except FileNotFoundError:
                return []

        attempts = {
            fn: len(os.listdir(os.path.join(self.state_dir, "attempts", fn)))
            for fn in names("attempts")
        }
        return {"attempts": attempts, "done": names("done"), "dlq": names("dlq")}
