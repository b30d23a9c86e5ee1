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

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_stream(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """T5: exactly-once per event_id within the watermark horizon.
    State is bounded by the watermark — at 100 TB/day the dedup map
    holds only `delay` worth of keys per partition."""
    return events.withWatermark("ts", delay).dropDuplicates(["event_id"])


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
    exactly once.  Attempt counts persist in ``state_dir`` so the
    contract survives restarts (the reference delegates this to
    Pub/Sub's delivery accounting).
    """

    out_dir: str
    state_dir: str
    max_attempts: int = 5
    fail_filenames: set[str] = field(default_factory=set)  # test hook: simulated failures

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "attempts.json")

    def _load(self) -> dict:
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"attempts": {}, "done": [], "dlq": []}

    def _save(self, st: dict) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self._state_path())  # atomic commit marker (R5)

    def process(self, batch_df: DataFrame, epoch_id: int) -> None:
        st = self._load()
        os.makedirs(self.out_dir, exist_ok=True)
        # small per-batch control metadata — the data plane stays distributed;
        # only filenames (the reference's IR, SURVEY §3) reach the driver
        for row in batch_df.select("filename").distinct().collect():
            fn = row.filename
            if fn in st["done"] or fn in st["dlq"]:
                continue  # redelivery of a completed file: idempotent no-op
            attempts = st["attempts"].get(fn, 0) + 1
            st["attempts"][fn] = attempts
            try:
                if fn in self.fail_filenames:
                    raise RuntimeError(f"simulated processing failure for {fn}")
                out = os.path.join(self.out_dir, fn + ".out")
                with open(out, "w") as f:
                    f.write(f"processed epoch={epoch_id}\n")
                st["done"].append(fn)
            except Exception:  # noqa: BLE001
                if attempts >= self.max_attempts:
                    st["dlq"].append(fn)  # dead-letter exactly once
        self._save(st)

    def state(self) -> dict:
        return self._load()
