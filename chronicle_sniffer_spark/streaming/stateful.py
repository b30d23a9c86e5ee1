"""T6: custom stateful processing — per-key running aggregates via
``applyInPandasWithState`` (Arrow-batched state updates).

Generalizes the reference's attempt-tracking / per-file counter state
(R23, R26): the reference keeps counters in process memory for the
lifetime of one file conversion; here state is keyed, checkpointed,
and incremental across micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_counts_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) — state carried across
    micro-batches; emits the updated totals each batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts_batch(events: DataFrame) -> DataFrame:
    """Batch oracle for the stateful stream: same totals, plain agg."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
