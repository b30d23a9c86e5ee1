"""Focused tests for round-14 optimization internals.

The ts8/ts9/ts22 rework replaced one-Python-call-per-group
(applyInPandas) with a single mapInPandas pass whose per-user
recursion state is carried ACROSS Arrow batch boundaries.  At the
shipped fixture scales every partition fits in one default-size
Arrow batch (sf0.1: ~3k rows/partition vs the 10k default), so the
carry path — state spanning batches, the mid-stream flush, a user
ending exactly on a batch edge — is never executed by the oracle
gates.  These tests force tiny batches so that path runs.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "entry",
    ["ts8_ewma_smoothing", "ts9_holt_linear", "ts22_holt_winters"],
)
def test_recursion_state_carries_across_arrow_batches(spark, entry):
    """Results must be identical whether a user's rows arrive in one
    Arrow batch or straddle many: batch size is an execution detail,
    not part of the recursion's semantics."""
    from chronicle_sniffer_spark.plans import registry

    fn = registry()[entry].spark_fn
    default = spark.conf.get(_BATCH_CONF)
    baseline = _rows(fn(spark, SF_SMOKE))
    # sf0.001 partitions hold ~31 rows for ~5 users: batch=7 puts
    # nearly every user across a batch edge and fires the mid-stream
    # flush several times per partition.
    spark.conf.set(_BATCH_CONF, "7")
    try:
        tiny = _rows(fn(spark, SF_SMOKE))
    finally:
        spark.conf.set(_BATCH_CONF, default)
    assert tiny == baseline
    assert len(baseline) > 0


def test_session_disables_dataframe_debugging(spark):
    """Plan construction is serial driver work; the per-call origin
    capture of PySpark's DataFrame-debugging feature measured ~45% of
    large plan-build times (see session.py).  Pin the posture so a
    session-factory edit can't silently reintroduce it."""
    import pyspark.errors.utils as eu

    assert (
        spark.conf.get("spark.python.sql.dataFrameDebugging.enabled") == "false"
    )
    # Assert via the public API (which populates pyspark's lazy
    # module-level cache under the active session) rather than poking
    # the private `_enable_debugging_cache` global: the private cache
    # is None until the first wrapped call, so the old assertion
    # failed when this test ran first in isolation (r14 ADVICE).
    assert eu.is_debugging_enabled() is False
