"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared catalog from
``chronicle_sniffer_spark.plans`` (SURVEY.md §2B).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from chronicle_sniffer_spark.plans import registry  # noqa: E402


def _driver_status() -> dict[str, str]:
    """name -> 'green' | 'red' | 'no_oracle', from the committed
    CORRECTNESS_r*.json files.

    Later rounds override earlier ones, so this self-maintains as the
    driver's gate results accumulate in the repo.
    """
    status: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                status[name] = "no_oracle"
            elif (
                bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                status[name] = "green"
            else:
                status[name] = "red"
    return status


def _round_key() -> int:
    """Upcoming round number = committed CORRECTNESS files + 1."""
    return len(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))) + 1


def _ordered_specs():
    """Registry entries, never-driver-checked first, then greens in a
    round-rotated order.

    The driver's gate records rows for only the first ~50 enumerated
    queries, so enumeration order decides which entries get a hard
    correctness row.  Rank: (0) no driver row yet — including a
    formerly rows-only entry that has since GAINED an oracle, whose
    old `no_oracle` row verified nothing — (1) driver row but red —
    both in stable registration order — then (2) all greens, ordered
    by md5(round:name), and finally (3) entries that are rows-only BY
    DESIGN (no oracle declared).  The round-keyed hash reshuffles the
    green block deterministically every round, so with ~50 slots over
    ~140 greens every entry is re-checked within a few rounds instead
    of the same lowest-ranked 50 forever.  Permanent rows-only entries
    sort last because their driver row re-verifies nothing the pytest
    suite doesn't already cover — burning 4 of ~50 gate slots on them
    every round cost ~8% of green-rotation coverage (round-4 verdict)."""
    import hashlib

    status = _driver_status()
    rnd = _round_key()

    def sort_key(item):
        name, spec = item
        st = status.get(name)
        rotation = hashlib.md5(f"r{rnd}:{name}".encode()).hexdigest()
        if spec.oracle is None:
            return (3, rotation)
        if st is None or st == "no_oracle":
            # never checked, or only ever recorded a weak rows-only row
            # (e.g. the entry gained an oracle after its last record)
            return (0, "")
        if st == "red":
            return (1, "")
        return (2, rotation)

    return sorted(registry().items(), key=sort_key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    return reg["a1_q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog entry."""
    return {name: spec.oracle for name, spec in _ordered_specs() if spec.oracle is not None}
