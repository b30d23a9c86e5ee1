"""Declared query surface (SURVEY.md §2B).

``registry()`` returns the full catalog: every entry pairs a Spark
callable ``(spark, sf_dir) -> DataFrame`` with (where SQL-expressible)
an equivalent DuckDB oracle SQL string used by the correctness gate.
"""

from chronicle_sniffer_spark.plans.catalog import REGISTRY, QuerySpec, registry

__all__ = ["REGISTRY", "QuerySpec", "registry"]
