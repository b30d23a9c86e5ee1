"""Skew mitigation (SURVEY §4.4): salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew
for *joins*; salting is the complementary technique for

- **aggregations** whose hot grouping key overwhelms one reducer: a
  two-phase salted aggregate turns one giant partition into N partial
  partitions plus a tiny final merge (valid for algebraic aggregates —
  sum/count/min/max — whose partials compose);
- **joins against a dimension with hot keys** when AQE can't split
  (e.g. the skew is in a broadcast-ineligible mid-size dim): the dim
  side is replicated once per salt, the fact side picks a
  deterministic salt, and the hot key's rows spread over N tasks.

Salts are deterministic (hash of a secondary column, not rand()), so
results are reproducible and retries are safe — Spark task retry with
rand()-salting silently corrupts joins (a retried task re-draws salts
while its partner side kept the old ones).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(secondary: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(secondary), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_on: str,
    n_salts: int = 16,
    *,
    sums: dict[str, str] | None = None,
    count_alias: str | None = "n",
) -> DataFrame:
    """Two-phase aggregate: groupBy(keys ∪ salt) partial → groupBy(keys)
    final.  ``sums`` maps input column → output alias; partial counts
    re-aggregate as sums."""
    sums = sums or {}
    salted = df.withColumn("_salt", _salt(F.col(salt_on), n_salts))
    partial_aggs = [F.sum(c).alias(f"_p_{a}") for c, a in sums.items()]
    if count_alias:
        partial_aggs.append(F.count("*").alias("_p_n"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"_p_{a}").alias(a) for a in sums.values()]
    if count_alias:
        final_aggs.append(F.sum("_p_n").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the dim side replicated per salt and the
    fact side salted deterministically from ``salt_on``.  Each hot key
    spreads across ``n_salts`` reducers instead of one."""
    dim_rep = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    fact_s = fact.withColumn("_salt", _salt(F.col(salt_on), n_salts))
    return fact_s.join(dim_rep, [key, "_salt"], "inner").drop("_salt")
