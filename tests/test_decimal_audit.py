"""Every catalog plan must be free of precision-demoted decimals
(tools/audit_decimal.py walks expression types; the round-6 ml2b red
row was exactly such a silent decimal(38,6) demotion)."""

from __future__ import annotations


def test_no_plan_contains_demoted_decimal(spark):
    from chronicle_sniffer_spark.plans import registry
    from tools.audit_decimal import SF_DIR, _walk_plan

    bad: list[tuple[str, str]] = []
    for name, spec in sorted(registry().items()):
        df = spec.spark_fn(spark, SF_DIR)
        hits: set[str] = set()
        _walk_plan(df._jdf.queryExecution().analyzed(), hits)
        bad.extend((name, h) for h in sorted(hits))
    assert not bad, bad
