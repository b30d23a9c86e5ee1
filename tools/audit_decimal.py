"""Audit: no catalog plan may contain a PRECISION-DEMOTED decimal.

Spark caps decimal precision at 38; when an arithmetic result would
need more (e.g. decimal(20,9) × bigint→decimal(20,0) ⇒ precision 41),
``spark.sql.decimalOperations.allowPrecisionLoss`` (default true)
silently reduces the SCALE to fit — each intermediate value is rounded
(to 6 dp in the round-6 `ml2b_nb_classify` driver hash mismatch)
while oracles compute at full scale.

Detection walks every expression of every ANALYZED plan via py4j and,
for each decimal Multiply/Add/Subtract/Sum, compares the RESULT scale
against the exact-arithmetic ideal (s1+s2 for ×, max(s1,s2) for ±,
child scale for SUM): a smaller result scale means allowPrecisionLoss
rounded the intermediate.  A result at precision 38 whose scale still
equals the ideal (e.g. decimal(18,2)×decimal(19,2) → decimal(38,4))
is EXACT and allowed — the precision cap only bites when the scale
shrinks.  The plan STRING is not enough — analyzed plans print
explicit casts but not arithmetic result types, so a demoted product
is invisible textually.

Usage: python tools/audit_decimal.py [query ...]   (exit 1 on hits)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronicle_sniffer_spark.plans import registry
from chronicle_sniffer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

_DEC = re.compile(r"^decimal\((\d+),(\d+)\)$")


def _dec(e):
    try:
        m = _DEC.match(e.dataType().simpleString())
        return (int(m.group(1)), int(m.group(2))) if m else None
    except Exception:  # noqa: BLE001 — not every node has a resolvable type
        return None


def _walk_expr(e, hits: set[str]) -> None:
    try:
        cls = e.getClass().getSimpleName()
    except Exception:  # noqa: BLE001
        cls = ""
    res = _dec(e)
    if res is not None and cls in ("Multiply", "Add", "Subtract", "Sum"):
        ch = e.children()
        scales = []
        for i in range(ch.size()):
            cd = _dec(ch.apply(i))
            if cd is None:
                scales = None
                break
            scales.append(cd[1])
        if scales:
            ideal = sum(scales) if cls == "Multiply" else max(scales)
            if res[1] < ideal:
                hits.add(
                    f"{cls} result decimal{res} < ideal scale {ideal}"
                    f" in {e.sql()[:120]}"
                )
    ch = e.children()
    for i in range(ch.size()):
        _walk_expr(ch.apply(i), hits)


def _walk_plan(p, hits: set[str]) -> None:
    exprs = p.expressions()
    for i in range(exprs.size()):
        _walk_expr(exprs.apply(i), hits)
    ch = p.children()
    for i in range(ch.size()):
        _walk_plan(ch.apply(i), hits)
    # subqueries live off the expression tree; innerChildren covers them
    try:
        inner = p.innerChildren()
        for i in range(inner.size()):
            _walk_plan(inner.apply(i), hits)
    except Exception:  # noqa: BLE001
        pass


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("audit_decimal")
    bad: list[tuple[str, str]] = []
    n = 0
    for name, spec in sorted(registry().items()):
        if only and name not in only:
            continue
        n += 1
        try:
            df = spec.spark_fn(spark, SF_DIR)
            hits: set[str] = set()
            _walk_plan(df._jdf.queryExecution().analyzed(), hits)
        except Exception as exc:  # noqa: BLE001 — report, don't mask
            bad.append((name, f"plan build failed: {exc}"))
            continue
        for h in sorted(hits):
            bad.append((name, h))
    for name, why in bad:
        print(f"DEMOTED {name}: {why}")
    print(f"{len(bad)} suspect decimal expressions / {n} entries")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
