"""Local stand-in for the driver's correctness gate.

Runs every catalog query through Spark AND its DuckDB oracle on the
same parquet tables, canonicalizes both results (columns sorted by
name, doubles at FULL shortest-round-trip precision, rows sorted),
and reports match/mismatch.  Integral doubles canonicalize as ints so
a DuckDB HUGEINT->float64 vs Spark BIGINT difference stays benign.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql.types import DateType

from chronicle_sniffer_spark.canon import canon_rows
from chronicle_sniffer_spark.plans import registry
from chronicle_sniffer_spark.session import get_spark
from chronicle_sniffer_spark.tables import TABLE_NAMES


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    reg = registry()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, spec in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            dcols = [f.name for f in sdf.schema.fields if isinstance(f.dataType, DateType)]
            if dcols:
                print(f"WARN {name}: Spark DateType output columns {dcols} — "
                      f"cast to TIMESTAMP on both sides for driver hash parity")
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = list(map(tuple, spdf.itertuples(index=False, name=None)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            n_fail += 1
            continue
        if spec.oracle is None:
            n_rows_only += 1
            print(f"rows {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(spec.oracle)
            huge = [c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t)]
            opdf = rel.df()
            ocols = list(opdf.columns)
            orows = list(map(tuple, opdf.itertuples(index=False, name=None)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            n_fail += 1
            continue
        if huge:
            print(f"WARN {name}: oracle columns typed HUGEINT {huge} — "
                  f"wrap in CAST(... AS BIGINT) for driver hash parity")
        s_c = canon_rows(scols, srows)
        o_c = canon_rows(ocols, orows)
        schema_ok = sorted(scols) == sorted(ocols)
        if schema_ok and s_c == o_c:
            n_pass += 1
            print(f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: schema_ok={schema_ok} spark_cols={sorted(scols)} "
                  f"oracle_cols={sorted(ocols)} rows {len(s_c)} vs {len(o_c)}")
            for i, (a, b) in enumerate(zip(s_c, o_c)):
                if a != b:
                    print(f"  first diff row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
            else:
                if len(s_c) != len(o_c):
                    print(f"  row count differs; spark[:2]={s_c[:2]} oracle[:2]={o_c[:2]}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failures:
        print("failing:", " ".join(failures))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
