"""Cross-scale-factor oracle sweep — the committed form of the ad-hoc
practice that caught the ml14 score-rounding flake in round 9.

The driver's correctness gate runs at sf0.01 only.  Scale-dependent
bugs (rounding at different magnitudes, ties that only materialize at
certain cardinalities, df-cap thresholds crossing) are invisible to a
single-SF gate, so this sweep runs EVERY oracle-bearing registry entry
at the other two generated scale factors (sf0.001 and sf0.1) and emits
one JSON artifact the judge can diff round-over-round.

Usage:  python tools/cross_sf_sweep.py [out.json] [query ...]
        (default out: CROSS_SF_r10.json; queries default to all)

Exit status 1 iff any (entry, sf) pair mismatches.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from chronicle_sniffer_spark.canon import canon_rows
from chronicle_sniffer_spark.plans import registry
from chronicle_sniffer_spark.session import get_spark
from chronicle_sniffer_spark.tables import TABLE_NAMES

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]


def run_one(spark, con, spec, sf_dir):
    """Return (status, detail) for one entry at one SF."""
    t0 = time.time()
    try:
        sdf = spec.spark_fn(spark, sf_dir)
        spdf = sdf.toPandas()
        scols = list(spdf.columns)
        srows = list(map(tuple, spdf.itertuples(index=False, name=None)))
    except Exception as exc:  # noqa: BLE001
        return "spark_error", {"error": str(exc)[:400], "secs": round(time.time() - t0, 1)}
    try:
        opdf = con.sql(spec.oracle).df()
        ocols = list(opdf.columns)
        orows = list(map(tuple, opdf.itertuples(index=False, name=None)))
    except Exception as exc:  # noqa: BLE001
        return "oracle_error", {"error": str(exc)[:400], "secs": round(time.time() - t0, 1)}
    s_c = canon_rows(scols, srows)
    o_c = canon_rows(ocols, orows)
    secs = round(time.time() - t0, 1)
    if sorted(scols) != sorted(ocols):
        return "schema_mismatch", {
            "spark_cols": sorted(scols), "oracle_cols": sorted(ocols), "secs": secs,
        }
    if s_c != o_c:
        diff = None
        for i, (a, b) in enumerate(zip(s_c, o_c)):
            if a != b:
                diff = {"row": i, "spark": repr(a)[:300], "oracle": repr(b)[:300]}
                break
        return "value_mismatch", {
            "rows": [len(s_c), len(o_c)], "first_diff": diff, "secs": secs,
        }
    return "pass", {"rows": len(s_c), "secs": secs}


def main() -> int:
    args = sys.argv[1:]
    out_path = args[0] if args and args[0].endswith(".json") else "CROSS_SF_r10.json"
    only = set(a for a in args if not a.endswith(".json"))

    spark = get_spark("cross_sf_sweep")
    reg = registry()
    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    t_start = time.time()
    for sf_dir in SF_DIRS:
        sf_label = os.path.basename(sf_dir)
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name, spec in sorted(reg.items()):
            if only and name not in only:
                continue
            if spec.oracle is None:
                results.setdefault(name, {})[sf_label] = {"status": "no_oracle"}
                continue
            status, detail = run_one(spark, con, spec, sf_dir)
            results.setdefault(name, {})[sf_label] = {"status": status, **detail}
            if status == "pass":
                n_pass += 1
                print(f"PASS {sf_label} {name}: {detail['rows']} rows [{detail['secs']}s]",
                      flush=True)
            else:
                n_fail += 1
                print(f"FAIL {sf_label} {name}: {status} {detail}", flush=True)
        con.close()

    artifact = {
        "tool": "cross_sf_sweep",
        "sf_dirs": SF_DIRS,
        "pass": n_pass,
        "fail": n_fail,
        "wall_s": round(time.time() - t_start, 1),
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail across {len(SF_DIRS)} SFs -> {out_path}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
