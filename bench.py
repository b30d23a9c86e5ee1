"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect bottleneck) — except tiny aggregates, where
collect() is the realistic consumption path.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chronicle_sniffer_spark.plans import registry
from chronicle_sniffer_spark.session import get_spark

# Headline set: one per bench target in BASELINE.md §2 plus the
# LLM-pipeline ops. (B2=a1, B3=j2, B4=o1/w1, B7=l1/l2.)
HEADLINE = (
    "a1_q1_pricing_summary",
    "j2_q3_shape",
    "o1_sort_limit",
    "w1_topk_per_group",
    "w4_running_total",
    "j8_asof",
    "a8_exp_histogram",
    "l1_exact_dedup",
    "l2_minhash_signatures",
    "l3_cosine_topk",
)

# Results small enough that collect() is the realistic consumption path.
_SMALL = {"a1_q1_pricing_summary", "o1_sort_limit", "l3_cosine_topk", "a8_exp_histogram"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("bench")
    reg = registry()

    # Warm the JVM + parquet footers outside the timed region.
    reg["s1_parquet_count"].spark_fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = reg[name].spark_fn
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name in _SMALL:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
