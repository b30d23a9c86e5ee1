"""Measure the inverted-index family on ZIPFIAN text (round-12).

Every worst scale line in the repo (raw n-gram containment, n-gram
Jaccard, fuzzy title join, sparse cosine) is dominated by the driver
corpus's 40-word vocabulary: every shingle/prefix-gram is common, so
posting lists grow linearly with the corpus — the documented
adversarial regime.  The docstrings claim "on Zipfian text the prefix
df collapses and the join is output-sized"; until round 12 that claim
rested on analysis alone.  This probe manufactures the measurement:

- ``sf0.1-zipf``: the sf0.1 corpus with documents.text regenerated
  from a 30k-word Zipf(1.05) vocabulary (make_scale_data text_mode
  ``zipf``; every 50th doc a ~90%-overlap edit so near-dup joins keep
  real positives);
- ``sf1-zipf``: ten FK-consistent replicas of the same (50k docs).

For each query: 1 warm + N timed reps on both corpora (noop sink),
reporting walls, the sf1/sf0.1 ratio, and output rows.  Writes one
JSON object suitable for merging into SCALE_r{N}.json as the
``zipf`` section.

Usage: python tools/zipf_scale_probe.py [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronicle_sniffer_spark.plans import registry
from chronicle_sniffer_spark.session import get_spark
from tools.make_scale_data import make_scale_data

QUERIES = (
    "l2_ngram_containment",
    "l2_ngram_df_cap_audit",
    "l2_ngram_jaccard",
    "l2_fuzzy_title_join",
    "l3_sparse_cosine_topk",
)
TIMED_REPS = 3


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipf_probe.json"
    only = sys.argv[2:] or list(QUERIES)
    small = make_scale_data(
        "/tmp/css_scale/sf0.1_zipf", "/root/testdata/sf0.1", 1, "zipf"
    )
    big = make_scale_data(
        "/tmp/css_scale/sf1_zipf", "/root/testdata/sf0.1", 10, "zipf"
    )
    spark = get_spark("zipf-scale-probe")
    reg = registry()
    out: dict[str, dict] = {}
    for name in only:
        fn = reg[name].spark_fn
        row: dict = {}
        for label, sf_dir in (("sf0.1_zipf", small), ("sf1_zipf", big)):
            walls = []
            rows = None
            for rep in range(TIMED_REPS + 1):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                if rep == 0:
                    rows = df.count()  # warm rep doubles as row count
                else:
                    walls.append(wall)
            row[label] = {
                "wall_s": round(statistics.median(walls), 3),
                "rows": rows,
            }
        row["ratio_10x_data"] = round(
            row["sf1_zipf"]["wall_s"] / max(row["sf0.1_zipf"]["wall_s"], 1e-9), 2
        )
        out[name] = row
        print(name, json.dumps(row))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
