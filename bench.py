"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (count() would let
Catalyst prune the projections being measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_lealone_spark.session import build_spark, default_parallelism
from etl_lealone_spark.workloads import all_workloads

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the shapes that
# dominate at scale (scan+agg, join, window, dedup, ANN, text).
HEADLINE = [
    "agg_groupby_having",      # W3: scan + multi-agg groupBy
    "filter_predicates",       # W2: scan + predicate
    "join_inner_agg",          # W4: 5-way join
    "join_left_outer",         # outer join + agg
    "orderby_limit_offset",    # W5: top-k
    "window_topk_per_group",   # window functions
    "setop_union",             # set ops
    "merge_upsert",            # MERGE upsert kernel
    "update_projection",       # UPDATE kernel
    "dedup_exact",             # content-hash dedup
    "dedup_minhash_pairs",     # MinHash LSH near-dup
    "ann_bruteforce_topk",     # exact ANN baseline
    "ann_lsh_topk",            # LSH ANN
    "text_quality_score",      # quality signals
    "text_token_count",        # tokenization
    "events_sessionize",       # sessionization window
]


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_spark(
        app_name="etl_lealone_spark_bench",
        cores=default_parallelism(),
    )
    wl = all_workloads()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        w = wl[name]
        t0 = time.time()
        w.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
