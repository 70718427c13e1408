"""Fleet-wide plan lint: every registered workload's physical plan is
checked for the scale anti-patterns that would only surface as a cluster
bill at 100 TB:

- ``CartesianProduct`` — an O(n*m) join stage,
- ``BroadcastNestedLoopJoin`` — a per-row scan of a broadcast side
  (degenerate non-equi join),
- a window function over ``SinglePartition`` — the whole dataset
  serialized through one task (global ungrouped aggregates legitimately
  end in a 1-row SinglePartition exchange; the lint only flags plans
  where a Window node sits above one).

Workloads on the allowlist are individually justified where they are
listed. Run:

    python scripts/plan_lint.py [name_filter ...]

Exit code 1 if any non-allowlisted workload trips a rule.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from etl_lealone_spark.plans import explain_str  # noqa: E402
from etl_lealone_spark.plans.lint import lint_forced_broadcasts, lint_plan  # noqa: E402
from etl_lealone_spark.session import build_spark, quiet_bounded_window_warnings  # noqa: E402
from etl_lealone_spark.workloads import all_workloads  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# name -> justification (kept next to the exemption so the lint stays honest)
ALLOW: dict[str, str] = {
    "join_cross": "the workload IS a bounded cross join (5-row dims, "
    "LIMITed output) — reference parity for CROSS JOIN",
    "values_table": "literal VALUES relation — no scan on either side",
    "quantified_all_any": "op ALL(subquery) compares against a 1-row "
    "aggregated subquery — Spark plans the scalar compare as a 1-row "
    "BroadcastNestedLoopJoin, which is a constant-size broadcast",
    "scalar_subquery": "1-row scalar subquery joined to the outer query "
    "— constant-size broadcast by construction",
    "join_theta_bands": "non-equi (theta) join against a constant 5-row "
    "bands relation; the broadcast nested-loop over a literal dim IS the "
    "right plan — the fact side streams once, reference parity for theta "
    "joins",
    "cosine_float_topk": "brute-force ANN deliberately broadcasts the "
    "bounded query-vector set and scores map-only; the nested loop is "
    "|corpus| x |queries| with a constant query count",
    "hybrid_rrf_topk": "dense arm broadcasts ONE query vector (1-row "
    "relation by construction) next to the 1-row BM25 corpus stats — "
    "both nested-loop sides are constant-size",
}


# forced-broadcast rule exemptions: broadcasts of fact-table-derived sets
# that are bounded by construction but not visibly bounded in plan text
BCAST_ALLOW: dict[str, str] = {
    "cosine_float_topk": "broadcasts the query-vector set — bounded by "
    "an equality/range filter on vec_id (constant query count), scored "
    "map-only against the corpus",
    "hybrid_rrf_topk": "broadcasts ONE query vector (vec_id equality "
    "filter) for the dense arm, plus the bounded BM25 term stats",
    "ann_lsh_topk": "broadcasts query probes — |queries| x |probes| "
    "rows, both constants",
    "ann_lsh_topk_mp2": "broadcasts query probes — |queries| x |probes| "
    "rows, both constants (depth-2 probe set: 1 + C(p,1) + C(p,2) masks, "
    "still a constant per query)",
    "ann_lsh_recall": "composes ann_lsh_topk + the integer brute-force "
    "scorer; every broadcast is a query-set/probe-set slice bounded by "
    "the vec_id < N_QUERIES filter (constant query count)",
    # surfaced by the r04 dominance-strict rule (bound must be an
    # ancestor of the fact scan): both broadcasts are keyed aggregates
    # whose key space is hard-capped by construction — invisible in
    # plan text, bounded in math
    "mix_resample": "broadcasts the mixing-weight table — one row per "
    "group (languages), a groupBy(group_col) aggregate of the corpus",
    "text_unigram_logprob": "broadcasts the log-prob table — hashed "
    "modulo `buckets` (4096), so <=4096 rows regardless of corpus size",
    "ccnet_fluency_buckets": "same broadcast as text_unigram_logprob "
    "(it builds on unigram_logprob): the <=4096-row hashed log-prob "
    "table — a keyed aggregate whose key space is the bucket modulus, "
    "bounded in math, invisible in plan text",
}


def lint_one(name: str, plan: str) -> list[str]:
    return lint_plan(plan)


def main() -> None:
    filters = sys.argv[1:]
    spark = build_spark(app_name="plan_lint", cores=8, shuffle_partitions=8)
    quiet_bounded_window_warnings(spark)
    wl = all_workloads()
    bad: list[tuple[str, list[str]]] = []
    n_checked = 0
    for name, w in wl.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            plan = explain_str(w.build(spark, SF_DIR), "extended")
        except Exception as e:  # noqa: BLE001
            bad.append((name, [f"plan-error: {e}"]))
            continue
        n_checked += 1
        # second pass: hint-only plan (auto-broadcast off) — any
        # BroadcastExchange left comes from an explicit F.broadcast();
        # flag ones whose subtree scans a fact table without a bound
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            hint_plan = explain_str(w.build(spark, SF_DIR), "extended")
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        bcast_hits = lint_forced_broadcasts(hint_plan)
        if bcast_hits and name in BCAST_ALLOW:
            print(f"ALLOW {name}: {bcast_hits} — {BCAST_ALLOW[name]}")
            bcast_hits = []
        hits = lint_one(name, plan) + bcast_hits
        if hits and name in ALLOW:
            print(f"ALLOW {name}: {hits} — {ALLOW[name]}")
        elif hits:
            bad.append((name, hits))
            print(f"FAIL  {name}: {hits}")
        else:
            print(f"OK    {name}")
    print(f"\n== {n_checked} checked, {len(bad)} violations")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
