"""Approximate-aggregation workloads: KMV distinct sketches and
hash-threshold sampling (operators/sketches.py).

These are the distributed replacements for the reference's exact
COUNT(DISTINCT) ValueHashMap (Aggregate.java) and SELECTIVITY estimate
— mergeable sketches whose estimates are deterministic functions of the
data, so the DuckDB oracle recomputes the *estimates themselves*, not
just a tolerance band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.sketches import (
    HSPACE,
    hash_sample,
    hash_sample_pred_sql,
    kmv_estimate,
    kmv_estimate_sql,
    stride_quantiles_merged_sql,
    stride_quantiles_sql,
)
from ..operators.xhash import md5_hash60, md5_hash60_sql
from ..tables import load_tables
from . import workload


# ---------------------------------------------------------------------------
# Global KMV sketch: distinct event ids (sketch full → estimation path)
# ---------------------------------------------------------------------------
@workload(
    "kmv_distinct_events",
    kmv_estimate_sql("events", "event_id", 256),
    doc="KMV (bottom-k theta) distinct-count sketch over a high-cardinality "
    "key; k hashes shuffle instead of every distinct value.",
)
def kmv_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return kmv_estimate(ev, F.col("event_id"), 256)


# ---------------------------------------------------------------------------
# Grouped KMV sketch: per-source distinct documents (k per group via a
# bounded window — the grouped twin of the global sketch)
# ---------------------------------------------------------------------------
@workload(
    "kmv_distinct_by_source",
    f"""
    WITH h AS (
      SELECT DISTINCT source,
             {md5_hash60_sql('text')} AS hv
      FROM documents
    ),
    rk AS (
      SELECT source, hv,
             row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
      FROM h
    )
    SELECT source,
           count(*) AS n_sketch,
           max(hv) AS kth_hash,
           CASE WHEN count(*) < 16 THEN cast(count(*) as double)
                ELSE cast(count(*) - 1 as double) / (max(hv) / {HSPACE!r})
           END AS est_distinct
    FROM rk WHERE rn <= 16
    GROUP BY source
    ORDER BY source
    """,
    doc="Per-group KMV sketch (k=16 per source) via a rank-bounded window "
    "— partitioned by the group key, never a single-partition sort.",
)
def kmv_distinct_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    k = 16
    h = docs.select("source", md5_hash60(F.col("text")).alias("hv")).distinct()
    w = Window.partitionBy("source").orderBy("hv")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("kth_hash"))
        .select(
            "source",
            "n_sketch",
            "kth_hash",
            F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
            .otherwise(
                (F.col("n_sketch") - 1).cast("double")
                / (F.col("kth_hash") / F.lit(HSPACE))
            )
            .alias("est_distinct"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Hash-threshold sample + quantiles over the sample
# ---------------------------------------------------------------------------
@workload(
    "quantile_hash_sample",
    f"""
    SELECT count(*) AS n_sample,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.95) AS p95_price
    FROM lineitem
    WHERE {hash_sample_pred_sql(
        "cast(l_orderkey as varchar) || '-' || cast(l_linenumber as varchar)", 16)}
    """,
    doc="Deterministic 1/16 hash-threshold sample (same rows in every "
    "engine/run, unlike Bernoulli TABLESAMPLE) + exact interpolated "
    "quantiles over the sample.",
)
def quantile_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return hash_sample(li, key, 16).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95_price"),
    )


# ---------------------------------------------------------------------------
# Stride-quantile sketch: bounded mergeable quantile summary (the
# KLL-shaped companion to KMV/CMS — operators/sketches.py
# stride_quantile_points / stride_quantiles). percentile_agg is the
# exact-path counterpart; this is what replaces it when the column no
# longer fits a sort: the sketch that leaves the shuffle is
# buckets*k rows at ANY input size.
# ---------------------------------------------------------------------------
_QSK_QS = (0.25, 0.5, 0.9, 0.99)
_QSK_KEY = "cast(l_orderkey as varchar) || '-' || cast(l_linenumber as varchar)"


@workload(
    "quantile_sketch_price",
    stride_quantiles_sql("lineitem", "l_extendedprice", _QSK_KEY, _QSK_QS),
    doc="Bounded mergeable quantile sketch (deterministic KLL-style "
    "stride compaction, buckets=32 x k=64 points): p25/p50/p90/p99 of "
    "l_extendedprice with a per-run rank-error bound column, rebuilt "
    "bit-for-bit by the oracle. One bucket-hash shuffle; the sketch "
    "leaving the stage is <=2048 weighted points regardless of input "
    "size (exact sort/percentile over 100 TB is shuffle-bound; this "
    "is the scale path, quantile_hash_sample the sampling one, "
    "percentile_agg the exact small-data one).",
)
def quantile_sketch_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import stride_quantiles

    li = load_tables(spark, sf_dir)["lineitem"]
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return stride_quantiles(
        li, F.col("l_extendedprice"), key, qs=_QSK_QS
    )


@workload(
    "quantile_sketch_by_flag",
    stride_quantiles_sql(
        "lineitem", "l_extendedprice", _QSK_KEY, _QSK_QS,
        group_cols=["l_returnflag"],
    ),
    doc="Grouped stride-quantile sketch: one independent bounded "
    "summary per l_returnflag group (buckets nest inside the group, "
    "so each group's rank-error bound is governed by its own size) — "
    "the grouped twin of quantile_sketch_price, same convention as "
    "the KMV global/per-source pair. The grouped fold is a keyed "
    "aggregate of <= buckets*k points per group; never a global "
    "window.",
)
def quantile_sketch_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import stride_quantiles

    li = load_tables(spark, sf_dir)["lineitem"]
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return stride_quantiles(
        li, F.col("l_extendedprice"), key, qs=_QSK_QS,
        group_cols=["l_returnflag"],
    )


@workload(
    "quantile_sketch_merged",
    stride_quantiles_merged_sql(
        "lineitem", "l_extendedprice", _QSK_KEY, _QSK_QS, n_chunks=3
    ),
    doc="Sharded/incremental sketch build: three INDEPENDENT per-chunk "
    "stride sketches (chunk = key-hash % 3 — the per-shard or "
    "per-micro-batch path a 100 TB ingest takes) union-merged and read "
    "through the same bounded selection as the single build. Weights "
    "add; the merged rank_err_bound is the SUM of the chunks' bounds "
    "(typically smaller than the single build's, for a 3x-bigger "
    "summary — pytest-pinned). Oracle replays every per-chunk sketch "
    "bit-for-bit (one pts CTE chain per chunk).",
)
def quantile_sketch_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import stride_quantiles_merged

    li = load_tables(spark, sf_dir)["lineitem"]
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return stride_quantiles_merged(
        li, F.col("l_extendedprice"), key, qs=_QSK_QS, n_chunks=3
    )


# ---------------------------------------------------------------------------
# KMV join-key overlap estimate — sketch-based join planning
# ---------------------------------------------------------------------------
@workload(
    "kmv_join_overlap",
    f"""
    WITH ha AS (
      SELECT DISTINCT {md5_hash60_sql("cast(o_custkey as varchar)")} AS hv
      FROM orders ORDER BY hv LIMIT 256
    ),
    hb AS (
      SELECT DISTINCT {md5_hash60_sql("cast(c_custkey as varchar)")} AS hv
      FROM customer WHERE c_acctbal > 0 ORDER BY hv LIMIT 256
    ),
    u AS (
      SELECT hv FROM (SELECT hv FROM ha UNION SELECT hv FROM hb)
      ORDER BY hv LIMIT 256
    ),
    parts AS (
      SELECT (SELECT count(*) FROM u) AS ku,
             (SELECT max(hv) FROM u) AS kth,
             (SELECT count(*) FROM u WHERE hv IN (SELECT hv FROM ha)
                                       AND hv IN (SELECT hv FROM hb)) AS n_both
    )
    SELECT ku, n_both,
           round(cast(n_both as double) / ku, 6) AS jaccard_est,
           round((cast(ku as double) - 1) / (kth / {HSPACE!r})
                 * (cast(n_both as double) / ku), 2) AS overlap_est
    FROM parts
    """,
    doc="Sketch-based join planning: the KMV union of two key sketches "
    "estimates key-set Jaccard and intersection size WITHOUT touching "
    "either table again — k hashes per side decide broadcast/shuffle/"
    "skew strategy for a 100 TB join.",
)
def kmv_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_hashes

    t = load_tables(spark, sf_dir)
    k = 256
    ha = kmv_hashes(t["orders"], F.col("o_custkey"), k)
    hb = kmv_hashes(
        t["customer"].filter(F.col("c_acctbal") > 0), F.col("c_custkey"), k
    )
    u = ha.unionAll(hb).distinct().orderBy("hv").limit(k)
    both = u.join(ha, "hv", "leftsemi").join(hb, "hv", "leftsemi")
    stats = u.agg(
        F.count(F.lit(1)).alias("ku"), F.max("hv").alias("kth")
    ).crossJoin(both.agg(F.count(F.lit(1)).alias("n_both")))
    return stats.select(
        "ku",
        "n_both",
        F.round(F.col("n_both").cast("double") / F.col("ku"), 6).alias(
            "jaccard_est"
        ),
        F.round(
            (F.col("ku").cast("double") - 1)
            / (F.col("kth") / F.lit(HSPACE))
            * (F.col("n_both").cast("double") / F.col("ku")),
            2,
        ).alias("overlap_est"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch point-frequency estimates (Cormode & Muthukrishnan
# 2005; operators/sketches.py cms_counters/cms_point_estimate). The
# sketch is depth x width integer counters fed by the cross-engine md5
# bucket family, so counters AND min-over-lanes estimates are
# deterministic — the oracle rebuilds the identical sketch. Output
# pairs each top term's true count with its CMS estimate (est >= true
# by construction; equality when the term's buckets are collision-free).
# ---------------------------------------------------------------------------
_CMS_DEPTH, _CMS_WIDTH = 4, 512


def _cms_oracle_sql() -> str:
    lanes = ", ".join(str(d) for d in range(_CMS_DEPTH))
    h = md5_hash60_sql(f"('cms' || lane || '|' || w)")
    return f"""
    WITH words AS (
      SELECT unnest(string_split_regex(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
      FROM documents
    ),
    toks AS (SELECT w FROM words WHERE w <> ''),
    counters AS (
      SELECT lane, {h} % {_CMS_WIDTH} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM toks, unnest([{lanes}]) AS t(lane)
      GROUP BY 1, 2
    ),
    top_terms AS (
      SELECT w AS term, CAST(count(*) AS BIGINT) AS true_n,
             row_number() OVER (ORDER BY count(*) DESC, w) AS rnk
      FROM toks GROUP BY w QUALIFY rnk <= 20
    ),
    probes AS (
      SELECT term, true_n, rnk, lane,
             {md5_hash60_sql("('cms' || lane || '|' || term)")} % {_CMS_WIDTH}
               AS bucket
      FROM top_terms, unnest([{lanes}]) AS t(lane)
    )
    SELECT p.term, p.true_n, p.rnk,
           min(coalesce(c.cnt, 0)) AS cms_est
    FROM probes p LEFT JOIN counters c
      ON p.lane = c.lane AND p.bucket = c.bucket
    GROUP BY p.term, p.true_n, p.rnk
    """


@workload(
    "cms_term_frequency",
    _cms_oracle_sql(),
    doc="Count-Min sketch: depth-4 x 512 counter table over corpus "
    "terms (one explode + one agg; the shuffle carries at most "
    "depth*width rows per task at ANY corpus size), then min-over-"
    "lanes point estimates for the top-20 true terms — estimates "
    "rebuilt bit-for-bit by the oracle.",
)
def cms_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_counters, cms_point_estimate

    d = load_tables(spark, sf_dir)["documents"]
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    toks = d.select(F.explode(F.split(norm, " ")).alias("w")).filter(
        F.col("w") != ""
    )
    counters = cms_counters(toks, F.col("w"), _CMS_DEPTH, _CMS_WIDTH)
    rk = Window.orderBy(F.desc("true_n"), "term")
    top = (
        toks.groupBy(F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
        .withColumn("rnk", F.row_number().over(rk))
        .filter(F.col("rnk") <= 20)
    )
    return cms_point_estimate(
        counters, top, "term", _CMS_DEPTH, _CMS_WIDTH
    ).select("term", "true_n", "rnk", "cms_est")
