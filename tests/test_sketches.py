"""Sketch operators: estimate accuracy + scale plan pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lealone_spark.operators.sketches import (
    hash_sample,
    kmv_estimate,
    kmv_hashes,
)
from etl_lealone_spark.plans import count_exchanges, explain_str, has_take_ordered


def test_kmv_exact_when_sketch_not_full(spark, tables):
    """Fewer distinct values than k → the sketch degrades to an exact
    distinct count."""
    ev = tables["events"]
    row = kmv_estimate(ev, F.col("user_id"), 4096).collect()[0]
    exact = ev.select("user_id").distinct().count()
    assert row.n_sketch == exact
    assert row.est_distinct == float(exact)


def test_kmv_estimate_within_bound(spark, tables):
    """Full sketch: KMV standard error is ~1/sqrt(k-1); assert a lax
    4-sigma band so the test is deterministic-data-tight, not flaky."""
    ev = tables["events"]
    k = 256
    exact = ev.select("event_id").distinct().count()
    assert exact > k, "fixture must exercise the estimation path"
    row = kmv_estimate(ev, F.col("event_id"), k).collect()[0]
    rel = abs(row.est_distinct - exact) / exact
    assert rel < 4.0 / (k - 1) ** 0.5, (row.est_distinct, exact, rel)


def test_kmv_sketch_merge_is_union(spark, tables):
    """Sketch mergeability: KMV(A ∪ B) == bottom-k of KMV(A) ∪ KMV(B) —
    the property that lets 1000 executors sketch independently."""
    ev = tables["events"]
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    k = 64
    merged = (
        kmv_hashes(a, F.col("event_id"), k)
        .unionAll(kmv_hashes(b, F.col("event_id"), k))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    direct = kmv_hashes(ev, F.col("event_id"), k)
    assert [r.hv for r in merged.collect()] == [r.hv for r in direct.collect()]


def test_kmv_topk_is_take_ordered(spark, tables):
    """The bottom-k must compile to TakeOrderedAndProject (k-item heap
    per partition), never a global sort of all distinct hashes."""
    df = kmv_hashes(tables["events"], F.col("event_id"), 256)
    assert has_take_ordered(df)


def test_hash_sample_map_only(spark, tables):
    """The deterministic sample is a filter — zero exchanges."""
    li = tables["lineitem"]
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    df = hash_sample(li, key, 16)
    assert count_exchanges(df) == 0


def test_hash_sample_deterministic_and_sized(spark, tables):
    li = tables["lineitem"]
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    n1 = hash_sample(li, key, 16).count()
    n2 = hash_sample(li.repartition(13), key, 16).count()
    assert n1 == n2, "sample must not depend on partitioning"
    total = li.count()
    assert 0.5 * total / 16 < n1 < 2.0 * total / 16


def test_native_hll_within_tolerance(spark, tables):
    """Spark's HLL++ stays available for pure-Spark pipelines; pin its
    error band vs exact (rsd default 5% → lax 15% assert)."""
    ev = tables["events"]
    exact = ev.select("event_id").distinct().count()
    approx = ev.agg(F.approx_count_distinct("event_id").alias("a")).collect()[0].a
    assert abs(approx - exact) / exact < 0.15


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------
def test_heavy_hitters_guarantee(spark):
    """Every item above the n/(k+1) threshold must be reported, and every
    reported weight is a lower bound within n/(k+1) of the true count."""
    from collections import Counter

    from etl_lealone_spark.operators.sketches import heavy_hitters

    # zipf-ish stream: item i appears ~1000/i times
    items = []
    for i in range(1, 40):
        items += [f"it{i}"] * (1000 // i)
    true = Counter(items)
    n, k = len(items), 8
    d = spark.createDataFrame([(x,) for x in items], "v string").repartition(6)

    got = dict(heavy_hitters(d, "v", k=k))
    thresh = n / (k + 1)
    for item, cnt in true.items():
        if cnt > thresh:
            assert item in got, (item, cnt, thresh)
    for item, w in got.items():
        assert w <= true[item]                 # lower bound
        assert true[item] - w <= thresh + 1    # within the error bound
    assert len(got) <= k


def test_heavy_hitters_single_dominant(spark):
    from etl_lealone_spark.operators.sketches import heavy_hitters

    rows = [("hot",)] * 900 + [(f"cold{i}",) for i in range(100)]
    d = spark.createDataFrame(rows, "v string").repartition(5)
    got = dict(heavy_hitters(d, "v", k=4))
    assert "hot" in got and got["hot"] >= 900 - 1000 / 5


def test_merge_mg_combines_summaries_with_bound():
    """Merging per-stream Misra-Gries summaries keeps the combined
    guarantee: weights add, the (k+1)-th largest is subtracted, and no
    item's merged weight exceeds its true combined count."""
    from etl_lealone_spark.operators.sketches import merge_mg

    s1 = {"a": 10, "b": 4, "c": 1}
    s2 = {"a": 7, "d": 6, "e": 2}
    merged = merge_mg([s1, s2], k=3)
    assert len(merged) <= 3
    assert merged["a"] == 17 - sorted(
        {"a": 17, "b": 4, "c": 1, "d": 6, "e": 2}.values(), reverse=True
    )[3]
    assert all(w > 0 for w in merged.values())
    # merging with an empty summary is identity-after-cut
    assert merge_mg([s1, {}], k=3) == merge_mg([s1], k=3)


def test_cms_overestimates_and_merges(spark):
    """Count-Min invariants: est(v) >= true(v) for every v (one-sided
    error by construction), exact for collision-free terms at small
    cardinality, and the counter table is cell-wise additive — the
    sketch of a union equals the cell-wise sum of the parts' sketches."""
    from pyspark.sql import functions as F

    from etl_lealone_spark.operators.sketches import (
        cms_counters,
        cms_point_estimate,
    )

    rows = [(f"t{i % 37}",) for i in range(1000)] + [("rare",)] * 3
    d = spark.createDataFrame(rows, "v string").repartition(7)
    counters = cms_counters(d, F.col("v"), depth=3, width=64)
    truth = d.groupBy(F.col("v").alias("term")).agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    est = cms_point_estimate(counters, truth, "term", depth=3, width=64)
    got = {r["term"]: (r["true_n"], r["cms_est"]) for r in est.collect()}
    assert len(got) == 38
    assert all(e >= t for t, e in got.values())
    assert got["rare"][1] >= 3
    # mergeability: sketch(A union B) == cellwise_sum(sketch(A), sketch(B))
    a, b = d.randomSplit([0.5, 0.5], seed=7)
    merged = (
        cms_counters(a, F.col("v"), depth=3, width=64)
        .unionAll(cms_counters(b, F.col("v"), depth=3, width=64))
        .groupBy("lane", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_counters(a.unionAll(b), F.col("v"), depth=3, width=64)
    diff = (
        merged.join(whole, ["lane", "bucket"], "full")
        .filter(
            F.coalesce(merged["cnt"], F.lit(0))
            != F.coalesce(whole["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_cms_probe_rejects_reserved_columns(spark):
    """A terms frame already carrying lane/bucket/cnt would silently
    join on the wrong columns — rejected typed instead (r6 advice)."""
    import pytest
    from pyspark.sql import functions as F

    from etl_lealone_spark.operators.sketches import (
        cms_counters,
        cms_point_estimate,
    )

    d = spark.createDataFrame([("x",), ("y",)], "v string")
    counters = cms_counters(d, F.col("v"), depth=3, width=64)
    bad = spark.createDataFrame([("x", 0)], "term string, lane int")
    with pytest.raises(ValueError, match="lane"):
        cms_point_estimate(counters, bad, "term", depth=3, width=64)
    bad2 = spark.createDataFrame([("x", 1)], "term string, CNT int")
    with pytest.raises(ValueError, match="cnt"):
        cms_point_estimate(counters, bad2, "term", depth=3, width=64)
