"""Product quantization: deterministic training, map-only encoding, ADC
retrieval quality on separable synthetic clusters."""

from __future__ import annotations

import random

from etl_lealone_spark.operators.pq import (
    _sub_slices,
    pq_adc_topk,
    pq_encode,
    pq_train,
)


def _clustered_vectors(n_per=20, dim=16, centers=((5.0,), (-5.0,), (0.5,))):
    """Three well-separated clusters; returns (vec_id, embedding) rows."""
    rnd = random.Random(7)
    rows = []
    vid = 0
    for ci, (base,) in enumerate(centers):
        for _ in range(n_per):
            vec = [base + rnd.uniform(-0.3, 0.3) for _ in range(dim)]
            rows.append((vid, ci, vec))
            vid += 1
    return rows


def test_sub_slices_cover_dim():
    assert _sub_slices(16, 4) == [(0, 4), (4, 4), (8, 4), (12, 4)]
    s = _sub_slices(10, 3)
    assert sum(ln for _, ln in s) == 10 and s[0] == (0, 4)


def test_pq_train_deterministic_across_partitionings(spark):
    rows = [(i, c, v) for i, c, v in _clustered_vectors()]
    d = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    cb1 = pq_train(d.coalesce(1), m=4, k=4, iters=3)
    cb2 = pq_train(d.repartition(5), m=4, k=4, iters=3)
    assert cb1 == cb2


def test_pq_encode_and_adc_recall(spark):
    rows = _clustered_vectors()
    d = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    cb = pq_train(d, m=4, k=4, iters=3)
    codes = pq_encode(d, cb)
    got = {r["id"]: r["codes"] for r in codes.collect()}
    assert len(got) == len(rows)
    assert all(len(c) == 4 and max(c) < 4 for c in got.values())

    # query at a cluster center: every top-5 hit belongs to that cluster
    by_id = {vid: cl for vid, cl, _ in rows}
    top = pq_adc_topk(codes, [5.0] * 16, cb, k=5).collect()
    assert len(top) == 5
    assert all(by_id[r["id"]] == 0 for r in top)
    # and distances are ordered
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)


def test_pq_compression_shape(spark):
    rows = _clustered_vectors(n_per=5)
    d = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    cb = pq_train(d, m=8, k=4, iters=2)
    assert len(cb) == 8                      # m codebooks
    assert all(len(c) == 4 for c in cb)      # k centroids each
    assert sum(len(c[0]) for c in cb) == 16  # subspace dims cover the vector


def test_ivfpq_index_build_probe(spark, tmp_path):
    rows = _clustered_vectors(n_per=30)
    d = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    from etl_lealone_spark.operators.pq import IvfPqIndex

    idx = IvfPqIndex(spark, str(tmp_path / "ivfpq"), m=4, k=4)
    idx.build(d)
    assert idx.exists()
    idx.build(d)  # idempotent no-op

    by_id = {vid: cl for vid, cl, _ in rows}
    top = idx.topk([-5.0] * 16, k=5, n_probe=3).collect()
    assert len(top) == 5
    assert all(by_id[r["vec_id"]] == 1 for r in top)  # all from the -5 cluster


def test_ivfpq_probe_partition_prunes(spark, tmp_path):
    rows = _clustered_vectors(n_per=30)
    d = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    from etl_lealone_spark.operators.pq import IvfPqIndex
    from etl_lealone_spark.plans import explain_str

    idx = IvfPqIndex(spark, str(tmp_path / "ivfpq2"), m=4, k=4)
    idx.build(d)
    plan = explain_str(idx.topk([5.0] * 16, k=3, n_probe=2), "simple")
    # the cid filter must reach the parquet source as a partition filter
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters", 1)[1][:200]


def test_ivfpq_force_rebuild_and_sparse_ids(spark, tmp_path):
    """force=True must actually replace the index, and centroid seeding
    must work for id distributions with no multiples of sqrt(n)."""
    from etl_lealone_spark.operators.pq import IvfPqIndex

    # all-odd ids: an id-modulo centroid rule would select zero rows
    rows = [
        (2 * i + 1, c, v) for i, (_, c, v) in enumerate(_clustered_vectors(n_per=20))
    ]
    d = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    idx = IvfPqIndex(spark, str(tmp_path / "odd"), m=4, k=4)
    idx.build(d)
    top = idx.topk([5.0] * 16, k=3, n_probe=3).collect()
    assert len(top) == 3

    # force rebuild on a different corpus must serve the NEW corpus
    rows2 = [(i + 1000, c, v) for i, (_, c, v) in enumerate(_clustered_vectors(n_per=10))]
    d2 = spark.createDataFrame(
        rows2, "vec_id long, cluster int, embedding array<double>"
    )
    idx.build(d2, force=True)
    top2 = idx.topk([5.0] * 16, k=3, n_probe=3).collect()
    assert all(r["vec_id"] >= 1000 for r in top2)


def test_ivfpq_topk_batch_matches_per_query(spark, tmp_path):
    """topk_batch (executor-side coarse probing + cogrouped ADC
    scoring, no driver query collect) returns, for every query,
    exactly the per-query topk result — including the exact int64 ADC
    distances — and is invariant to Arrow batching."""
    from pyspark.sql import functions as F

    from etl_lealone_spark.operators.pq import IvfPqIndex

    rows = _clustered_vectors(n_per=30)
    d = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    idx = IvfPqIndex(spark, str(tmp_path / "ivfpqb"), m=4, k=4)
    idx.build(d)
    qrows = [(i, v) for i, _, v in rows if i % 11 == 0][:7]
    want = {}
    for qid, vec in qrows:
        want[qid] = [
            (r["vec_id"], r["adc_dist"])
            for r in idx.topk(vec, k=5, n_probe=3).collect()
        ]
    qdf = spark.createDataFrame(
        qrows, "query_id long, qvec array<double>"
    )
    got = idx.topk_batch(qdf, k=5, n_probe=3).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rnk"])):
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["adc_dist"]))
    assert by_q == want
    # different Arrow batching must not change anything
    got2 = idx.topk_batch(qdf.repartition(5), k=5, n_probe=3).collect()
    by_q2 = {}
    for r in sorted(got2, key=lambda r: (r["query_id"], r["rnk"])):
        by_q2.setdefault(r["query_id"], []).append((r["vec_id"], r["adc_dist"]))
    assert by_q2 == want
    # the probe stays partition-pruned at the parquet source
    plan = idx.topk_batch(qdf, k=5, n_probe=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters: [cid" in plan
