"""Similarity operator tests: brute-force correctness, LSH recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lealone_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)


def _queries(tables):
    return tables["embeddings"].filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_bruteforce_self_is_top1(tables):
    out = brute_force_topk(tables["embeddings"], _queries(tables), k=5)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter("rnk = 1").collect()}
    # a vector's nearest neighbour is itself (cosine 1.0)
    assert top1 == {0: 0, 1: 1, 2: 2}
    sims = {r["query_id"]: r["cosine_sim"] for r in out.filter("rnk = 1").collect()}
    assert all(abs(s - 1.0) < 1e-6 for s in sims.values())


def test_bruteforce_k_rows_per_query(tables):
    out = brute_force_topk(tables["embeddings"], _queries(tables), k=7)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 7 for r in counts)


def test_lsh_recall_vs_bruteforce(tables):
    exact = brute_force_topk(tables["embeddings"], _queries(tables), k=10)
    approx = lsh_topk(tables["embeddings"], _queries(tables), k=10, dim=64)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # self-match must always be found (it shares the exact bucket)
    assert all((q, q) in a for q in (0, 1, 2))
    recall = len(e & a) / len(e)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_embedding_near_dup_self_join_shape(tables):
    out = embedding_near_dup_pairs(tables["embeddings"], threshold=0.99, dim=64)
    for r in out.collect():
        assert r["id_a"] < r["id_b"]
        assert r["cosine_sim"] >= 0.99


def test_ivf_self_found_and_recall(tables):
    from etl_lealone_spark.operators.similarity import ivf_topk

    exact = brute_force_topk(tables["embeddings"], _queries(tables), k=10)
    approx = ivf_topk(tables["embeddings"], k=10, n_probe=4, n_queries=3)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # a query's own cluster is always probed first → self-match guaranteed
    assert all((q, q) in a for q in (0, 1, 2))
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # exactly k rows per query, ranks contiguous
    counts = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 10 for r in counts)
