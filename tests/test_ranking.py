"""Tests for operators/ranking.py (BM25, vocabulary stats) and
pipeline.pack_sequence_bins, on crafted corpora with hand-checkable
values."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_lealone_spark.operators.pipeline import pack_sequence_bins
from etl_lealone_spark.operators.ranking import (
    bm25_scores,
    bm25_topk,
    vocab_stats,
    vocab_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
def test_bm25_hand_computed(spark):
    # 3 docs, query = {cat}: df(cat)=2, N=3, dl = 2/2/4, avgdl = 8/3
    d = _docs(spark, [(1, "cat dog"), (2, "cat cat cat dog"), (3, "fish dog")])
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(d, ["cat"]).collect()}
    assert set(out) == {1, 2}
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    k1, b, avgdl = 1.2, 0.75, 8 / 3

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[1] - score(1, 2)) < 1e-5
    assert abs(out[2] - score(3, 4)) < 1e-5
    # doc 2 has the higher tf and must rank first
    top = bm25_topk(d, ["cat"], k=1).collect()
    assert [r["doc_id"] for r in top] == [2]


def test_bm25_rare_term_outscores_common(spark):
    # 'rare' appears in 1 of 4 docs, 'common' in all 4 with identical tf/dl;
    # the rare term's doc must outrank any common-only doc
    d = _docs(
        spark,
        [
            (1, "common rare"),
            (2, "common filler"),
            (3, "common filler"),
            (4, "common filler"),
        ],
    )
    ranked = [
        r["doc_id"]
        for r in bm25_topk(d, ["common", "rare"], k=4).collect()
    ]
    assert ranked[0] == 1


def test_bm25_case_normalization(spark):
    d = _docs(spark, [(1, "Spark SPARK spark")])
    out = bm25_scores(d, ["SPARK"]).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1


# ---------------------------------------------------------------------------
# vocabulary stats
# ---------------------------------------------------------------------------
def test_vocab_stats_tf_df(spark):
    d = _docs(spark, [(1, "a b a"), (2, "b c"), (3, "c c c")])
    out = {r["term"]: (r["tf"], r["df"]) for r in vocab_stats(d).collect()}
    assert out == {"a": (2, 1), "b": (2, 2), "c": (4, 2)}


def test_vocab_top_terms_order_and_ties(spark):
    d = _docs(spark, [(1, "a b a"), (2, "b c"), (3, "c c c")])
    top = vocab_top_terms(d, k=2).collect()
    # c has tf=4; a and b tie at tf=2 -> 'a' wins the tie alphabetically
    assert [(r["term"], r["tf"]) for r in top] == [("c", 4), ("a", 2)]


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------
def test_pack_sequence_bins_layout(spark):
    rows = [
        (1, "s1", "w " * 1000),  # 1000 tokens -> bin 0, offset 0
        (2, "s1", "w " * 1500),  # starts at 1000 -> bin 0, offset 1000
        (3, "s1", "w " * 100),   # starts at 2500 -> bin 1, offset 452
        (4, "s2", "w " * 10),    # other stream: bin 0, offset 0
    ]
    d = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequence_bins(d, budget=2048).collect()
    }
    assert out[1] == (1000, 0, 0)
    assert out[2] == (1500, 0, 1000)
    assert out[3] == (100, 1, 2500 - 2048)
    assert out[4] == (10, 0, 0)


def test_pack_sequence_bins_no_single_partition(spark):
    d = spark.createDataFrame(
        [(1, "s1", "a b"), (2, "s2", "c")],
        "doc_id long, source string, text string",
    )
    plan = pack_sequence_bins(d)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------
def test_phrase_search_exact_positions(spark):
    from etl_lealone_spark.operators.ranking import phrase_search

    d = spark.createDataFrame(
        [
            (1, "full table scan is slow"),        # 1 match
            (2, "scan the table scan table scan"),  # 2 matches
            (3, "table part scan"),                 # terms present, not adjacent
            (4, "no relevant words here"),          # no terms
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["n_matches"]
        for r in phrase_search(d, ["table", "scan"]).collect()
    }
    assert out == {1: 1, 2: 2}


def test_phrase_search_three_terms_and_case(spark):
    from etl_lealone_spark.operators.ranking import phrase_search

    d = spark.createDataFrame(
        [(1, "The Quick Brown fox; the quick brown dog"), (2, "quick the brown")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r["n_matches"]
        for r in phrase_search(d, ["the", "quick", "brown"]).collect()
    }
    assert out == {1: 2}  # normalization lowercases; punctuation folded
