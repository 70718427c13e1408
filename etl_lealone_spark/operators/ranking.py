"""Corpus ranking / lexical-statistics operators: BM25 relevance scoring
and vocabulary statistics.

The retrieval-ish half of a training-data pipeline: score documents
against query term sets (quality/topical filtering, eval-set mining) and
compute corpus-level term statistics (vocabulary builds, idf tables).
Reference parity: the reference engine has no text-ranking surface (this
is BASELINE.json extension surface, not a port).

Scale shape, both operators:

- Tokenize map-side, explode, then ONE shuffle keyed by the term for the
  frequency aggregates (classic wordcount with map-side partial
  aggregation — Spark's hash-agg partial/final split keeps the exploded
  stream from ever being materialized whole).
- Corpus scalars (doc count, average document length) are 1-row
  aggregates cross-joined back broadcast-style; term document
  frequencies for a bounded query set are broadcast to the probe side.
  Nothing driver-side, no collect.

Cross-engine determinism (DuckDB oracle): per-term contributions are
computed in double (bit-identical given identical inputs in both
engines), then cast to decimal(28,12) before the per-document SUM so the
reduction is exact and associative regardless of partitioning; the
average document length is likewise sum(decimal)/count — not avg(double)
— so no engine sees an order-dependent reduction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import words


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"), words(F.col(text_col)).alias("ws"))


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every matching document for ``query_terms``.

    Returns (doc_id, bm25) for documents containing at least one query
    term. idf is the BM25+ form ln(1 + (N - df + 0.5)/(df + 0.5)) —
    always positive, so scores are monotone in term rarity.

    Plan: token explode → filter to the query set DURING the scan (the
    filter sits under the explode's projection, so non-query terms are
    dropped before the aggregate) → one shuffle for per-(doc, term) tf →
    broadcast joins for the tiny df / corpus-stats sides → map-side score.
    """
    per_doc = _tokens(df, text_col, id_col).select(
        "id", F.size("ws").cast("double").alias("dl"), "ws"
    )
    # corpus scalars: exact decimal sum, then one double division
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    terms = [t.lower() for t in query_terms]
    # carry dl THROUGH the tf aggregate (constant per doc, so max() is
    # exact) instead of re-joining a per-doc length table afterwards —
    # saves a corpus-wide shuffle join on the doc id
    tf = (
        per_doc.select("id", "dl", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.max("dl").alias("dl"),
        )
        # tf feeds two consumers (score path + df aggregate); EAGER
        # checkpoint so the corpus explode-scan runs once, not once per
        # consumer. tf is bounded by |matching docs| x |query terms| —
        # tiny next to the corpus at any scale.
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("id", contrib.cast("decimal(28,12)").alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("score_exact"))
        .select(
            F.col("id").alias(id_col),
            F.round(F.col("score_exact").cast("double"), 6).alias("bm25"),
            F.col("score_exact"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 documents, deterministically ordered (exact-decimal
    score desc, then doc id) → TakeOrderedAndProject, no global sort."""
    scored = bm25_scores(df, query_terms, text_col, id_col)
    return (
        scored.orderBy(F.col("score_exact").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "bm25")
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: (term, tf, df) — collection frequency and
    document frequency per distinct normalized token.

    One explode + one shuffle on the term. ``df`` uses count(distinct id)
    inside the same aggregate — Spark plans the distinct as a two-phase
    partial aggregate (expand + two hash aggregates), still a single
    exchange on the term key.
    """
    ex = (
        _tokens(df, text_col, id_col)
        .select("id", F.explode("ws").alias("term"))
        .filter(F.col("term") != "")
    )
    return ex.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("id").alias("df"),
    )


def vocab_top_terms(
    df: DataFrame,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k vocabulary terms by collection frequency (ties by term)."""
    return (
        vocab_stats(df, text_col, id_col)
        .orderBy(F.col("tf").desc(), F.col("term"))
        .limit(k)
    )


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching via positional postings intersection.

    The inverted-index primitive BM25 cannot express: ``phrase`` matches
    where its terms appear CONSECUTIVELY. Classic positional-postings
    evaluation (Manning et al., IR book §2.4): build (doc, position)
    postings for the phrase's terms only, shift term i's positions back
    by i, and count equi-matches on (doc, start_position).

    Returns (id, n_matches) for documents with >= 1 occurrence.

    Scale shape (r12 form): the postings build is ONE map-side explode
    + a SELECTIVE filter (only the phrase's terms survive), and the
    m-way intersection is a count over (doc, start_pos) groups — a
    token matching term i votes for start position pos - i, and a
    start where all m term slots voted is a phrase hit. One corpus
    scan and one aggregation shuffle replace the previous m filtered
    sub-scans + (m-1)-way self-join (guide §1.2: fewer passes; the
    votes-per-start count is exactly the join's AND because positions
    are unique per doc, so (i, p0) rows are distinct). Posting rows
    for rare terms are tiny; for a phrase of common terms the
    aggregate keys on an 8-byte compound and AQE handles the skew.
    """
    terms = [t.lower() for t in phrase]
    m = len(terms)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "w"),
    ).filter(F.col("w").isin(terms))
    aligned = (
        tok.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.when(
                            F.col("w") == t,
                            F.struct(
                                F.lit(i).alias("i"),
                                (F.col("pos") - i).alias("p0"),
                            ),
                        )
                        for i, t in enumerate(terms)
                    ]
                )
            ).alias("hit"),
        )
        .filter(F.col("hit").isNotNull())
        .select("id", "hit.i", "hit.p0")
    )
    # (id, p0, i) rows are distinct (a doc position is unique), so the
    # plain count equals the distinct-slot count; == m means every term
    # slot of the phrase matched at this start
    starts = (
        aligned.groupBy("id", "p0")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == m)
    )
    return starts.groupBy("id").agg(F.count(F.lit(1)).alias("n_matches"))
