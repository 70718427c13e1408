"""Ranking / lexical-statistics / packing workloads: BM25 scoring,
vocabulary stats, sequence packing. Extension surface (the reference has
no text-ranking operators); every workload here is oracle-checked.

Float rules (see package docstring): BM25 per-term contributions are
double (bit-identical across engines), summed per-document as
decimal(28,12) so the reduction is exact; avgdl is sum(decimal)/count,
never avg(double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.pipeline import pack_sequence_bins
from ..operators.ranking import bm25_topk, vocab_top_terms
from ..tables import load_tables
from . import workload

_QUERY_TERMS = ("spark", "merge", "window", "hash")
_TERMS_SQL = "('spark', 'merge', 'window', 'hash')"

_NORM_WS = (
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


@workload(
    "bm25_topk",
    f"""
    WITH toks AS (
      SELECT doc_id AS id, {_NORM_WS} AS ws FROM documents
    ),
    dl AS (SELECT id, cast(len(ws) as double) AS dl FROM toks),
    stats AS (
      SELECT cast(count(*) as double) AS n_docs,
             cast(sum(cast(dl as decimal(28,6))) as double)
               / cast(count(*) as double) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT id, term, cast(count(*) as double) AS tf
      FROM toks, unnest(ws) AS u(term)
      WHERE term IN {_TERMS_SQL}
      GROUP BY id, term
    ),
    dfreq AS (SELECT term, cast(count(*) as double) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.id,
             sum(cast(
               ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
             as decimal(28,12))) AS score_exact
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl ON dl.id = tf.id
      CROSS JOIN stats
      GROUP BY tf.id
    )
    SELECT id AS doc_id, round(cast(score_exact as double), 6) AS bm25
    FROM scored
    ORDER BY score_exact DESC, id
    LIMIT 20
    """,
    doc="Okapi BM25 top-20 for a fixed query term set: token explode -> "
    "one tf shuffle -> broadcast df/corpus stats -> exact-decimal sum.",
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return bm25_topk(d, _QUERY_TERMS, k=20)


@workload(
    "vocab_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id AS id, {_NORM_WS} AS ws FROM documents
    ),
    ex AS (
      SELECT id, term FROM toks, unnest(ws) AS u(term) WHERE term <> ''
    )
    SELECT term, count(*) AS tf, count(DISTINCT id) AS df
    FROM ex
    GROUP BY term
    ORDER BY tf DESC, term
    LIMIT 100
    """,
    doc="Corpus vocabulary top-100 by collection frequency with document "
    "frequency — wordcount + distinct in one term-keyed shuffle.",
)
def vocab_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return vocab_top_terms(d, k=100)


@workload(
    "pack_sequence_bins",
    """
    WITH d AS (
      SELECT doc_id, source,
             cast(len(string_split_regex(trim(text), '[ \\t\\n]+')) as bigint)
               AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_off
      FROM d
    )
    SELECT doc_id, source, n_tokens,
           cast(floor(start_off / 2048) as bigint) AS bin_id,
           cast(start_off % 2048 as bigint) AS bin_offset
    FROM c
    """,
    doc="Sequence packing: assign docs to 2048-token training bins per "
    "source stream via one windowed running sum (never SinglePartition).",
)
def pack_sequence_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return pack_sequence_bins(d, budget=2048)


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ∪ dense-cosine candidates fused by RRF
# ---------------------------------------------------------------------------
@workload(
    "hybrid_rrf_topk",
    f"""
    WITH items AS (
      SELECT d.doc_id, d.text,
             list_transform(e.embedding,
               x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS cvec
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    toks AS (SELECT doc_id AS id, {_NORM_WS} AS ws FROM items),
    dl AS (SELECT id, cast(len(ws) as double) AS dl FROM toks),
    stats AS (
      SELECT cast(count(*) as double) AS n_docs,
             cast(sum(cast(dl as decimal(28,6))) as double)
               / cast(count(*) as double) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT id, term, cast(count(*) as double) AS tf
      FROM toks, unnest(ws) AS u(term)
      WHERE term IN {_TERMS_SQL}
      GROUP BY id, term
    ),
    dfreq AS (SELECT term, cast(count(*) as double) AS df FROM tf GROUP BY term),
    bscored AS (
      SELECT tf.id,
             sum(cast(
               ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
             as decimal(28,12))) AS score_exact
      FROM tf JOIN dfreq USING (term) JOIN dl ON dl.id = tf.id
      CROSS JOIN stats GROUP BY tf.id
    ),
    b100 AS (
      SELECT id AS doc_id,
             row_number() OVER (ORDER BY score_exact DESC, id) AS rb
      FROM bscored ORDER BY score_exact DESC, id LIMIT 100
    ),
    q AS (SELECT cvec AS qvec FROM items WHERE doc_id = 7),
    cscored AS (
      SELECT i.doc_id,
             cast(list_sum([i.cvec[k+1] * q.qvec[k+1]
                            for k in range(len(i.cvec))]) as double)
             / (sqrt(cast(list_sum([i.cvec[k+1] * i.cvec[k+1]
                                    for k in range(len(i.cvec))]) as double))
                * sqrt(cast(list_sum([q.qvec[k+1] * q.qvec[k+1]
                                      for k in range(len(q.qvec))]) as double)))
               AS cos
      FROM items i CROSS JOIN q
    ),
    c100 AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rc
      FROM cscored ORDER BY cos DESC, doc_id LIMIT 100
    )
    SELECT doc_id,
           round(coalesce(1.0 / (60 + rb), 0.0)
                 + coalesce(1.0 / (60 + rc), 0.0), 9) AS rrf
    FROM b100 FULL OUTER JOIN c100 USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 20
    """,
    doc="Hybrid retrieval: lexical (BM25) and dense (quantized cosine) "
    "top-100 candidate lists fused by reciprocal-rank fusion "
    "(Cormack et al. 2009, k=60). Each retriever contributes only a "
    "bounded candidate list (TakeOrdered — no global sort), so the "
    "fusion cost is O(k), independent of corpus size.",
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..operators.ranking import bm25_scores

    t = load_tables(spark, sf_dir)
    quant = F.expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0"
        " + 0.5) as bigint))"
    )
    items = (
        t["documents"]
        .join(
            t["embeddings"].select("vec_id", quant.alias("cvec")),
            F.col("doc_id") == F.col("vec_id"),
        )
        .select("doc_id", "text", "cvec")
    )
    b100 = (
        bm25_scores(items, _QUERY_TERMS)
        .orderBy(F.desc("score_exact"), "doc_id")
        .limit(100)
        .withColumn(
            "rb",
            F.row_number().over(Window.orderBy(F.desc("score_exact"), "doc_id")),
        )
        .select("doc_id", "rb")
    )
    qvec = items.filter(F.col("doc_id") == 7).select(F.col("cvec").alias("qvec"))
    dot = F.aggregate(
        F.zip_with("cvec", "qvec", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    cscored = items.crossJoin(F.broadcast(qvec)).select(
        "doc_id",
        (dot.cast("double") / (nrm("cvec") * nrm("qvec"))).alias("cos"),
    )
    c100 = (
        cscored.orderBy(F.desc("cos"), "doc_id")
        .limit(100)
        .withColumn(
            "rc", F.row_number().over(Window.orderBy(F.desc("cos"), "doc_id"))
        )
        .select("doc_id", "rc")
    )
    return (
        b100.join(c100, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("rb")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("rc")), F.lit(0.0)),
                9,
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------
_FILT_WS = (
    "list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),"
    " x -> x <> '')"
)


@workload(
    "phrase_search_postings",
    f"""
    WITH w AS (
      SELECT doc_id, {_FILT_WS} AS ws FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos FROM w
    ),
    t0 AS (SELECT doc_id, pos AS p0 FROM tok WHERE w = 'table'),
    t1 AS (SELECT doc_id, pos - 1 AS p0 FROM tok WHERE w = 'scan')
    SELECT t0.doc_id, count(*) AS n_matches
    FROM t0 JOIN t1 USING (doc_id, p0)
    GROUP BY t0.doc_id
    """,
    doc="Exact phrase search ('table scan') by positional-postings "
    "intersection: selective per-term postings from one explode pass, "
    "one equi-join on (doc, start_pos) — the IR primitive BM25 lacks; "
    "never a window over the full corpus.",
)
def phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.ranking import phrase_search

    d = load_tables(spark, sf_dir)["documents"]
    return phrase_search(d, ["table", "scan"]).select(
        F.col("id").alias("doc_id"), "n_matches"
    )
