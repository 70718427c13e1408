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
