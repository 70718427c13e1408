"""Deduplication workloads over the documents table (BASELINE.json
extension surface). Exact/normalized dedup are oracle-checked; the
LSH-based near-dup operators are rows-only checks (their hash family —
xxhash64 — has no DuckDB twin) but their Jaccard VERIFIER is oracle-checked
via ngram_jaccard_blocked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup,
    minhash_dedup_keep_ids,
    minhash_lsh_pairs,
    ngram_jaccard_pairs_blocked,
    simhash_pairs,
)
from ..tables import load_tables
from . import workload


@workload(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
           count(*) AS n_dupes
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: one shuffle on a 16-byte digest, keep min doc_id.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return exact_dedup(d).select("content_hash", "keep_id", "n_dupes")


@workload(
    "dedup_exact_normalized",
    """
    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS content_hash,
           min(doc_id) AS keep_id, count(*) AS n_dupes
    FROM documents
    GROUP BY 1
    """,
    doc="Normalized exact dedup (lowercase, collapse non-alphanumerics).",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return exact_dedup(d, normalize=True).select("content_hash", "keep_id", "n_dupes")


@workload(
    "dedup_minhash_pairs",
    None,  # xxhash64 hash family not reproducible in DuckDB → rows-only
    doc="MinHash(16)+LSH(8 bands) near-dup pairs verified at Jaccard>=0.7.",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return minhash_lsh_pairs(d, threshold=0.7).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


@workload(
    "dedup_minhash_survivors",
    None,
    doc="Docs surviving MinHash near-dedup (drop near-dup of smaller id).",
)
def dedup_minhash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return minhash_dedup_keep_ids(d, threshold=0.7).select("doc_id")


@workload(
    "dedup_simhash_pairs",
    None,
    doc="SimHash64 near-dup pairs (hamming<=3) via pigeonhole block join.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return simhash_pairs(d, max_hamming=3)


# shared by ngram_jaccard_blocked and the dedup_clusters oracle
_JACCARD_PAIRS_SQL = """
    WITH base AS (
      SELECT doc_id AS id,
             struct_pack(lang := lang,
                         sz := cast(floor(n_chars / 100) as int)) AS blk,
             (SELECT CASE WHEN len(ws) < 3 THEN [txt]
                     ELSE list_distinct([ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                                         for i in range(len(ws) - 2)]) END
              FROM (SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS txt,
                           string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws)
             ) AS sh
      FROM documents
    )
    SELECT l.id AS id_a, r.id AS id_b,
           round(cast(len(list_intersect(l.sh, r.sh)) as double)
                 / (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))), 6)
             AS jaccard
    FROM base l JOIN base r ON l.blk = r.blk AND l.id < r.id
    WHERE cast(len(list_intersect(l.sh, r.sh)) as double)
          / (len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh))) >= 0.5
"""


@workload(
    "ngram_jaccard_blocked",
    _JACCARD_PAIRS_SQL,
    doc="Exact word-3-gram Jaccard within (lang, n_chars/100) blocks — "
    "the verification kernel of fuzzy dedup, oracle-checked exactly.",
)
def ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return ngram_jaccard_pairs_blocked(d, threshold=0.5)


@workload(
    "dedup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b AS a, id_a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(n, m) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
    )
    SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
    """,
    doc="Near-dup pairs → duplicate clusters via connected components "
    "(min-label propagation; oracle = transitive closure recursive CTE).",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    d = load_tables(spark, sf_dir)["documents"]
    pairs = ngram_jaccard_pairs_blocked(d, threshold=0.5)
    return connected_components(pairs)
