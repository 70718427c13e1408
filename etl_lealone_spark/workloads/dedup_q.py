"""Deduplication workloads over the documents table (BASELINE.json
extension surface). EVERY stage is oracle-checked, including the
MinHash-LSH and SimHash pipelines end-to-end: the hash family
(operators/xhash.py — md5-based 60-bit base hash + Mersenne-prime lane
mixing) was chosen so DuckDB can recompute signatures, bands, candidate
sets, and verified pairs bit-for-bit. The oracle SQL below is generated
from the same mixing constants the Spark expression tree uses."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    SIMHASH_BITS,
    exact_dedup,
    minhash_dedup_keep_ids,
    minhash_lsh_pairs,
    ngram_jaccard_pairs_blocked,
    simhash_pairs,
)
from ..operators.xhash import P61, hconsts, md5_hash60_sql, mix60_sql
from ..tables import load_tables
from . import workload


# ---------------------------------------------------------------------------
# generated oracle SQL for the MinHash-LSH pipeline (16 lanes / 8 bands —
# the same constants dedup.minhash_signatures uses)
# ---------------------------------------------------------------------------
_SHINGLES_SQL = """
      (SELECT CASE WHEN len(ws) < 3 THEN [txt]
              ELSE list_distinct([ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                                  for i in range(len(ws) - 2)]) END
       FROM (SELECT trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS txt,
                    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws)
      )"""


def _minhash_banded_cte_sql(num_hashes: int = 16, bands: int = 8) -> str:
    """The shared CTE prefix (sh_tbl, hs_tbl, sig, banded) re-deriving
    dedup.minhash_band_keys' (id, band, band_hash) table in DuckDB —
    generated from the same xhash mixing constants the Spark expression
    tree uses, so both the pair oracle and the band-skew oracle see
    bit-identical bucket keys."""
    rows_per_band = num_hashes // bands
    lanes = ",\n        ".join(
        f"list_min(list_transform(hs, h -> {mix60_sql('h', *hconsts('mh-lane', i))}))"
        f" AS mh{i}"
        for i in range(num_hashes)
    )
    band_selects = []
    for b in range(bands):
        terms = " + ".join(
            mix60_sql(f"mh{b * rows_per_band + r}", *hconsts("band-mix", b * rows_per_band + r))
            for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT id, {b} AS band, ({terms}) % {P61} AS band_hash FROM sig"
        )
    banded = "\n      UNION ALL\n      ".join(band_selects)
    return f"""sh_tbl AS (
      SELECT doc_id AS id, {_SHINGLES_SQL} AS sh
      FROM documents
    ),
    hs_tbl AS (
      SELECT id, sh, list_transform(sh, s -> {md5_hash60_sql('s')}) AS hs
      FROM sh_tbl
    ),
    sig AS (
      SELECT id,
        {lanes}
      FROM hs_tbl
    ),
    banded AS (
      {banded}
    )"""


def _minhash_pairs_sql(num_hashes: int = 16, bands: int = 8, threshold: float = 0.7) -> str:
    return f"""
    WITH {_minhash_banded_cte_sql(num_hashes, bands)},
    cand AS (
      SELECT DISTINCT l.id AS id_a, r.id AS id_b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.band_hash = r.band_hash AND l.id < r.id
    ),
    verified AS (
      SELECT id_a, id_b,
             cast(len(list_intersect(a.sh, b.sh)) as double)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
      FROM cand
      JOIN sh_tbl a ON cand.id_a = a.id
      JOIN sh_tbl b ON cand.id_b = b.id
    )
    SELECT id_a, id_b, round(j, 6) AS jaccard
    FROM verified WHERE j >= {threshold}"""


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    nblocks = max_hamming + 1
    width = SIMHASH_BITS // nblocks
    mask = (1 << width) - 1
    votes = ",\n        ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    fp_terms = " | ".join(
        f"(CASE WHEN v{i} > 0 THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(SIMHASH_BITS)
    )
    block_selects = "\n      UNION ALL\n      ".join(
        f"SELECT id, fp, {b} AS block, (fp >> {b * width}) & {mask} AS block_val FROM fp_tbl"
        for b in range(nblocks)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
      FROM documents
    ),
    th AS (SELECT id, {md5_hash60_sql('tok')} AS h FROM toks),
    votes AS (
      SELECT id,
        {votes}
      FROM th GROUP BY id
    ),
    fp_tbl AS (SELECT id, {fp_terms} AS fp FROM votes),
    blocked AS (
      {block_selects}
    )
    SELECT DISTINCT l.id AS id_a, r.id AS id_b,
           cast(bit_count(xor(l.fp, r.fp)) AS INT) AS hamming
    FROM blocked l JOIN blocked r
      ON l.block = r.block AND l.block_val = r.block_val AND l.id < r.id
    WHERE bit_count(xor(l.fp, r.fp)) <= {max_hamming}"""


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
    _minhash_pairs_sql(),
    doc="MinHash(16)+LSH(8 bands) near-dup pairs verified at Jaccard>=0.7. "
    "Oracle-checked END-TO-END: signatures, bands, candidate set, and "
    "verified pairs are all recomputed by DuckDB from the same "
    "cross-engine hash family (operators/xhash.py).",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return minhash_lsh_pairs(d, threshold=0.7).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


@workload(
    "minhash_band_skew",
    f"""
    WITH {_minhash_banded_cte_sql()},
    buckets AS (
      SELECT band, band_hash, count(*) AS bucket_size
      FROM banded GROUP BY band, band_hash
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(bucket_size) AS BIGINT) AS n_docs,
           CAST(max(bucket_size) AS BIGINT) AS max_bucket,
           CAST(sum(CASE WHEN bucket_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_collision_buckets,
           CAST(sum(bucket_size * (bucket_size - 1) // 2) AS BIGINT)
             AS candidate_pairs
    FROM buckets GROUP BY band
    """,
    doc="Per-band LSH bucket-skew pre-flight: bucket count, max bucket "
    "size, and the EXACT candidate-pair mass sum(C(size,2)) the pair "
    "join would perform — the O(n) diagnostic a 100 TB dedup runs "
    "before committing to the within-bucket self-join (a single hot "
    "bucket of b docs is a b*(b-1)/2-comparison straggler task). "
    "Oracle recomputes bucket keys bit-for-bit via the shared banded "
    "CTE (same xhash constants as the Spark expression tree).",
)
def minhash_band_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_band_stats

    d = load_tables(spark, sf_dir)["documents"]
    return minhash_band_stats(d)


@workload(
    "dedup_minhash_survivors",
    f"""
    WITH pairs AS ({_minhash_pairs_sql()})
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM pairs)
    """,
    doc="Docs surviving MinHash near-dedup (drop near-dup of smaller id); "
    "oracle = anti-join against the full DuckDB-recomputed pair set.",
)
def dedup_minhash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return minhash_dedup_keep_ids(d, threshold=0.7).select("doc_id")


@workload(
    "dedup_simhash_pairs",
    _simhash_pairs_sql(),
    doc="SimHash(60-bit) near-dup pairs (hamming<=3) via pigeonhole block "
    "join; fingerprints, blocks, and pairs recomputed by the DuckDB oracle.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return simhash_pairs(d, max_hamming=3)


# per-doc word-3-gram shingle sets within (lang, n_chars/100) blocks —
# ONE constant shared by the jaccard AND containment oracles (and,
# through _JACCARD_PAIRS_SQL, the dedup_clusters oracles), so a shingle
# spec change cannot be edited into one and not another
_NGRAM_BASE_CTE = """base AS (
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
    )"""

# shared by ngram_jaccard_blocked and the dedup_clusters oracle
_JACCARD_PAIRS_SQL = f"""
    WITH {_NGRAM_BASE_CTE}
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
    "ngram_containment_blocked",
    f"""
    WITH {_NGRAM_BASE_CTE}
    SELECT l.id AS id_a, r.id AS id_b,
           round(cast(len(list_intersect(l.sh, r.sh)) as double)
                 / least(len(l.sh), len(r.sh)), 6) AS containment
    FROM base l JOIN base r ON l.blk = r.blk AND l.id < r.id
    WHERE cast(len(list_intersect(l.sh, r.sh)) as double)
          / least(len(l.sh), len(r.sh)) >= 0.6
    """,
    doc="Asymmetric word-3-gram containment |A∩B|/min(|A|,|B|) within "
    "blocks — the subset-duplicate detector Jaccard misses (short doc "
    "embedded in a long one: union large, containment ≈ 1; Broder's "
    "containment measure). Same blocking + shingle-hash kernel as the "
    "Jaccard pass; shares the oracle's base CTE with it.",
)
def ngram_containment_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_containment_pairs_blocked

    d = load_tables(spark, sf_dir)["documents"]
    return ngram_containment_pairs_blocked(d, threshold=0.6)


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


@workload(
    "dedup_clusters_lp",
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
    doc="dedup_clusters twin that FORCES the distributed "
    "label-propagation + pointer-jumping branch "
    "(small_graph_threshold=0) — the code path that runs at 100 TB "
    "pair graphs — against the same transitive-closure oracle "
    "(r4 verdict: the at-scale branch had zero driver coverage).",
)
def dedup_clusters_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    d = load_tables(spark, sf_dir)["documents"]
    pairs = ngram_jaccard_pairs_blocked(d, threshold=0.5)
    # threshold=0 makes the small-graph gate (n_pairs <= 0//2)
    # unsatisfiable for any non-empty pair set, so label propagation
    # provably executes (its labels are test-pinned identical to the
    # union-find path in tests/test_dedup.py + test_properties.py).
    return connected_components(pairs, small_graph_threshold=0)


@workload(
    "dedup_canonical",
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
    ),
    clusters AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
    member AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars
      FROM clusters c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id, keep_id, n_members FROM (
      SELECT cluster_id, doc_id AS keep_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY cluster_id) AS n_members
      FROM member
    ) t WHERE rn = 1
    """,
    doc="Canonical-document selection per near-dup cluster: keep the "
    "longest member (ties to lower id) — the keep-best step real dedup "
    "pipelines run after clustering, instead of min-id.",
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import canonical_per_cluster, connected_components

    d = load_tables(spark, sf_dir)["documents"]
    pairs = ngram_jaccard_pairs_blocked(d, threshold=0.5)
    clusters = connected_components(pairs)
    return canonical_per_cluster(clusters, d)


# ---------------------------------------------------------------------------
# Blocked edit-distance similarity join (extension): the string-metric
# sibling of ngram_jaccard_blocked — candidate pairs from an equi-join
# on a cheap blocking key, the expensive metric only on candidates.
# ---------------------------------------------------------------------------
@workload(
    "fuzzy_name_pairs",
    """
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM n a JOIN n b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
    doc="Blocked Levenshtein similarity join: block on the head noun "
    "(equi-join key), edit distance only within blocks — at 100 TB "
    "the O(len^2) metric runs on block-bounded candidates, never "
    "all pairs.",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    names = p.select("p_name").distinct()
    blocked = names.withColumn(
        "block", F.element_at(F.split(F.col("p_name"), " "), 2)
    )
    a = blocked.select(F.col("p_name").alias("name_a"), F.col("block"))
    b = blocked.select(F.col("p_name").alias("name_b"), F.col("block").alias("block_b"))
    return (
        a.join(
            b,
            (F.col("block") == F.col("block_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


@workload(
    "source_overlap_matrix",
    f"""
    WITH {_minhash_banded_cte_sql()},
    cand AS (
      SELECT DISTINCT l.id AS id_a, r.id AS id_b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.band_hash = r.band_hash AND l.id < r.id
    ),
    src AS (SELECT doc_id AS id, source AS src FROM documents)
    SELECT least(sa.src, sb.src) AS source_a,
           greatest(sa.src, sb.src) AS source_b,
           CAST(count(*) AS BIGINT) AS n_candidate_pairs
    FROM cand
    JOIN src sa ON cand.id_a = sa.id
    JOIN src sb ON cand.id_b = sb.id
    GROUP BY 1, 2
    """,
    doc="Cross-source near-dup contamination matrix: distinct LSH-bucket "
    "collision pairs per unordered source pair — the pre-mixing check "
    "that two 'independent' sources are not feeding the mix the same "
    "text (off-diagonal mass = double-counted weight). Shares the "
    "banded CTE with the pair and skew oracles; output is a fixed "
    "|sources|x|sources| matrix at any corpus scale.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_source_overlap

    d = load_tables(spark, sf_dir)["documents"]
    return minhash_source_overlap(d)
