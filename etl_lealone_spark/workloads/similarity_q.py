"""Similarity-search workloads over the embeddings table.

Cross-engine float strategy: integer-quantize each component to
floor(x*1e6+0.5) as bigint BEFORE the dot product — integer arithmetic
is exact and associative, so Spark and DuckDB produce bit-identical
cosine doubles (one final IEEE division of equal integers). LSH buckets
use Rademacher ±1 sign projections over the same quantized vectors
(operators/xhash.py), so bucketing is engine-reproducible too. Even the
float PATH is oracle-checked: both engines fold array doubles strictly
left-to-right, so an identical IEEE op sequence yields identical
doubles (cosine_float_topk pins this). EVERY workload in this module
carries a full DuckDB oracle — none are rows-only."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import brute_force_topk, embedding_near_dup_pairs, lsh_topk
from ..tables import load_tables
from . import workload

N_QUERIES = 5
TOP_K = 10


def _quantized(col: Column) -> Column:
    # floor(x*1e6 + 0.5), not round(): engines disagree on round() ties
    # (half-up vs half-away) for negative values; floor is floor everywhere.
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.floor(x * 1000000.0 + 0.5).cast("bigint"),
    )


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


@workload(
    "ann_bruteforce_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS qvec
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS cvec
      FROM embeddings
    ),
    scored AS (
      SELECT q.query_id, c.vec_id,
             cast(list_sum([c.cvec[i+1] * q.qvec[i+1] for i in range(len(c.cvec))]) as double)
             / (sqrt(cast(list_sum([c.cvec[i+1] * c.cvec[i+1] for i in range(len(c.cvec))]) as double))
                * sqrt(cast(list_sum([q.qvec[i+1] * q.qvec[i+1] for i in range(len(q.qvec))]) as double)))
               AS cosine_sim
      FROM c CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine_sim, rnk FROM (
      SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {TOP_K}
    """,
    doc="Exact cosine top-10 for 5 query vectors, integer-quantized for "
    "cross-engine determinism. Corpus is never shuffled; queries broadcast.",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk_int

    e = load_tables(spark, sf_dir)["embeddings"]
    # same integer math as before, scored as one int64 matmul per Arrow
    # batch instead of interpreted per-row folds — bit-identical results
    return brute_force_topk_int(e, k=TOP_K, n_queries=N_QUERIES)


LSH_PLANES = 6


def _lsh_oracle_sql(multiprobe: int = 1) -> str:
    from ..operators.similarity import _probe_masks
    from ..operators.xhash import rademacher_signs

    signs = rademacher_signs("lsh-plane", LSH_PLANES, 64)
    projs = []
    for row in signs:
        terms = " ".join(
            ("+ " if s > 0 else "- ") + f"v[{j + 1}]" for j, s in enumerate(row)
        )
        projs.append(f"(0 {terms})")
    bucket = " | ".join(
        f"(CASE WHEN {proj} > 0 THEN (1::BIGINT << {p}) ELSE 0::BIGINT END)"
        for p, proj in enumerate(projs)
    )
    # identical mask enumeration to the Spark side (_probe_masks): the
    # bucket + every <=multiprobe-bit XOR perturbation. All masks are
    # distinct, so a candidate matches at most one probe per query —
    # the probe union stays duplicate-free at any depth.
    probe_flips = "\n      UNION ALL\n      ".join(
        f"SELECT query_id, qvec, xor(qbucket, {m}) AS bucket FROM q"
        for m in _probe_masks(LSH_PLANES, multiprobe)
    )
    return f"""
    WITH cq AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS v
      FROM embeddings
    ),
    buckets AS (SELECT vec_id, v, ({bucket}) AS bucket FROM cq),
    q AS (
      SELECT vec_id AS query_id, v AS qvec, bucket AS qbucket
      FROM buckets WHERE vec_id < {N_QUERIES}
    ),
    probes AS (
      SELECT query_id, qvec, qbucket AS bucket FROM q
      UNION ALL
      {probe_flips}
    ),
    scored AS (
      SELECT p.query_id, c.vec_id,
             cast(list_sum([c.v[i+1] * p.qvec[i+1] for i in range(len(c.v))]) as double)
             / (sqrt(cast(list_sum([c.v[i+1] * c.v[i+1] for i in range(len(c.v))]) as double))
                * sqrt(cast(list_sum([p.qvec[i+1] * p.qvec[i+1] for i in range(len(p.qvec))]) as double)))
               AS cosine_sim
      FROM buckets c JOIN probes p ON c.bucket = p.bucket
    )
    SELECT query_id, vec_id, cosine_sim, rnk FROM (
      SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {TOP_K}"""


@workload(
    "ann_lsh_topk",
    _lsh_oracle_sql(),
    doc="LSH-bucketed ANN top-10: Rademacher ±1 sign-projection sketch "
    "over integer-quantized vectors + 1-bit multiprobe + exact integer "
    "cosine re-rank. Buckets, candidates, and ranks are recomputed "
    "bit-for-bit by the DuckDB oracle; the float-hyperplane variant "
    "(lsh_topk) stays as the API for externally-trained planes.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_topk_int

    e = load_tables(spark, sf_dir)["embeddings"]
    return lsh_topk_int(e, k=TOP_K, n_queries=N_QUERIES, dim=64, num_planes=LSH_PLANES)


@workload(
    "ann_lsh_topk_mp2",
    _lsh_oracle_sql(multiprobe=2),
    doc="The PRODUCTION multiprobe depth: same Rademacher LSH as "
    "ann_lsh_topk but probing the bucket plus all 1-bit AND 2-bit "
    "perturbations — the default lsh_topk ships (multiprobe=2) after "
    "the recall-vs-scale probe (SCALE.md) showed depth-1 recall "
    "decaying 0.58->0.22 over a 30x corpus while depth-2 holds ~2x "
    "higher. Probe masks are enumerated by the same _probe_masks in "
    "both engines, so candidate sets and the exact integer-cosine "
    "re-rank stay bit-identical (r5 verdict task 3: the shipped "
    "default now has its own driver oracle).",
)
def ann_lsh_topk_mp2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_topk_int

    e = load_tables(spark, sf_dir)["embeddings"]
    return lsh_topk_int(
        e, k=TOP_K, n_queries=N_QUERIES, dim=64, num_planes=LSH_PLANES, multiprobe=2
    )


def _near_dup_oracle_sql(threshold: float = 0.3) -> str:
    from ..operators.xhash import rademacher_signs

    signs = rademacher_signs("lsh-plane", LSH_PLANES, 64)
    projs = []
    for row in signs:
        terms = " ".join(
            ("+ " if s > 0 else "- ") + f"v[{j + 1}]" for j, s in enumerate(row)
        )
        projs.append(f"(0 {terms})")
    bucket = " | ".join(
        f"(CASE WHEN {proj} > 0 THEN (1::BIGINT << {p}) ELSE 0::BIGINT END)"
        for p, proj in enumerate(projs)
    )
    cos = (
        "cast(list_sum([a.v[i+1] * b.v[i+1] for i in range(len(a.v))]) as double)"
        " / (sqrt(cast(list_sum([a.v[i+1] * a.v[i+1] for i in range(len(a.v))]) as double))"
        " * sqrt(cast(list_sum([b.v[i+1] * b.v[i+1] for i in range(len(b.v))]) as double)))"
    )
    return f"""
    WITH cq AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS v
      FROM embeddings
    ),
    buckets AS (SELECT vec_id, v, ({bucket}) AS bucket FROM cq)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({cos}, 6) AS cosine_sim
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}"""


@workload(
    "embedding_near_dup",
    _near_dup_oracle_sql(),
    doc="Embedding-cosine near-dup pairs (>=0.3) via Rademacher-LSH "
    "bucket self-join + exact integer-cosine verify; buckets and pairs "
    "recomputed bit-for-bit by the DuckDB oracle.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import int_dot, quantize, with_rademacher_bucket
    from ..operators.xhash import rademacher_signs

    e = load_tables(spark, sf_dir)["embeddings"]
    signs = rademacher_signs("lsh-plane", LSH_PLANES, 64)
    c = with_rademacher_bucket(
        e.select("vec_id", quantize(F.col("embedding")).alias("v")), signs, vec_col="v"
    )
    a, b = c.alias("a"), c.alias("b")
    cos = int_dot(F.col("a.v"), F.col("b.v")).cast("double") / (
        F.sqrt(int_dot(F.col("a.v"), F.col("a.v")).cast("double"))
        * F.sqrt(int_dot(F.col("b.v"), F.col("b.v")).cast("double"))
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.3)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cos, 6).alias("cosine_sim"),
        )
    )


@workload(
    "cosine_float_topk",
    f"""
    WITH c AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(x as double)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_sum([c.v[i+1] * q.qv[i+1] for i in range(len(c.v))])
             / (sqrt(list_sum([c.v[i+1] * c.v[i+1] for i in range(len(c.v))]))
                * sqrt(list_sum([q.qv[i+1] * q.qv[i+1] for i in range(len(q.qv))])))
               AS cs
      FROM c CROSS JOIN q
    )
    SELECT query_id, vec_id, round(cs, 6) AS cosine_sim, rnk FROM (
      SELECT query_id, vec_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {TOP_K}
    """,
    doc="Float-path brute-force cosine top-k. Oracle-checkable after all: "
    "both engines fold array doubles LEFT-TO-RIGHT (verified bit-identical "
    "sums), so the same IEEE op sequence yields the same doubles; ranking "
    "uses the unrounded value in both, rounding only on output.",
)
def cosine_float_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return brute_force_topk(e, q, k=TOP_K)


@workload(
    "embedding_near_dup_blocked",
    f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           cast(list_sum([a.v[i+1] * b.v[i+1] for i in range(len(a.v))]) as double)
           / (sqrt(cast(list_sum([a.v[i+1] * a.v[i+1] for i in range(len(a.v))]) as double))
              * sqrt(cast(list_sum([b.v[i+1] * b.v[i+1] for i in range(len(b.v))]) as double)))
             AS cosine_sim
    FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE cast(list_sum([a.v[i+1] * b.v[i+1] for i in range(len(a.v))]) as double)
          / (sqrt(cast(list_sum([a.v[i+1] * a.v[i+1] for i in range(len(a.v))]) as double))
             * sqrt(cast(list_sum([b.v[i+1] * b.v[i+1] for i in range(len(b.v))]) as double)))
          >= 0.35
    """,
    doc="Embedding near-dup pairs within label blocks — the exact "
    "verification kernel of embedding dedup, integer-quantized so both "
    "engines agree bitwise. Blocking bounds the quadratic pair space.",
)
def embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.select("vec_id", "label", _quantized(F.col("embedding")).alias("v"))
    a, b = q.alias("a"), q.alias("b")
    cos = (
        _int_dot(F.col("a.v"), F.col("b.v")).cast("double")
        / (
            F.sqrt(_int_dot(F.col("a.v"), F.col("a.v")).cast("double"))
            * F.sqrt(_int_dot(F.col("b.v"), F.col("b.v")).cast("double"))
        )
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.35)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cosine_sim"),
        )
    )


def _ivf_index_root(sf_dir: str) -> str:
    """Persisted-index location keyed by sf_dir path, a content
    fingerprint (size + mtime of the embeddings parquet), AND the
    build-spec source (IvfIndex.build + the assignment kernel +
    quantize): regenerated testdata at the same path must never
    silently reuse a stale index, and neither must a CODE change to
    the quantization/stride/tie-break spec — a warm /tmp index built
    by old code would otherwise serve old-spec assignments against a
    new-spec oracle, an environment-dependent FAIL (4th-pass review
    finding)."""
    import hashlib
    import inspect
    import os
    import tempfile

    from ..operators.similarity import IvfIndex, quantize

    p = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    parts = [p] if os.path.isfile(p) else sorted(
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    ) if os.path.isdir(p) else []
    fp = ";".join(
        f"{os.path.getsize(f)}:{os.path.getmtime(f):.0f}" for f in parts
    )
    spec = "".join(
        inspect.getsource(fn)
        for fn in (IvfIndex.build, IvfIndex._assign_fn, quantize)
    )
    key = hashlib.md5(f"{p}|{fp}|{spec}".encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "etl_lealone_ivf", key)


# The IVF decomposition every persisted-index oracle shares (quantize,
# sqrt(n)-stride centroids, best-centroid assignment with sim DESC /
# cid tie-break) — ONE constant so a spec change cannot be edited into
# one oracle and not another (the _scd2_oracle lesson).
_IVF_ASSIGN_CTES = """cq AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS cvec
      FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, cvec AS centvec,
             sqrt(cast(list_sum([cvec[i+1]*cvec[i+1] for i in range(len(cvec))]) as double)) AS cnorm
      FROM cq
      WHERE vec_id % (SELECT greatest(1, cast(floor(sqrt(cast(count(*) as double))) as bigint)) FROM embeddings) = 0
    ),
    assign AS (
      SELECT vec_id, cvec, cid FROM (
        SELECT c.vec_id, c.cvec, ct.cid,
               row_number() OVER (PARTITION BY c.vec_id ORDER BY
                 cast(list_sum([c.cvec[i+1]*ct.centvec[i+1] for i in range(len(c.cvec))]) as double) / ct.cnorm DESC,
                 ct.cid) AS rn
        FROM cq c CROSS JOIN cent ct
      ) t WHERE rn = 1
    )"""

# Shared by ann_ivf_topk and ann_ivf_topk_batch: the two engine paths
# (driver-side probe ranking vs executor-side batch assignment) promise
# IDENTICAL results, so they check against the same oracle.
_IVF_TOPK_ORACLE = f"""
    WITH {_IVF_ASSIGN_CTES},
    q AS (SELECT vec_id AS query_id, cvec AS qvec FROM cq WHERE vec_id < {N_QUERIES}),
    probe AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, ct.cid,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 cast(list_sum([q.qvec[i+1]*ct.centvec[i+1] for i in range(len(q.qvec))]) as double) / ct.cnorm DESC,
                 ct.cid) AS rn
        FROM q CROSS JOIN cent ct
      ) t WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, a.vec_id,
             cast(list_sum([a.cvec[i+1]*q.qvec[i+1] for i in range(len(a.cvec))]) as double)
             / (sqrt(cast(list_sum([a.cvec[i+1]*a.cvec[i+1] for i in range(len(a.cvec))]) as double))
                * sqrt(cast(list_sum([q.qvec[i+1]*q.qvec[i+1] for i in range(len(q.qvec))]) as double)))
               AS cosine_sim
      FROM probe p
      JOIN assign a ON a.cid = p.cid
      JOIN q ON q.query_id = p.query_id
    )
    SELECT query_id, vec_id, cosine_sim, rnk FROM (
      SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {TOP_K}
    """


@workload(
    "ann_ivf_topk",
    _IVF_TOPK_ORACLE,
    doc="IVF-style ANN: deterministic sqrt(n) coarse quantizer, broadcast "
    "centroid assignment (map-side partial agg), probe 4 clusters, exact "
    "integer-quantized cosine re-rank. The FAISS IVF-flat trade as "
    "DataFrame ops; fully oracle-checked.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import IvfIndex

    e = load_tables(spark, sf_dir)["embeddings"]
    # build/probe split: the index persists across runs (keyed by path +
    # content fingerprint), so each query pays only the partition-pruned
    # probe — the actual IVF trade, not a rebuild
    idx = IvfIndex(spark, _ivf_index_root(sf_dir))
    idx.build(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _quantized(F.col("embedding")).alias("qvec")
    )
    return idx.topk(q, k=TOP_K, n_probe=4)


@workload(
    "ann_ivf_topk_batch",
    _IVF_TOPK_ORACLE,
    doc="Batch-scoring IVF probe (IvfIndex.topk_batch): the offline "
    "100 TB reprocessing shape — probe cids assigned executor-side per "
    "Arrow batch, query vectors joined back by id, per-cluster exact "
    "int64 matmul scoring via cid-cogrouped applyInPandas. No driver "
    "collect of the query set (only the bounded probed-cid list). Same "
    "oracle as ann_ivf_topk: the two paths are row-identical.",
)
def ann_ivf_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import IvfIndex

    e = load_tables(spark, sf_dir)["embeddings"]
    idx = IvfIndex(spark, _ivf_index_root(sf_dir))
    idx.build(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _quantized(F.col("embedding")).alias("qvec")
    )
    return idx.topk_batch(q, k=TOP_K, n_probe=4)


_CBS_PER_CLUSTER = 8


@workload(
    "cluster_balanced_sample",
    f"""
    WITH {_IVF_ASSIGN_CTES}
    SELECT cid, vec_id, rk FROM (
      SELECT cid, vec_id,
             row_number() OVER (PARTITION BY cid ORDER BY
               md5('cbs0:' || cast(vec_id as varchar)), vec_id) AS rk
      FROM assign
    ) s WHERE rk <= {_CBS_PER_CLUSTER}
    """,
    doc="Cluster-balanced diversity sampling (the DataComp/SemDeDup-"
    "adjacent pretraining op): assign every embedding to its IVF "
    "centroid cluster, then take a FIXED per-cluster quota by seeded "
    "md5 order — small clusters are oversampled relative to frequency, "
    "flattening the corpus's mode collapse. One keyed window over the "
    "persisted partition-pruned assign table; deterministic across "
    "engines (quantized assignment + md5 order).",
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..operators.similarity import IvfIndex

    e = load_tables(spark, sf_dir)["embeddings"]
    idx = IvfIndex(spark, _ivf_index_root(sf_dir))
    idx.build(e)
    assign = spark.read.parquet(os.path.join(idx.root, "assign")).select(
        F.col("vec_id"), F.col("cid").cast("long").alias("cid")
    )
    w = Window.partitionBy("cid").orderBy(
        F.md5(F.concat(F.lit("cbs0:"), F.col("vec_id").cast("string"))),
        F.col("vec_id"),
    )
    return (
        assign.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CBS_PER_CLUSTER)
        .select("cid", "vec_id", "rk")
    )


_IVF_STREAM_CUT = (
    "(SELECT cast(floor(max(vec_id) / 3.0) as bigint) + 1 FROM embeddings)"
)

_IVF_STREAM_SQL = f"""
    WITH cq AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS cvec
      FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, cvec AS centvec,
             sqrt(cast(list_sum([cvec[i+1]*cvec[i+1] for i in range(len(cvec))]) as double)) AS cnorm
      FROM cq
      WHERE vec_id < {_IVF_STREAM_CUT}
        AND vec_id % (SELECT greatest(1, cast(floor(sqrt(cast(count(*) as double))) as bigint))
                      FROM embeddings WHERE vec_id < {_IVF_STREAM_CUT}) = 0
    ),
    assign AS (
      SELECT vec_id, cvec, cid FROM (
        SELECT c.vec_id, c.cvec, ct.cid,
               row_number() OVER (PARTITION BY c.vec_id ORDER BY
                 cast(list_sum([c.cvec[i+1]*ct.centvec[i+1] for i in range(len(c.cvec))]) as double) / ct.cnorm DESC,
                 ct.cid) AS rn
        FROM cq c CROSS JOIN cent ct
      ) t WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, cvec AS qvec FROM cq WHERE vec_id < {N_QUERIES}),
    probe AS (
      SELECT query_id, cid FROM (
        SELECT q.query_id, ct.cid,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 cast(list_sum([q.qvec[i+1]*ct.centvec[i+1] for i in range(len(q.qvec))]) as double) / ct.cnorm DESC,
                 ct.cid) AS rn
        FROM q CROSS JOIN cent ct
      ) t WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, a.vec_id,
             cast(list_sum([a.cvec[i+1]*q.qvec[i+1] for i in range(len(a.cvec))]) as double)
             / (sqrt(cast(list_sum([a.cvec[i+1]*a.cvec[i+1] for i in range(len(a.cvec))]) as double))
                * sqrt(cast(list_sum([q.qvec[i+1]*q.qvec[i+1] for i in range(len(q.qvec))]) as double)))
               AS cosine_sim
      FROM probe p
      JOIN assign a ON a.cid = p.cid
      JOIN q ON q.query_id = p.query_id
    )
    SELECT query_id, vec_id, cosine_sim, rnk FROM (
      SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {TOP_K}
    """


@workload(
    "ann_ivf_stream_build",
    _IVF_STREAM_SQL,
    doc="IVF index built through the STREAMING maintenance path: train "
    "on the first third of the corpus (FAISS train-once), then append "
    "the remaining two thirds as micro-batches via "
    "StreamingIvfMaintainer — including a commit-marker replay that "
    "must be a no-op — and probe. The oracle recomputes the "
    "chunk-trained quantizer + full-corpus assignment + probe exactly, "
    "so the stream-maintained inverted lists are hash-checked against "
    "SQL, not just pytest-pinned batch-equal (r4 verdict task 8 "
    "follow-through for the ANN surface).",
)
def ann_ivf_stream_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.similarity import IvfIndex
    from ..streaming.ann_maintenance import StreamingIvfMaintainer

    e = load_tables(spark, sf_dir)["embeddings"]
    max_id = e.agg(F.max("vec_id")).collect()[0][0] or 0
    cut = max_id // 3 + 1
    tmp_root = tempfile.mkdtemp(prefix="ivf_stream_")
    root = tmp_root + "/idx"
    try:
        idx = IvfIndex(spark, root)
        idx.build(e.filter(F.col("vec_id") < cut))
        maint = StreamingIvfMaintainer(idx)
        b1 = e.filter((F.col("vec_id") >= cut) & (F.col("vec_id") < 2 * cut))
        b2 = e.filter(F.col("vec_id") >= 2 * cut)
        maint.process_batch(b1, batch_id=0, query_key=root)
        # replay of the same batch id: the marker must no-op it, or the
        # inverted lists would double
        maint.process_batch(b1, batch_id=0, query_key=root)
        maint.process_batch(b2, batch_id=1, query_key=root)
        q = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            _quantized(F.col("embedding")).alias("qvec"),
        )
        out = idx.topk(q, k=TOP_K, n_probe=4)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        # remove the mkdtemp PARENT (root is a subdir of it) so gate
        # runs don't accumulate empty /tmp dirs (r5 review)
        shutil.rmtree(tmp_root, ignore_errors=True)


@workload(
    "semantic_dedup_survivors",
    """
    WITH RECURSIVE q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS v
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE cast(list_sum([a.v[i+1] * b.v[i+1] for i in range(len(a.v))]) as double)
            / (sqrt(cast(list_sum([a.v[i+1] * a.v[i+1] for i in range(len(a.v))]) as double))
               * sqrt(cast(list_sum([b.v[i+1] * b.v[i+1] for i in range(len(b.v))]) as double)))
            >= 0.3
    ),
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
    clusters AS (SELECT n AS id, min(m) AS cl FROM reach GROUP BY n),
    losers AS (SELECT id FROM clusters WHERE id <> cl)
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT id FROM losers)
    """,
    doc="SemDeDup-style semantic dedup: blocked exact-cosine pairs "
    "(>=0.3) over integer-quantized embeddings -> connected components "
    "-> keep the minimum id per cluster; singletons pass through.",
)
def semantic_dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup_survivors

    e = load_tables(spark, sf_dir)["embeddings"]
    return semantic_dedup_survivors(e, threshold=0.3)


def _recall_oracle_sql() -> str:
    """Compose the LSH and brute-force chains (distinct CTE names) and
    join their top-k sets: recall@k of the approximate index against
    exact ground truth, per query."""
    from ..operators.xhash import rademacher_signs

    signs = rademacher_signs("lsh-plane", LSH_PLANES, 64)
    projs = []
    for row in signs:
        terms = " ".join(
            ("+ " if s > 0 else "- ") + f"v[{j + 1}]" for j, s in enumerate(row)
        )
        projs.append(f"(0 {terms})")
    bucket = " | ".join(
        f"(CASE WHEN {proj} > 0 THEN (1::BIGINT << {p}) ELSE 0::BIGINT END)"
        for p, proj in enumerate(projs)
    )
    probe_flips = "\n      UNION ALL\n      ".join(
        f"SELECT query_id, qvec, xor(qbucket, {1 << p}) AS bucket FROM lq"
        for p in range(LSH_PLANES)
    )
    cos_cp = (
        "cast(list_sum([c.v[i+1] * p.qvec[i+1] for i in range(len(c.v))]) as double)"
        " / (sqrt(cast(list_sum([c.v[i+1] * c.v[i+1] for i in range(len(c.v))]) as double))"
        " * sqrt(cast(list_sum([p.qvec[i+1] * p.qvec[i+1] for i in range(len(p.qvec))]) as double)))"
    )
    cos_cb = (
        "cast(list_sum([c.v[i+1] * bq.qvec[i+1] for i in range(len(c.v))]) as double)"
        " / (sqrt(cast(list_sum([c.v[i+1] * c.v[i+1] for i in range(len(c.v))]) as double))"
        " * sqrt(cast(list_sum([bq.qvec[i+1] * bq.qvec[i+1] for i in range(len(bq.qvec))]) as double)))"
    )
    return f"""
    WITH cq AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS v
      FROM embeddings
    ),
    bkt AS (SELECT vec_id, v, ({bucket}) AS bucket FROM cq),
    lq AS (
      SELECT vec_id AS query_id, v AS qvec, bucket AS qbucket
      FROM bkt WHERE vec_id < {N_QUERIES}
    ),
    probes AS (
      SELECT query_id, qvec, qbucket AS bucket FROM lq
      UNION ALL
      {probe_flips}
    ),
    lsh_scored AS (
      SELECT p.query_id, c.vec_id, {cos_cp} AS cs
      FROM bkt c JOIN probes p ON c.bucket = p.bucket
    ),
    lsh_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rnk
        FROM lsh_scored
      ) t WHERE rnk <= {TOP_K}
    ),
    bq AS (SELECT vec_id AS query_id, v AS qvec FROM cq WHERE vec_id < {N_QUERIES}),
    brute_scored AS (
      SELECT bq.query_id, c.vec_id, {cos_cb} AS cs
      FROM cq c CROSS JOIN bq
    ),
    brute_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rnk
        FROM brute_scored
      ) t WHERE rnk <= {TOP_K}
    )
    SELECT bt.query_id AS query_id,
           CAST(sum(CASE WHEN lt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(CAST(sum(CASE WHEN lt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / {TOP_K}.0 AS recall_at_k
    FROM brute_top bt
    LEFT JOIN lsh_top lt ON lt.query_id = bt.query_id AND lt.vec_id = bt.vec_id
    GROUP BY bt.query_id"""


@workload(
    "ann_lsh_recall",
    _recall_oracle_sql(),
    doc="Measured recall@10 of the LSH index against exact brute-force "
    "ground truth, per query — the quality metric that justifies an "
    "approximate index. Both pipelines and the recall join are "
    "recomputed bit-for-bit by the DuckDB oracle (integer-quantized "
    "cosines; n_hits CAST to BIGINT per the HUGEINT rule; recall is one "
    "exact small-int division, identical IEEE in both engines).",
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk_int, lsh_topk_int

    e = load_tables(spark, sf_dir)["embeddings"]
    lsh = lsh_topk_int(e, k=TOP_K, n_queries=N_QUERIES, dim=64, num_planes=LSH_PLANES)
    brute = brute_force_topk_int(e, k=TOP_K, n_queries=N_QUERIES)
    return _recall_vs_truth(brute, lsh, TOP_K)


def _recall_vs_truth(brute: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """(query_id, n_hits, recall_at_k): how much of the exact top-k the
    approximate index recovered. Shared by the LSH and IVF recall
    workloads — both tiny inputs (n_queries x k rows)."""
    hits = approx.select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        brute.select("query_id", "vec_id")
        .join(hits, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits").cast("double") / float(k)).alias("recall_at_k"),
        )
    )


def _ivf_recall_oracle_sql() -> str:
    """Brute-force chain + the IVF chain (sqrt(n) modulo centroids,
    4-cluster probe) + the recall join, all in one WITH tree."""
    cos_aq = (
        "cast(list_sum([a.cvec[i+1]*iq.qvec[i+1] for i in range(len(a.cvec))]) as double)"
        " / (sqrt(cast(list_sum([a.cvec[i+1]*a.cvec[i+1] for i in range(len(a.cvec))]) as double))"
        " * sqrt(cast(list_sum([iq.qvec[i+1]*iq.qvec[i+1] for i in range(len(iq.qvec))]) as double)))"
    )
    cos_cb = (
        "cast(list_sum([c.cvec[i+1] * bq.qvec[i+1] for i in range(len(c.cvec))]) as double)"
        " / (sqrt(cast(list_sum([c.cvec[i+1] * c.cvec[i+1] for i in range(len(c.cvec))]) as double))"
        " * sqrt(cast(list_sum([bq.qvec[i+1] * bq.qvec[i+1] for i in range(len(bq.qvec))]) as double)))"
    )
    return f"""
    WITH cq AS (
      SELECT vec_id,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS cvec
      FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, cvec AS centvec,
             sqrt(cast(list_sum([cvec[i+1]*cvec[i+1] for i in range(len(cvec))]) as double)) AS cnorm
      FROM cq
      WHERE vec_id % (SELECT greatest(1, cast(floor(sqrt(cast(count(*) as double))) as bigint)) FROM embeddings) = 0
    ),
    assign AS (
      SELECT vec_id, cvec, cid FROM (
        SELECT c.vec_id, c.cvec, ct.cid,
               row_number() OVER (PARTITION BY c.vec_id ORDER BY
                 cast(list_sum([c.cvec[i+1]*ct.centvec[i+1] for i in range(len(c.cvec))]) as double) / ct.cnorm DESC,
                 ct.cid) AS rn
        FROM cq c CROSS JOIN cent ct
      ) t WHERE rn = 1
    ),
    iq AS (SELECT vec_id AS query_id, cvec AS qvec FROM cq WHERE vec_id < {N_QUERIES}),
    probe AS (
      SELECT query_id, cid FROM (
        SELECT iq.query_id, ct.cid,
               row_number() OVER (PARTITION BY iq.query_id ORDER BY
                 cast(list_sum([iq.qvec[i+1]*ct.centvec[i+1] for i in range(len(iq.qvec))]) as double) / ct.cnorm DESC,
                 ct.cid) AS rn
        FROM iq CROSS JOIN cent ct
      ) t WHERE rn <= 4
    ),
    ivf_scored AS (
      SELECT p.query_id, a.vec_id, {cos_aq} AS cs
      FROM probe p
      JOIN assign a ON a.cid = p.cid
      JOIN iq ON iq.query_id = p.query_id
    ),
    ivf_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rnk
        FROM ivf_scored
      ) t WHERE rnk <= {TOP_K}
    ),
    bq AS (SELECT vec_id AS query_id, cvec AS qvec FROM cq WHERE vec_id < {N_QUERIES}),
    brute_scored AS (
      SELECT bq.query_id, c.vec_id, {cos_cb} AS cs
      FROM cq c CROSS JOIN bq
    ),
    brute_top AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) AS rnk
        FROM brute_scored
      ) t WHERE rnk <= {TOP_K}
    )
    SELECT bt.query_id AS query_id,
           CAST(sum(CASE WHEN it.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(CAST(sum(CASE WHEN it.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / {TOP_K}.0 AS recall_at_k
    FROM brute_top bt
    LEFT JOIN ivf_top it ON it.query_id = bt.query_id AND it.vec_id = bt.vec_id
    GROUP BY bt.query_id"""


@workload(
    "ann_ivf_recall",
    _ivf_recall_oracle_sql(),
    doc="Measured recall@10 of the persisted IVF index (4-probe) against "
    "exact brute-force truth per query — quantifies the cluster-pruning "
    "trade the same way ann_lsh_recall quantifies the hash trade; both "
    "pipelines and the recall join recomputed bit-for-bit in DuckDB.",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import IvfIndex, brute_force_topk_int

    e = load_tables(spark, sf_dir)["embeddings"]
    idx = IvfIndex(spark, _ivf_index_root(sf_dir))
    idx.build(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _quantized(F.col("embedding")).alias("qvec")
    )
    approx = idx.topk(q, k=TOP_K, n_probe=4)
    brute = brute_force_topk_int(e, k=TOP_K, n_queries=N_QUERIES)
    return _recall_vs_truth(brute, approx, TOP_K)


_HN_QUERIES = 20
_HN_K = 5

# Shared by hard_negative_mining and hard_negative_mining_batch: the
# brute Arrow scorer and the full-probe IvfIndex.topk_batch label-carry
# path promise IDENTICAL results (same int64 cosine, same tie-breaks),
# so both check against the same exact oracle — the ann_ivf_topk /
# ann_ivf_topk_batch precedent.
_HN_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS qlab,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS qvec
      FROM embeddings WHERE vec_id < {_HN_QUERIES}
    ),
    c AS (
      SELECT vec_id, label AS clab,
             list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)) AS cvec
      FROM embeddings
    ),
    scored AS (
      SELECT q.query_id, c.vec_id, c.clab,
             cast(list_sum([c.cvec[i+1] * q.qvec[i+1] for i in range(len(c.cvec))]) as double)
             / (sqrt(cast(list_sum([c.cvec[i+1] * c.cvec[i+1] for i in range(len(c.cvec))]) as double))
                * sqrt(cast(list_sum([q.qvec[i+1] * q.qvec[i+1] for i in range(len(q.qvec))]) as double)))
               AS cosine_sim
      FROM c CROSS JOIN q
      WHERE c.clab <> q.qlab
    )
    SELECT query_id, vec_id, clab AS neg_label, cosine_sim, rnk FROM (
      SELECT query_id, vec_id, clab, cosine_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {_HN_K}
    """


@workload(
    "hard_negative_mining",
    _HN_ORACLE,
    doc="Hard-negative mining for contrastive embedding training: per "
    "query, the top-5 most-similar vectors with a DIFFERENT label — "
    "the near-boundary negatives that actually move a model. Candidate "
    "labels ride the Arrow scorer batches (carry_cols) so the corpus x "
    "queries fan-out is never joined; exact int64-matmul cosine, "
    "WindowGroupLimit top-k. Swap the brute scorer for "
    "hard_negatives_int_batch at production scale — filter and top-k "
    "are unchanged (>512 queries route there automatically when an "
    "index is passed).",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hard_negatives_int

    e = load_tables(spark, sf_dir)["embeddings"]
    return hard_negatives_int(e, k=_HN_K, n_queries=_HN_QUERIES)


@workload(
    "hard_negative_mining_batch",
    _HN_ORACLE,
    doc="Batch hard-negative mining (hard_negatives_int_batch over "
    "IvfIndex.topk_batch with the label carry): the production-scale "
    "path — queries are never collected driver-side, candidate labels "
    "arrive via ONE co-keyed corpus-sized carry join before the "
    "cogrouped scorer (never a join of the scored fan-out), and the "
    "different-label filter runs inside the score kernel before the "
    "per-group top-k. Full probe (n_probe = all centroids) here so the "
    "result is row-identical to hard_negative_mining — same oracle; "
    "at 100 TB, n_probe shrinks to the IVF approximation trade.",
)
def hard_negative_mining_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import IvfIndex, hard_negatives_int_batch

    e = load_tables(spark, sf_dir)["embeddings"]
    idx = IvfIndex(spark, _ivf_index_root(sf_dir))
    return hard_negatives_int_batch(e, idx, k=_HN_K, n_queries=_HN_QUERIES)
