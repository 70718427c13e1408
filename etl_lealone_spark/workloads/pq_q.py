"""Product-quantization (PQ/ADC) workloads — the driver-visible oracle
rows for operators/pq.py (r7 verdict residual #2: IVF's assign CTE had a
DuckDB twin, the PQ path had only pytest pins).

The whole PQ pipeline is deterministic by construction (integer-
quantized vectors, md5-chosen seeds, exact integer k-means sums with
floor-division means, lowest-index argmin tie-breaks — pq.py's design
contract), so the ENTIRE train -> encode -> ADC-score path is
re-derivable in ANSI SQL: the oracle below literally re-runs Lloyd's
k-means per subspace as chained CTEs (assign -> integer-sum update,
empty clusters keep their previous centroid via LEFT JOIN + coalesce)
and then re-scores every code by asymmetric distance. Python floor
division on negative sums is emulated explicitly (DuckDB ``//``
truncates toward zero; ``sm // c - 1`` when the remainder is negative).

Fixture contract: embeddings dim is 64 (all SFs) and the corpus fits
under pq_train's seed window (n >= 64) — both asserted Spark-side so a
fixture change fails loudly instead of silently diverging from the
oracle constants.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_tables
from . import workload

# Shared with similarity_q: same query set + k so the ANN surfaces are
# comparable across workload families.
N_QUERIES = 5
TOP_K = 10
M = 8          # PQ subspaces (operator default)
K_CB = 16      # centroids per subspace codebook (operator default)
ITERS = 4      # Lloyd iterations (operator default)
DIM = 64       # fixture embedding dim (asserted at build)
DS = DIM // M  # dims per subspace
N_PROBE = 4    # IVFPQ coarse clusters probed per query


def _kmeans_iter_cte(prev: str, cur: str) -> str:
    """One Lloyd iteration as CTE text: assign every training subvector
    to its nearest ``prev`` centroid (exact int64 squared-L2, lowest
    cid on ties), then per-(subspace, cid, dim) integer sums with
    Python-floor division; clusters with no assignment keep their
    previous centroid (LEFT JOIN + coalesce = pq_train's
    no-row-no-overwrite rule)."""
    return f"""
    a_{cur} AS (
      SELECT id, s, sv, cid FROM (
        SELECT t.id, t.s, t.sv, c.cid,
          row_number() OVER (PARTITION BY t.id, t.s ORDER BY
            list_sum([(t.sv[i+1]-c.cent[i+1])*(t.sv[i+1]-c.cent[i+1]) for i in range({DS})]), c.cid) AS rn
        FROM sub t JOIN {prev} c ON c.s = t.s
      ) z WHERE rn = 1
    ),
    u_{cur} AS (
      SELECT s, cid,
             list(sm // c - CASE WHEN sm < 0 AND sm % c <> 0 THEN 1 ELSE 0 END ORDER BY pos) AS cent
      FROM (
        SELECT a.s, a.cid, p.pos AS pos, sum(a.sv[p.pos+1]) AS sm, count(*) AS c
        FROM a_{cur} a CROSS JOIN (SELECT unnest(range({DS})) AS pos) p
        GROUP BY a.s, a.cid, p.pos
      ) z GROUP BY s, cid
    ),
    {cur} AS (
      SELECT c0.s, c0.cid, coalesce(u.cent, c0.cent) AS cent
      FROM {prev} c0 LEFT JOIN u_{cur} u ON u.s = c0.s AND u.cid = c0.cid
    )"""


# Codebook derivation shared by BOTH oracles (the _IVF_ASSIGN_CTES
# lesson: one constant so a spec change cannot be edited into one
# oracle and not the other). Reproduces pq_train exactly:
#   - training set = full corpus (train_cap larger than every fixture),
#   - seeds = the first 64 rows by id, permuted by md5('pq-seed:'||i)
#     (hex-string order == digest-byte order), first K_CB taken,
#   - ITERS exact-integer Lloyd rounds.
# Defines: cq (id, qv), sub (id, s, sv), cent{ITERS} (s, cid, cent),
# codes (id, s, cid).
_PQ_CODEBOOK_CTES = f"""cq AS (
      SELECT vec_id AS id,
             list_transform(embedding, x -> cast(floor(cast(x as double)*1000000.0 + 0.5) as bigint)) AS qv
      FROM embeddings
    ),
    subidx AS (SELECT unnest(range({M})) AS s),
    sub AS (
      SELECT id, si.s AS s, list_slice(qv, si.s*{DS}+1, si.s*{DS}+{DS}) AS sv
      FROM cq CROSS JOIN subidx si
    ),
    seed64 AS (
      SELECT id, qv, row_number() OVER (ORDER BY id) - 1 AS idx
      FROM cq ORDER BY id LIMIT 64
    ),
    cent0 AS (
      SELECT si.s AS s, p.cid, list_slice(sd.qv, si.s*{DS}+1, si.s*{DS}+{DS}) AS cent
      FROM (SELECT idx,
                   row_number() OVER (ORDER BY md5('pq-seed:' || cast(idx as varchar)), idx) - 1 AS cid
            FROM seed64) p
      JOIN seed64 sd USING (idx) CROSS JOIN subidx si
      WHERE p.cid < {K_CB}
    ),{"".join(_kmeans_iter_cte(f"cent{i}", f"cent{i + 1}") + "," for i in range(ITERS))}
    codes AS (
      SELECT id, s, cid FROM (
        SELECT t.id, t.s, c.cid,
          row_number() OVER (PARTITION BY t.id, t.s ORDER BY
            list_sum([(t.sv[i+1]-c.cent[i+1])*(t.sv[i+1]-c.cent[i+1]) for i in range({DS})]), c.cid) AS rn
        FROM sub t JOIN cent{ITERS} c ON c.s = t.s
      ) z WHERE rn = 1
    )"""

# Per-(query, subspace, cid) ADC table entry: exact int64 squared-L2 of
# the query's subvector to that codebook centroid.
_QTAB_CTE = f"""qtab AS (
      SELECT q.query_id, c.s, c.cid,
        list_sum([(list_slice(q.qv, c.s*{DS}+1, c.s*{DS}+{DS})[i+1]-c.cent[i+1])
                  *(list_slice(q.qv, c.s*{DS}+1, c.s*{DS}+{DS})[i+1]-c.cent[i+1]) for i in range({DS})]) AS d
      FROM q CROSS JOIN cent{ITERS} c
    )"""


_PQ_ADC_ORACLE = f"""
    WITH {_PQ_CODEBOOK_CTES},
    q AS (SELECT id AS query_id, qv FROM cq WHERE id < {N_QUERIES}),
    {_QTAB_CTE},
    scored AS (
      SELECT qt.query_id, cd.id AS vec_id, cast(sum(qt.d) AS BIGINT) AS adc_dist
      FROM codes cd JOIN qtab qt ON qt.s = cd.s AND qt.cid = cd.cid
      GROUP BY qt.query_id, cd.id
    )
    SELECT query_id, vec_id, adc_dist, rnk FROM (
      SELECT query_id, vec_id, adc_dist,
             row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {TOP_K}
    """


def _check_fixture(e: DataFrame) -> None:
    """The oracle's slice constants assume DIM components; fail loudly
    on fixture drift instead of hash-mismatching downstream."""
    row = e.select(F.size(F.col("embedding")).alias("d")).first()
    if row["d"] != DIM:
        raise ValueError(
            f"pq workloads assume embedding dim {DIM}, fixture has {row['d']}"
        )


@workload(
    "pq_adc_topk",
    _PQ_ADC_ORACLE,
    doc="Full PQ pipeline with a cross-engine oracle: pq_train (exact-"
    "integer Lloyd k-means per subspace, md5-seeded) -> pq_encode "
    "(map-only Arrow argmin) -> pq_adc_topk ADC scoring (driver-built "
    "m*k lookup table, JVM array-lookup expression + "
    "TakeOrderedAndProject) for 5 queries. The DuckDB twin re-runs the "
    "whole k-means as chained CTEs — codebooks, codes, and ADC "
    "distances are all re-derived, not trusted.",
)
def pq_adc_topk_wl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_adc_topk, pq_encode, pq_train

    e = load_tables(spark, sf_dir)["embeddings"]
    _check_fixture(e)
    cbs = pq_train(e, m=M, k=K_CB, iters=ITERS, train_cap=0)
    codes = pq_encode(e, cbs)
    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    parts = [
        pq_adc_topk(
            codes, [float(x) for x in r["embedding"]], cbs, k=TOP_K, id_col="id"
        ).select(
            F.lit(int(r["vec_id"])).cast("long").alias("query_id"),
            F.col("id").alias("vec_id"),
            F.col("adc_dist"),
        )
        for r in qrows
    ]
    un = functools.reduce(DataFrame.unionByName, parts)
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("vec_id"))
    return un.withColumn("rnk", F.row_number().over(w))


def _ivfpq_index_root(sf_dir: str) -> str:
    """Persisted IVFPQ index root keyed by data path + content
    fingerprint + build-spec source (the _ivf_index_root discipline:
    regenerated testdata OR a code change to the quantize/seed/argmin
    spec must never silently reuse a stale index)."""
    import hashlib
    import inspect
    import os
    import tempfile

    from ..operators.pq import IvfPqIndex, _encode_fn, pq_train
    from ..operators.similarity import quantize

    p = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    parts = [p] if os.path.isfile(p) else sorted(
        os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
    ) if os.path.isdir(p) else []
    fp = ";".join(f"{os.path.getsize(f)}:{os.path.getmtime(f):.0f}" for f in parts)
    spec = "".join(
        inspect.getsource(fn)
        for fn in (IvfPqIndex.build, pq_train, _encode_fn, quantize)
    )
    key = hashlib.md5(f"{p}|{fp}|{spec}".encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "etl_lealone_ivfpq", key)


# The IVFPQ coarse layer on top of the shared codebook CTEs:
# sqrt(n) centroids chosen by md5-hash order of vec_id (15-hex-digit
# prefix compares identically as string or number), coarse assignment
# by exact squared-L2 with lowest-cid ties (cids are vec_ids, sorted),
# per-query probes by distance-then-cid, ADC only within probed
# clusters. Mirrors IvfPqIndex.build/topk_batch stage for stage.
_IVFPQ_BATCH_ORACLE = f"""
    WITH {_PQ_CODEBOOK_CTES},
    coarse AS (
      SELECT vec_id AS ccid, cvec FROM (
        SELECT c.id AS vec_id, c.qv AS cvec,
               row_number() OVER (ORDER BY substring(md5(cast(c.id as varchar)), 1, 15), c.id) AS hrk
        FROM cq c
      ) z
      WHERE hrk <= (SELECT greatest(1, cast(floor(sqrt(cast(count(*) as double))) as bigint)) FROM embeddings)
    ),
    cassign AS (
      SELECT id, ccid FROM (
        SELECT c.id, ct.ccid,
          row_number() OVER (PARTITION BY c.id ORDER BY
            list_sum([(c.qv[i+1]-ct.cvec[i+1])*(c.qv[i+1]-ct.cvec[i+1]) for i in range({DIM})]), ct.ccid) AS rn
        FROM cq c CROSS JOIN coarse ct
      ) z WHERE rn = 1
    ),
    q AS (SELECT id AS query_id, qv FROM cq WHERE id < {N_QUERIES}),
    probe AS (
      SELECT query_id, ccid FROM (
        SELECT q.query_id, ct.ccid,
          row_number() OVER (PARTITION BY q.query_id ORDER BY
            list_sum([(q.qv[i+1]-ct.cvec[i+1])*(q.qv[i+1]-ct.cvec[i+1]) for i in range({DIM})]), ct.ccid) AS rn
        FROM q CROSS JOIN coarse ct
      ) z WHERE rn <= {N_PROBE}
    ),
    {_QTAB_CTE},
    scored AS (
      SELECT qt.query_id, cd.id AS vec_id, cast(sum(qt.d) AS BIGINT) AS adc_dist
      FROM probe p
      JOIN cassign ca ON ca.ccid = p.ccid
      JOIN codes cd ON cd.id = ca.id
      JOIN qtab qt ON qt.query_id = p.query_id AND qt.s = cd.s AND qt.cid = cd.cid
      GROUP BY qt.query_id, cd.id
    )
    SELECT query_id, vec_id, adc_dist, rnk FROM (
      SELECT query_id, vec_id, adc_dist,
             row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rnk
      FROM scored
    ) t WHERE rnk <= {TOP_K}
    """


@workload(
    "ann_ivfpq_topk_batch",
    _IVFPQ_BATCH_ORACLE,
    doc="End-to-end IVFPQ batch probe (IvfPqIndex.build + topk_batch): "
    "persisted coarse-partitioned PQ codes, executor-side probe "
    "assignment, cid-cogrouped exact-int64 ADC scoring — the "
    "billion-vector FAISS layout's offline-reprocessing path, with the "
    "coarse layer AND the PQ codebooks both re-derived by the oracle.",
)
def ann_ivfpq_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import IvfPqIndex

    e = load_tables(spark, sf_dir)["embeddings"]
    _check_fixture(e)
    idx = IvfPqIndex(spark, _ivfpq_index_root(sf_dir), m=M, k=K_CB)
    idx.build(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    return idx.topk_batch(q, k=TOP_K, n_probe=N_PROBE)
