"""ML / corpus-curation workloads: distributed k-means, k-NN label
voting, TF-IDF keyword extraction, naive-Bayes classification.

Every workload carries a full DuckDB oracle. Cross-engine float
strategy follows the package rules: vectors integer-quantize before any
arithmetic (similarity_q discipline), log-probabilities fixed-point
quantize per distinct input (unigram_logprob discipline, one rounding
per vocabulary entry, integer per-doc sums), argmin/argmax ties break
on an explicit key. The k-means oracle UNROLLS Lloyd's iterations as
CTE blocks — assignment via row_number-over-(dist, cid) mirrors the
engine's lexicographic struct-argmin exactly, and centroid means
re-quantize to bigint (floor(sum/n + 0.5)) so iteration 2's input is
bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_tables
from . import workload

_DIM = 64  # fixture embedding dimensionality (TESTDATA.md)
_K = 8
_KNN_QUERIES = 20
_KNN_K = 10

_QUANT = (
    "list_transform(embedding, x -> "
    "cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint))"
)

_SQDIST = (
    "list_sum(list_transform(range(1, {d1}), i -> "
    "(q.qvec[i] - {c}.cvec[i]) * (q.qvec[i] - {c}.cvec[i])))"
)


# shared Lloyd-iteration CTE prefix (q -> seeded c0 -> assign a1 ->
# requantized means c1): the profile AND the separation audit build on
# the SAME final centroids — a kernel change must update both via this
# one constant (the minhash_banded_cte_sql precedent, dedup_q.py)
_KMEANS_CTES = f"""
    WITH q AS (
      SELECT vec_id, cast(label as bigint) AS label, {_QUANT} AS qvec
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, qvec AS cvec FROM q WHERE vec_id < {_K}),
    d1 AS (
      SELECT q.vec_id, c0.cid,
             {_SQDIST.format(d1=_DIM + 1, c="c0")} AS dist
      FROM q CROSS JOIN c0
    ),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d1) t WHERE rn = 1
    ),
    m1 AS (
      SELECT a1.cid, t.i AS pos,
             cast(floor(cast(sum(q.qvec[t.i]) as double) / count(*) + 0.5)
                  as bigint) AS mv
      FROM a1 JOIN q USING (vec_id) CROSS JOIN range(1, {_DIM + 1}) t(i)
      GROUP BY a1.cid, t.i
    ),
    c1 AS (SELECT cid, list(mv ORDER BY pos) AS cvec FROM m1 GROUP BY cid)"""

_KMEANS_SQL = f"""{_KMEANS_CTES},
    d2 AS (
      SELECT q.vec_id, q.label, c1.cid,
             {_SQDIST.format(d1=_DIM + 1, c="c1")} AS dist
      FROM q CROSS JOIN c1
    ),
    a2 AS (
      SELECT vec_id, label, cid, dist FROM (
        SELECT vec_id, label, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d2) t WHERE rn = 1
    ),
    prof AS (
      SELECT cid AS cluster_id, count(*) AS n_vecs,
             cast(sum(vec_id) as bigint) AS sum_vec_id,
             cast(sum(dist) as bigint) AS inertia
      FROM a2 GROUP BY cid
    ),
    lab AS (
      SELECT cluster_id, label AS majority_label, n_lab FROM (
        SELECT cid AS cluster_id, label, count(*) AS n_lab,
               row_number() OVER (PARTITION BY cid
                                  ORDER BY count(*) DESC, label) AS rn
        FROM a2 GROUP BY cid, label) t WHERE rn = 1
    )
    SELECT p.cluster_id, p.n_vecs, p.sum_vec_id, p.inertia,
           l.majority_label,
           cast(floor(cast(l.n_lab as double) * 1000000.0
                      / cast(p.n_vecs as double)) as bigint) AS purity_x1e6
    FROM prof p JOIN lab l USING (cluster_id)
"""


@workload(
    "kmeans_cluster_profile",
    _KMEANS_SQL,
    doc="Distributed Lloyd's k-means (k=8, 2 assignment passes, exact "
    "integer distances, bigint-requantized means) with the per-cluster "
    "profile: size, inertia, majority weak-label, purity. Assignment is "
    "map-only (centroid literals in one codegen projection); the update "
    "is a k*dim-group aggregation with map-side partials.",
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_cluster_profile as km

    e = load_tables(spark, sf_dir)["embeddings"]
    return km(e, k=_K, iters=2)


_KNN_SQL = f"""
    WITH q AS (
      SELECT vec_id AS query_id, {_QUANT} AS qvec
      FROM embeddings WHERE vec_id < {_KNN_QUERIES}
    ),
    c AS (
      SELECT vec_id, cast(label as bigint) AS label, {_QUANT} AS cvec
      FROM embeddings
    ),
    scored AS (
      SELECT q.query_id, c.vec_id, c.label,
             cast(list_sum([c.cvec[i+1] * q.qvec[i+1]
                            for i in range(len(c.cvec))]) as double)
             / (sqrt(cast(list_sum([c.cvec[i+1] * c.cvec[i+1]
                                    for i in range(len(c.cvec))]) as double))
                * sqrt(cast(list_sum([q.qvec[i+1] * q.qvec[i+1]
                                      for i in range(len(q.qvec))]) as double)))
               AS cosine_sim
      FROM c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    nn AS (
      SELECT query_id, label FROM (
        SELECT query_id, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, vec_id) AS rnk
        FROM scored) t WHERE rnk <= {_KNN_K}
    ),
    votes AS (
      SELECT query_id, label AS pred_label, n_votes FROM (
        SELECT query_id, label, count(*) AS n_votes,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY count(*) DESC, label) AS rn
        FROM nn GROUP BY query_id, label) t WHERE rn = 1
    )
    SELECT v.query_id, t.label AS true_label, v.pred_label,
           v.n_votes AS votes
    FROM votes v JOIN c t ON t.vec_id = v.query_id
"""


@workload(
    "knn_label_vote",
    _KNN_SQL,
    doc="k-NN label audit: exact integer-cosine 10-NN (self excluded) "
    "for 20 query vectors, majority vote vs the true weak label. "
    "Queries broadcast in the Arrow scorer closure; corpus map-only.",
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import knn_label_vote as knn

    e = load_tables(spark, sf_dir)["embeddings"]
    return knn(e, k=_KNN_K, n_queries=_KNN_QUERIES)


_WS_SQL = (
    "list_filter(string_split(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
)

_TFIDF_SQL = f"""
    WITH w AS (SELECT doc_id, {_WS_SQL} AS ws FROM documents),
    tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
    n AS (SELECT count(*) AS n_total FROM documents),
    idf AS (
      SELECT w,
             cast(floor((ln(cast(n_total + 1 as double)
                            / cast(count(DISTINCT doc_id) + 1 as double))
                         + 1.0) * 1000000 + 0.5) as bigint) AS idf_x1e6
      FROM tok, n GROUP BY w, n_total
    ),
    tf AS (
      SELECT doc_id, w, count(*) AS tf
      FROM tok WHERE doc_id < 10 GROUP BY doc_id, w
    ),
    scored AS (
      SELECT tf.doc_id, tf.w AS term, tf.tf,
             tf.tf * idf.idf_x1e6 AS score_x1e6
      FROM tf JOIN idf USING (w)
    )
    SELECT doc_id, term, tf, score_x1e6 FROM (
      SELECT doc_id, term, tf, score_x1e6,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_x1e6 DESC, term) AS rnk
      FROM scored) t WHERE rnk <= 5
"""


@workload(
    "tfidf_doc_keywords",
    _TFIDF_SQL,
    doc="Per-document TF-IDF keyword extraction: smoothed-idf "
    "(ln((N+1)/(df+1))+1, fixed-point bigint) over the FULL corpus, "
    "top-5 terms for the 10 target docs. df is one vocabulary-sized "
    "agg; tf is computed only for the pushed-down target docs.",
)
def tfidf_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import tfidf_doc_keywords as tfidf

    d = load_tables(spark, sf_dir)["documents"]
    return tfidf(d, n_docs=10, top=5)


_NB_CTES = f"""
    WITH w AS (SELECT doc_id, lang, {_WS_SQL} AS ws FROM documents),
    tok AS (
      SELECT doc_id, lang AS cls,
             ('0x' || substr(md5(wd), 1, 15))::BIGINT % 4096 AS b
      FROM (SELECT doc_id, lang, unnest(ws) AS wd FROM w) u
    ),
    train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
    test AS (SELECT doc_id, cls AS true_cls, b FROM tok WHERE doc_id % 2 = 1),
    cls_tok AS (SELECT cls, count(*) AS n_tok FROM train GROUP BY cls),
    n_train AS (SELECT count(*) AS n_train FROM documents WHERE doc_id % 2 = 0),
    cls_docs AS (
      SELECT lang AS cls, count(*) AS n_docs_cls
      FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    ),
    classes AS (
      SELECT ct.cls,
             cast(floor(ln(1.0 / cast(ct.n_tok + 4096 as double))
                        * 1000000 + 0.5) as bigint) AS lp_floor,
             cast(floor(ln(cast(cd.n_docs_cls as double)
                           / cast(nt.n_train as double))
                        * 1000000 + 0.5) as bigint) AS lp_prior
      FROM cls_tok ct JOIN cls_docs cd USING (cls), n_train nt
    ),
    model AS (
      SELECT cb.cls, cb.b,
             cast(floor(ln(cast(cb.c + 1 as double)
                           / cast(ct.n_tok + 4096 as double))
                        * 1000000 + 0.5) as bigint) AS lp
      FROM (SELECT cls, b, count(*) AS c FROM train GROUP BY cls, b) cb
      JOIN cls_tok ct USING (cls)
    ),
    sums AS (
      SELECT te.doc_id, te.true_cls, cl.cls,
             cast(sum(coalesce(m.lp, cl.lp_floor)) as bigint) AS lp_sum
      FROM test te
      CROSS JOIN (SELECT cls, lp_floor FROM classes) cl
      LEFT JOIN model m ON m.cls = cl.cls AND m.b = te.b
      GROUP BY te.doc_id, te.true_cls, cl.cls
    ),
    tot AS (
      SELECT s.doc_id, s.true_cls, s.cls, s.lp_sum + c.lp_prior AS score
      FROM sums s JOIN classes c ON c.cls = s.cls
    )"""

_NB_SQL = f"""{_NB_CTES},
    pred AS (
      SELECT doc_id, true_cls, cls AS pred_cls FROM (
        SELECT doc_id, true_cls, cls,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cls) AS rn
        FROM tot) t WHERE rn = 1
    )
    SELECT true_cls AS true_class, pred_cls AS pred_class,
           count(*) AS n_docs
    FROM pred GROUP BY true_cls, pred_cls
"""


@workload(
    "nb_lang_confusion",
    _NB_SQL,
    doc="Multinomial naive-Bayes language classifier (fastText-style "
    "corpus-curation model): train on even-id docs over 4096 hashed "
    "token buckets, score odd-id docs, emit the confusion matrix. "
    "Model is |classes|x4096 rows broadcast onto the test token stream; "
    "all log-probs fixed-point bigint.",
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import nb_class_confusion

    d = load_tables(spark, sf_dir)["documents"]
    return nb_class_confusion(d, class_col="lang", buckets=4096)


# ---------------------------------------------------------------------------
# exact Pearson correlation matrix: all moments as exact wide integers
# (Spark decimal(38,0) == DuckDB HUGEINT), one corpus pass, 1-row agg
# ---------------------------------------------------------------------------
_CORR_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def _corr_sql() -> str:
    from itertools import combinations

    tags = {c: c.split("_", 1)[1][:2] for c in _CORR_COLS}
    qs = ",\n             ".join(
        f"cast(floor({c} * 100.0 + 0.5) as hugeint) AS v_{tags[c]}"
        for c in _CORR_COLS
    )
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in _CORR_COLS)
    sums = ["cast(count(*) as hugeint) AS n"]
    for c in _CORR_COLS:
        t = tags[c]
        sums.append(f"sum(v_{t}) AS s_{t}")
        sums.append(f"sum(v_{t} * v_{t}) AS s_{t}_{t}")
    for a, b in combinations(_CORR_COLS, 2):
        ta, tb = tags[a], tags[b]
        sums.append(f"sum(v_{ta} * v_{tb}) AS s_{ta}_{tb}")
    pair_rows = []
    for a, b in combinations(_CORR_COLS, 2):
        ta, tb = tags[a], tags[b]
        pair_rows.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, cast(n as bigint) AS n_rows,\n"
            f"   CASE WHEN cast(n * s_{ta}_{ta} - s_{ta} * s_{ta} as double) > 0\n"
            f"         AND cast(n * s_{tb}_{tb} - s_{tb} * s_{tb} as double) > 0\n"
            f"   THEN cast(floor(cast(n * s_{ta}_{tb} - s_{ta} * s_{tb} as double)\n"
            f"     / (sqrt(cast(n * s_{ta}_{ta} - s_{ta} * s_{ta} as double))\n"
            f"        * sqrt(cast(n * s_{tb}_{tb} - s_{tb} * s_{tb} as double)))\n"
            f"     * 1000000.0 + 0.5) as bigint) END AS corr_x1e6 FROM m"
        )
    return (
        f"WITH q AS (SELECT {qs} FROM lineitem WHERE {notnull}),\n"
        f"m AS (SELECT {', '.join(sums)} FROM q)\n"
        + "\nUNION ALL\n".join(pair_rows)
    )


@workload(
    "numeric_corr_matrix",
    _corr_sql(),
    doc="Exact Pearson correlation matrix over the four lineitem "
    "measures: cent-quantized integer moments in decimal(38,0) "
    "(HUGEINT in the oracle), ALL pair moments in ONE ungrouped "
    "corpus pass (map-side partials, 1-row result), matrix exploded "
    "from literals. Bit-identical across engines/partitionings — "
    "F.corr's raw-double accumulation is not.",
)
def numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import exact_corr_matrix

    li = load_tables(spark, sf_dir)["lineitem"]
    return exact_corr_matrix(li, _CORR_COLS, scale=100)


# ---------------------------------------------------------------------------
# chi-squared feature selection over hashed token buckets
# ---------------------------------------------------------------------------
_CHI2_SQL = f"""
    WITH w AS (SELECT doc_id, lang, {_WS_SQL} AS ws FROM documents),
    tok AS (
      SELECT lang AS cls,
             ('0x' || substr(md5(wd), 1, 15))::BIGINT % 4096 AS b
      FROM (SELECT doc_id, lang, unnest(ws) AS wd FROM w) u
    ),
    cb AS (SELECT cls, b, count(*) AS a FROM tok GROUP BY cls, b),
    ct AS (SELECT cls, count(*) AS n_cls FROM tok GROUP BY cls),
    bt AS (SELECT b, count(*) AS n_b FROM tok GROUP BY b),
    g AS (SELECT count(*) AS n_all FROM tok),
    j AS (
      SELECT cb.cls, cb.b,
             cast(cb.a as double) AS da,
             cast(ct.n_cls - cb.a as double) AS dbq,
             cast(bt.n_b - cb.a as double) AS dc,
             cast(g.n_all - ct.n_cls - bt.n_b + cb.a as double) AS dd,
             cast(g.n_all as double) AS dn
      FROM cb JOIN ct USING (cls) JOIN bt USING (b), g
      WHERE ct.n_cls < g.n_all AND bt.n_b < g.n_all
    ),
    scored AS (
      SELECT cls, b AS bucket,
             cast(floor(
               dn * (da * dd - dbq * dc) * (da * dd - dbq * dc)
               / ((da + dbq) * (dc + dd) * (da + dc) * (dbq + dd))
               * 1000.0 + 0.5) as bigint) AS chi2_x1e3
      FROM j
    )
    SELECT cls, bucket, chi2_x1e3 FROM scored
    ORDER BY chi2_x1e3 DESC, cls, bucket
    LIMIT 30
"""


@workload(
    "chi2_term_class_top",
    _CHI2_SQL,
    doc="Chi-squared feature selection: top-30 most class-discriminative "
    "hashed token buckets (the vocabulary-selection step before "
    "training a bag-of-words classifier). One |classes|x4096-group "
    "aggregation + broadcast margins; exact integer contingencies, "
    "double products in a fixed op sequence, fixed-point output.",
)
def chi2_term_class_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import chi2_top_terms

    d = load_tables(spark, sf_dir)["documents"]
    return chi2_top_terms(d, class_col="lang", buckets=4096, top=30)


# ---------------------------------------------------------------------------
# power-iteration PCA: per-label projection stats along the top
# principal direction (embedding/label separability audit)
# ---------------------------------------------------------------------------
def _pca_sql(iters: int = 3) -> str:
    d1 = _DIM + 1

    def dot_floor(cvec: str, vexpr: str) -> str:
        return (
            f"cast(floor(cast(list_sum(list_transform(range(1, {d1}), "
            f"i -> {cvec}[i] * {vexpr}[i])) as double) / 1000000.0) as bigint)"
        )

    blocks = [
        f"""WITH q AS (
      SELECT vec_id, cast(label as bigint) AS label, {_QUANT} AS qvec
      FROM embeddings
    ),
    mu AS (
      SELECT t.i AS pos,
             cast(floor(cast(sum(q.qvec[t.i]) as double) / count(*) + 0.5)
                  as bigint) AS mu
      FROM q CROSS JOIN range(1, {d1}) t(i) GROUP BY t.i
    ),
    muv AS (SELECT list(mu ORDER BY pos) AS ml FROM mu),
    c AS (
      SELECT q.vec_id, q.label,
             list_transform(range(1, {d1}), i -> q.qvec[i] - m.ml[i]) AS cvec
      FROM q, muv m
    ),
    v0 AS (SELECT list_transform(range(1, {d1}), i -> 1000000::BIGINT) AS vl)"""
    ]
    for t in range(1, iters + 1):
        blocks.append(
            f"""y{t} AS (
      SELECT c.vec_id, c.label, c.cvec,
             {dot_floor('c.cvec', f'v{t - 1}.vl')} AS y
      FROM c, v{t - 1}
    ),
    z{t} AS (
      SELECT t.i AS pos,
             cast(sum(cast(y{t}.y * y{t}.cvec[t.i] as hugeint)) as hugeint) AS z
      FROM y{t} CROSS JOIN range(1, {d1}) t(i) GROUP BY t.i
    ),
    m{t} AS (SELECT max(abs(z)) AS m FROM z{t}),
    v{t} AS (
      SELECT list(cast(floor(cast(z.z as double) * 1000000.0
                             / cast(mm.m as double) + 0.5) as bigint)
                  ORDER BY z.pos) AS vl
      FROM z{t} z, m{t} mm
    )"""
        )
    blocks.append(
        f"""proj AS (
      SELECT c.label, {dot_floor('c.cvec', f'v{iters}.vl')} AS proj
      FROM c, v{iters}
    )
    SELECT label, count(*) AS n_vecs,
           cast(sum(proj) as bigint) AS sum_proj,
           min(proj) AS min_proj, max(proj) AS max_proj
    FROM proj GROUP BY label"""
    )
    return ",\n    ".join(blocks)


@workload(
    "pca_label_projection",
    _pca_sql(3),
    doc="Top principal direction via 3 fixed-point power iterations "
    "(integer-centered vectors, decimal/HUGEINT matvec sums, "
    "requantized direction each step — bit-identical across engines), "
    "reported as per-label projection stats: the label-separability "
    "audit along PC1. Per iteration: one map-only projection + one "
    "dim-group shuffle of map-side partials.",
)
def pca_label_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import power_iteration_projection

    e = load_tables(spark, sf_dir)["embeddings"]
    return power_iteration_projection(e, iters=3)


_KMEANS_SEP_SQL = f"""{_KMEANS_CTES},
    ds AS (
      SELECT q.vec_id, c1.cid,
             {_SQDIST.format(d1=_DIM + 1, c="c1")} AS dist
      FROM q CROSS JOIN c1
    ),
    rs AS (
      SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM ds
    ),
    two AS (
      SELECT a.vec_id, a.cid AS cluster_id, a.dist AS dd1, b.dist AS dd2
      FROM (SELECT * FROM rs WHERE rn = 1) a
      JOIN (SELECT * FROM rs WHERE rn = 2) b USING (vec_id)
    ),
    agg AS (
      SELECT cluster_id, count(*) AS n_vecs,
             cast(sum(dd1) as bigint) AS sum_d1,
             cast(sum(dd2) as bigint) AS sum_d2
      FROM two GROUP BY cluster_id
    )
    SELECT cluster_id, n_vecs, sum_d1, sum_d2,
           CASE WHEN sum_d1 > 0 THEN
             cast(floor(cast(sum_d2 as double) * 1000000.0
                        / cast(sum_d1 as double)) as bigint)
           END AS separation_x1e6
    FROM agg
"""


@workload(
    "kmeans_separation_audit",
    _KMEANS_SEP_SQL,
    doc="Cluster-separation audit on the SAME Lloyd centroids as "
    "kmeans_cluster_profile: per cluster, exact bigint sums of the "
    "nearest and second-nearest squared centroid distances and their "
    "ratio (simplified-silhouette centroid proxy). separation ~ 1e6 "
    "flags merge/split candidates. Map-only scoring (both distances "
    "from one array_sort of the k-struct array), one k-group agg.",
)
def kmeans_separation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_separation_audit as audit

    e = load_tables(spark, sf_dir)["embeddings"]
    return audit(e, k=_K, iters=2)


# ---------------------------------------------------------------------------
# binary-classifier evaluation on the shared NB scoring kernel:
# binned AUC (Mann-Whitney) + reliability/calibration table
# ---------------------------------------------------------------------------
def _binary_cte(n_bins: int) -> str:
    return f"""
    bs AS (
      SELECT doc_id, score,
             CASE WHEN true_cls = 'en' THEN 1 ELSE 0 END AS is_pos
      FROM tot WHERE cls = 'en'
    ),
    rng AS (SELECT min(score) AS s_min, max(score) AS s_max FROM bs),
    hist AS (
      SELECT (score - s_min) * {n_bins} // (s_max - s_min + 1) AS bin,
             cast(sum(is_pos) as bigint) AS n_pos,
             cast(sum(1 - is_pos) as bigint) AS n_neg
      FROM bs, rng GROUP BY 1
    )"""


_NB_AUC_SQL = f"""{_NB_CTES},{_binary_cte(4096)},
    cross_u AS (
      SELECT coalesce(cast(sum(2::hugeint * a.n_pos * b.n_neg)
                           as hugeint), 0::hugeint) AS u2_cross
      FROM hist a JOIN hist b ON b.bin < a.bin
    ),
    same_u AS (
      SELECT coalesce(cast(sum(n_pos::hugeint * n_neg) as hugeint),
                      0::hugeint) AS u2_same,
             coalesce(cast(sum(n_pos) as bigint), 0) AS n_pos,
             coalesce(cast(sum(n_neg) as bigint), 0) AS n_neg
      FROM hist
    )
    SELECT s.n_pos, s.n_neg,
           CASE WHEN s.n_pos > 0 AND s.n_neg > 0 THEN
             cast(floor(cast(c.u2_cross + s.u2_same as double)
                        / cast(2::hugeint * s.n_pos * s.n_neg as double)
                        * 1000000.0 + 0.5) as bigint)
           END AS auc_x1e6
    FROM same_u s, cross_u c
"""


@workload(
    "nb_en_auc_binned",
    _NB_AUC_SQL,
    doc="Binned AUC (Mann-Whitney) of the NB 'en'-vs-rest score over "
    "4096 exact integer score bins — the quality-classifier evaluation "
    "that never computes a per-document global rank: the histogram is "
    "one bounded aggregation and the pair mass is a <=4096-row "
    "self-join with decimal-exact sums. Ties at a bin count half.",
)
def nb_en_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import nb_binary_auc

    d = load_tables(spark, sf_dir)["documents"]
    return nb_binary_auc(d, positive_class="en", class_col="lang")


_NB_CALIB_SQL = f"""{_NB_CTES},{_binary_cte(10)}
    SELECT bin AS decile, n_pos + n_neg AS n_docs, n_pos,
           cast(floor(cast(n_pos as double) * 1000000.0
                      / cast(n_pos + n_neg as double)) as bigint)
             AS pos_rate_x1e6
    FROM hist
"""


@workload(
    "nb_score_calibration",
    _NB_CALIB_SQL,
    doc="Reliability table for the NB 'en' score: 10 fixed score-range "
    "bins, per-bin positive rate — the calibration read a thresholding "
    "pipeline needs before trusting a cutoff. Shares the NB scoring "
    "kernel and the exact integer binning with the AUC row.",
)
def nb_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import nb_calibration_deciles

    d = load_tables(spark, sf_dir)["documents"]
    return nb_calibration_deciles(d, positive_class="en", class_col="lang")


# ---------------------------------------------------------------------------
# Logistic regression (fixed-point gradient steps) — r10 addition
# ---------------------------------------------------------------------------
_LOGREG_DIMS = 8
_LOGREG_ITERS = 2
_LOGREG_TARGET = 0
_LOGREG_LR_NUM = 4
_LOGREG_LR_DEN = 1


def _logreg_sql(
    dims: int, iters: int, target: int, lr_num: int, lr_den: int
) -> str:
    """Generated oracle for operators/logreg.py: UNROLLS the gradient
    steps as CTE blocks (the kmeans/pca discipline). Per step: the
    fast-sigmoid score quantizes once per row, the gradient accumulates
    as exact HUGEINT sums per feature position, and the weight update
    replays delta_w's pinned double sequence — so step t+1's weight
    literals are bit-identical to the engine's driver-side loop. The
    sigmoid / update expressions mirror logreg._fast_sigmoid_x1e6 and
    logreg.delta_w VERBATIM (same parenthesization); edit them
    together."""
    d1 = dims + 1
    dot = (
        "cast(list_sum(list_transform(range(1, {d1}), i -> "
        "q.qvec[i] * w.wvec[i])) as double)"
    ).format(d1=d1 + 1)
    sig = (
        "cast(floor((0.5 + (z / (2.0 * (1.0 + abs(z))))) * 1000000.0 "
        "+ 0.5) as bigint)"
    )
    blocks = [
        f"""
    WITH q AS (
      SELECT vec_id, cast(label as bigint) AS label,
             CASE WHEN cast(label as bigint) = {target}
                  THEN 1 ELSE 0 END AS y,
             list_append(
               list_transform(embedding[1:{dims}], x ->
                 cast(floor(cast(x as double) * 1000000.0 + 0.5)
                      as bigint)),
               1000000) AS qvec
      FROM embeddings
    ),
    w0 AS (SELECT [{", ".join(["0"] * d1)}]::BIGINT[] AS wvec)"""
    ]
    for t in range(1, iters + 1):
        blocks.append(f""",
    s{t} AS (
      SELECT z.y, z.qvec, {sig} AS s
      FROM (SELECT q.y, q.qvec, {dot} / 1000000000000.0 AS z
            FROM q CROSS JOIN w{t - 1} w) z
    ),
    g{t} AS (
      SELECT t.i AS pos,
             sum((s{t}.y * 1000000 - s{t}.s)::hugeint * s{t}.qvec[t.i])
               AS g,
             count(*) AS n
      FROM s{t} CROSS JOIN range(1, {d1 + 1}) t(i)
      GROUP BY t.i
    ),
    w{t} AS (
      SELECT list(
               cast(w.wvec[g.pos]
                    + cast(floor((cast(g.g as double) * {lr_num})
                                 / ((cast(g.n as double) * 1000000.0)
                                    * {lr_den})
                                 + 0.5) as bigint)
                    as bigint)
               ORDER BY g.pos) AS wvec
      FROM g{t} g CROSS JOIN w{t - 1} w
    )"""
        )
    sql = "".join(blocks)
    final = f""",
    fin AS (
      SELECT z.label, cast(z.zdot as bigint) AS dot, {sig} AS s
      FROM (SELECT q.label,
                   list_sum(list_transform(range(1, {d1 + 1}), i ->
                     q.qvec[i] * w.wvec[i])) AS zdot,
                   {dot} / 1000000000000.0 AS z
            FROM q CROSS JOIN w{iters} w) z
    )
    SELECT label, count(*) AS n_vecs,
           cast(sum(CASE WHEN dot >= 0 THEN 1 ELSE 0 END) as bigint)
             AS n_pred_target,
           cast(floor(cast(sum(s::hugeint) as double)
                      / cast(count(*) as double)) as bigint)
             AS avg_score_x1e6
    FROM fin
    GROUP BY label
    ORDER BY label
"""
    return sql + final


@workload(
    "logreg_label_probe",
    _logreg_sql(
        _LOGREG_DIMS,
        _LOGREG_ITERS,
        _LOGREG_TARGET,
        _LOGREG_LR_NUM,
        _LOGREG_LR_DEN,
    ),
    doc="Distributed one-vs-all logistic regression (fast-sigmoid link, "
    f"{_LOGREG_ITERS} full-batch fixed-point gradient steps, "
    f"{_LOGREG_DIMS} dims + bias) probing label {_LOGREG_TARGET}'s "
    "linear separability: per original label, the trained classifier's "
    "positive-call count and mean quantized score. Each step is one "
    "map-only scoring pass (weight literals in codegen — no join) plus "
    "a (dims+1)-group shuffle of map-side partials; driver state is "
    "the weight vector. The oracle unrolls both steps as CTE blocks "
    "and matches bit-for-bit (see operators/logreg.py).",
)
def logreg_label_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.logreg import logreg_label_probe as probe

    e = load_tables(spark, sf_dir)["embeddings"]
    return probe(
        e,
        target_label=_LOGREG_TARGET,
        dims=_LOGREG_DIMS,
        iters=_LOGREG_ITERS,
        lr_num=_LOGREG_LR_NUM,
        lr_den=_LOGREG_LR_DEN,
    )


# ---------------------------------------------------------------------------
# Grouped closed-form OLS (r10) — the regression twin of numeric_corr_matrix
# ---------------------------------------------------------------------------
_OLS_SQL = """
    WITH q AS (
      SELECT l_returnflag,
             cast(floor(l_extendedprice * 100.0 + 0.5) as bigint) AS qy,
             cast(floor(l_quantity * 1.0 + 0.5) as bigint) AS q1,
             cast(floor(l_discount * 100.0 + 0.5) as bigint) AS q2
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL AND l_discount IS NOT NULL
    ),
    m AS (
      SELECT l_returnflag,
             count(*)::hugeint AS n,
             sum(q1::hugeint) AS sx1, sum(q2::hugeint) AS sx2,
             sum(qy::hugeint) AS sy,
             sum((q1*q1)::hugeint) AS s11, sum((q1*q2)::hugeint) AS s12,
             sum((q2*q2)::hugeint) AS s22,
             sum((q1*qy)::hugeint) AS s1y, sum((q2*qy)::hugeint) AS s2y,
             sum((qy*qy)::hugeint) AS syy
      FROM q GROUP BY l_returnflag
    ),
    d AS (
      SELECT l_returnflag,
             cast(n as double) AS n, cast(sx1 as double) AS sx1,
             cast(sx2 as double) AS sx2, cast(sy as double) AS sy,
             cast(s11 as double) AS s11, cast(s12 as double) AS s12,
             cast(s22 as double) AS s22, cast(s1y as double) AS s1y,
             cast(s2y as double) AS s2y, cast(syy as double) AS syy
      FROM m
    ),
    -- the pinned Cramer sequence: mirrors operators/stats.grouped_ols
    -- term for term (edit both together)
    solve AS (
      SELECT l_returnflag, n, sy, s1y, s2y, syy,
             n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)
               + sx2*(sx1*s12 - s11*sx2) AS det,
             sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)
               + sx2*(s1y*s12 - s11*s2y) AS det0,
             n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)
               + sx2*(sx1*s2y - s1y*sx2) AS det1,
             n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)
               + sy*(sx1*s12 - s11*sx2) AS det2
      FROM d
    ),
    beta AS (
      SELECT l_returnflag, n, sy, s1y, s2y, syy, det,
             det0/det AS b0, det1/det AS b1, det2/det AS b2,
             syy - (sy*sy)/n AS ss_tot
      FROM solve
    )
    -- ok mirrors stats.grouped_ols: det <> 0 AND every |b| < 1e12
    -- (near-singular guard — Inf/NaN coefficients NULL in BOTH engines
    -- instead of DuckDB erroring at cast(inf as bigint))
    SELECT l_returnflag,
           cast(n as bigint) AS n_rows,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 THEN
             cast(floor(b0 * 1000000.0 + 0.5) as bigint) END AS b0_x1e6,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 THEN
             cast(floor(b1 * 1000000.0 + 0.5) as bigint) END AS b1_x1e6,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 THEN
             cast(floor(b2 * 1000000.0 + 0.5) as bigint) END AS b2_x1e6,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 AND ss_tot > 0.0
                     AND abs(1.0 - (syy - (b0*sy + b1*s1y + b2*s2y))
                             / ss_tot) < 1e12 THEN
             cast(floor((1.0 - (syy - (b0*sy + b1*s1y + b2*s2y)) / ss_tot)
                        * 1000000.0 + 0.5) as bigint) END AS r2_x1e6
    FROM beta
    ORDER BY l_returnflag
"""


@workload(
    "ols_price_model",
    _OLS_SQL,
    doc="Per-group closed-form OLS (2 features + intercept): regress "
    "cent-quantized l_extendedprice on l_quantity and l_discount per "
    "l_returnflag. Ten exact decimal/HUGEINT normal-equation moments "
    "in ONE grouped aggregation (map-side partials — the shuffle is "
    "|groups| x 10 decimals at any corpus size), then Cramer's rule "
    "in a pinned double sequence both engines evaluate identically; "
    "coefficients and R^2 quantize x1e6. Singular systems yield NULLs "
    "in both engines. The closed-form companion of "
    "logreg_label_probe's iterative family (operators/stats.py).",
)
def ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import grouped_ols

    li = load_tables(spark, sf_dir)["lineitem"]
    return grouped_ols(
        li,
        y_col="l_extendedprice",
        x1_col="l_quantity",
        x2_col="l_discount",
        group_cols=["l_returnflag"],
    )


# ---------------------------------------------------------------------------
# Grouped closed-form RIDGE (r11) — grouped_ols generalized with an L2
# penalty; per-row-scaled lambda (w*n), honest quadratic-form R^2
# ---------------------------------------------------------------------------
_RIDGE_LAM_NUM, _RIDGE_LAM_DEN = 100, 1

_RIDGE_SQL = f"""
    WITH q AS (
      SELECT l_returnflag,
             cast(floor(l_extendedprice * 100.0 + 0.5) as bigint) AS qy,
             cast(floor(l_quantity * 1.0 + 0.5) as bigint) AS q1,
             cast(floor(l_discount * 100.0 + 0.5) as bigint) AS q2
      FROM lineitem
      WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_quantity IS NOT NULL AND l_discount IS NOT NULL
    ),
    m AS (
      SELECT l_returnflag,
             count(*)::hugeint AS n,
             sum(q1::hugeint) AS sx1, sum(q2::hugeint) AS sx2,
             sum(qy::hugeint) AS sy,
             sum((q1*q1)::hugeint) AS s11, sum((q1*q2)::hugeint) AS s12,
             sum((q2*q2)::hugeint) AS s22,
             sum((q1*qy)::hugeint) AS s1y, sum((q2*qy)::hugeint) AS s2y,
             sum((qy*qy)::hugeint) AS syy
      FROM q GROUP BY l_returnflag
    ),
    d AS (
      SELECT l_returnflag,
             cast(n as double) AS n, cast(sx1 as double) AS sx1,
             cast(sx2 as double) AS sx2, cast(sy as double) AS sy,
             cast(s11 as double) AS s11, cast(s12 as double) AS s12,
             cast(s22 as double) AS s22, cast(s1y as double) AS s1y,
             cast(s2y as double) AS s2y, cast(syy as double) AS syy
      FROM m
    ),
    -- ridge diagonal: t11/t22 = s11/s22 + w*n with w one pinned
    -- division — mirrors operators/stats.grouped_ridge term for term
    -- (edit both together)
    rd AS (
      SELECT *,
             s11 + (cast({_RIDGE_LAM_NUM} as double)
                    / cast({_RIDGE_LAM_DEN} as double)) * n AS t11,
             s22 + (cast({_RIDGE_LAM_NUM} as double)
                    / cast({_RIDGE_LAM_DEN} as double)) * n AS t22
      FROM d
    ),
    solve AS (
      SELECT l_returnflag, n, sx1, sx2, sy, s11, s12, s22, s1y, s2y, syy,
             n*(t11*t22 - s12*s12) - sx1*(sx1*t22 - s12*sx2)
               + sx2*(sx1*s12 - t11*sx2) AS det,
             sy*(t11*t22 - s12*s12) - sx1*(s1y*t22 - s12*s2y)
               + sx2*(s1y*s12 - t11*s2y) AS det0,
             n*(s1y*t22 - s12*s2y) - sy*(sx1*t22 - s12*sx2)
               + sx2*(sx1*s2y - s1y*sx2) AS det1,
             n*(t11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)
               + sy*(sx1*s12 - t11*sx2) AS det2
      FROM rd
    ),
    beta AS (
      SELECT l_returnflag, n, sx1, sx2, sy, s11, s12, s22, s1y, s2y, syy,
             det,
             det0/det AS b0, det1/det AS b1, det2/det AS b2,
             syy - (sy*sy)/n AS ss_tot
      FROM solve
    ),
    fit AS (
      SELECT *,
             -- honest ridge residual: syy - 2*b'X'y + b'X'Xb with the
             -- RAW (unpenalized) moments
             syy - 2.0*(b0*sy + b1*s1y + b2*s2y)
                 + (b0*b0*n + b1*b1*s11 + b2*b2*s22
                    + 2.0*b0*b1*sx1 + 2.0*b0*b2*sx2 + 2.0*b1*b2*s12)
               AS ss_res
      FROM beta
    )
    SELECT l_returnflag,
           cast(n as bigint) AS n_rows,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 THEN
             cast(floor(b0 * 1000000.0 + 0.5) as bigint) END AS b0_x1e6,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 THEN
             cast(floor(b1 * 1000000.0 + 0.5) as bigint) END AS b1_x1e6,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 THEN
             cast(floor(b2 * 1000000.0 + 0.5) as bigint) END AS b2_x1e6,
           CASE WHEN det <> 0.0 AND abs(b0) < 1e12 AND abs(b1) < 1e12
                     AND abs(b2) < 1e12 AND ss_tot > 0.0
                     AND abs(1.0 - ss_res / ss_tot) < 1e12 THEN
             cast(floor((1.0 - ss_res / ss_tot)
                        * 1000000.0 + 0.5) as bigint) END AS r2_x1e6
    FROM fit
    ORDER BY l_returnflag
"""


@workload(
    "ridge_price_model",
    _RIDGE_SQL,
    doc="Per-group closed-form RIDGE regression (price ~ quantity + "
    "discount per return flag): the grouped_ols moments with the L2 "
    "penalty w*n added to the feature diagonal (per-row-scaled lambda, "
    "so shrinkage strength is invariant from sf0.001 to 100 TB) and "
    "R^2 from the honest quadratic form (the OLS shortcut assumes the "
    "normal equations hold at b, which a penalized solution violates). "
    "One grouped aggregation carries all ten decimal(38,0) moments; "
    "the solve is a pinned double sequence mirrored verbatim by the "
    "oracle. Exactly-collinear features -> finite coefficients "
    "(positive-definite ridge matrix), unlike OLS's NULLs "
    "(operators/stats.py grouped_ridge).",
)
def ridge_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import grouped_ridge

    li = load_tables(spark, sf_dir)["lineitem"]
    return grouped_ridge(
        li,
        y_col="l_extendedprice",
        x1_col="l_quantity",
        x2_col="l_discount",
        group_cols=["l_returnflag"],
        lam_num=_RIDGE_LAM_NUM,
        lam_den=_RIDGE_LAM_DEN,
    )
