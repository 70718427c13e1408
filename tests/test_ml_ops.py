"""Tests for operators/clustering.py and operators/classify.py —
determinism, partitioning-invariance, bounds, and edge semantics the
DuckDB oracles can't see (error paths, self-exclusion internals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lealone_spark.operators.classify import (
    nb_class_confusion,
    tfidf_doc_keywords,
)
from etl_lealone_spark.operators.clustering import (
    MAX_K,
    kmeans_cluster_profile,
    knn_label_vote,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _has_tokens():
    # the kernel's own emptiness predicate: a doc counts only if the
    # normalized tokenizer yields at least one [a-z0-9] token ('!!!' is
    # non-blank but token-free)
    return F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")) != ""


def test_kmeans_partitioning_invariant(spark, tables):
    e = tables["embeddings"]
    a = kmeans_cluster_profile(e, k=4, iters=2)
    b = kmeans_cluster_profile(e.repartition(13, "label"), k=4, iters=2)
    assert _rows(a) == _rows(b)


def test_kmeans_profile_accounts_every_vector(spark, tables):
    e = tables["embeddings"]
    prof = kmeans_cluster_profile(e, k=4, iters=2).collect()
    assert sum(r["n_vecs"] for r in prof) == e.count()
    n = e.count()
    assert sum(r["sum_vec_id"] for r in prof) == n * (n - 1) // 2
    for r in prof:
        assert 0 <= r["cluster_id"] < 4
        assert r["inertia"] >= 0
        assert 0 < r["purity_x1e6"] <= 1_000_000
        assert 0 <= r["majority_label"] <= 9


def test_kmeans_more_iters_never_raises_inertia(spark, tables):
    # Lloyd's is monotone non-increasing in its objective EXCEPT for the
    # floor-requantization of means (±0.5 per component). Allow that
    # bounded slack: n_vecs * dim * 1 distance unit is far below 1e-6 of
    # the objective at this scale.
    e = tables["embeddings"]
    i2 = sum(
        r["inertia"] for r in kmeans_cluster_profile(e, k=4, iters=2).collect()
    )
    i3 = sum(
        r["inertia"] for r in kmeans_cluster_profile(e, k=4, iters=3).collect()
    )
    assert i3 <= i2 * 1.000001 + e.count() * 64


def test_kmeans_k_bound_and_seed_shortage(spark, tables):
    e = tables["embeddings"]
    with pytest.raises(ValueError, match="MAX_K"):
        kmeans_cluster_profile(e, k=MAX_K + 1)
    with pytest.raises(ValueError, match="seed"):
        kmeans_cluster_profile(e.filter(F.col("vec_id") >= 4), k=8)


def test_knn_excludes_self_and_votes_bounded(spark, tables):
    e = tables["embeddings"]
    out = knn_label_vote(e, k=5, n_queries=8).collect()
    assert len(out) == 8
    for r in out:
        # votes are over exactly k=5 neighbours; majority is in (k/2, k]
        assert 1 <= r["votes"] <= 5
        assert 0 <= r["pred_label"] <= 9
        assert 0 <= r["true_label"] <= 9


def test_knn_partitioning_invariant(spark, tables):
    e = tables["embeddings"]
    a = knn_label_vote(e, k=5, n_queries=8)
    b = knn_label_vote(e.repartition(17), k=5, n_queries=8)
    assert _rows(a) == _rows(b)


def test_knn_self_label_wins_on_duplicated_vector(spark):
    # Build 12 copies of the SAME vector with label 7 plus distant noise:
    # every query's neighbourhood is the duplicate set, so the vote must
    # be unanimous label 7 — and the self-row must NOT be among the 5
    # votes (k=5 of 11 other duplicates).
    rows = [(i, [1.0, 0.0, 0.0, 0.0], 7) for i in range(12)]
    rows += [(100 + i, [-1.0, 0.5 * i, 1.0, 0.0], i % 3) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_label_vote(df, k=5, n_queries=3).collect()
    assert len(out) == 3
    for r in out:
        assert r["pred_label"] == 7 and r["votes"] == 5


def test_tfidf_scores_monotone_in_df(spark):
    # 'rare' appears in 1 of 4 docs; 'common' in all 4. With equal tf,
    # the rare term must outscore the common one in the doc holding both.
    docs = spark.createDataFrame(
        [
            (0, "rare common alpha"),
            (1, "common beta beta"),
            (2, "common gamma"),
            (3, "common delta"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_doc_keywords(docs, n_docs=1, top=3).collect()
    scores = {r["term"]: r["score_x1e6"] for r in out}
    assert scores["rare"] > scores["common"]
    assert all(r["tf"] == 1 for r in out)


def test_tfidf_partitioning_invariant(spark, tables):
    d = tables["documents"]
    a = tfidf_doc_keywords(d, n_docs=5, top=5)
    b = tfidf_doc_keywords(d.repartition(19, "source"), n_docs=5, top=5)
    assert _rows(a) == _rows(b)


def test_nb_confusion_counts_every_test_doc_with_tokens(spark, tables):
    d = tables["documents"]
    conf = nb_class_confusion(d, class_col="lang").collect()
    n_test = d.filter(
        (F.col("doc_id") % 2 == 1) & _has_tokens()
    ).count()
    assert sum(r["n_docs"] for r in conf) == n_test
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    for r in conf:
        assert r["true_class"] in langs and r["pred_class"] in langs


def test_nb_separable_classes_classify_perfectly(spark):
    # Two classes with disjoint vocabularies — NB must get every test
    # doc right regardless of priors.
    rows = []
    for i in range(40):
        cls = "aa" if i % 4 < 2 else "bb"
        word = "apple banana" if cls == "aa" else "zebra quartz"
        rows.append((i, f"{word} {word}", cls))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    conf = {
        (r["true_class"], r["pred_class"]): r["n_docs"]
        for r in nb_class_confusion(d, class_col="lang").collect()
    }
    assert conf == {("aa", "aa"): 10, ("bb", "bb"): 10}


def test_nb_partitioning_invariant(spark, tables):
    d = tables["documents"]
    a = nb_class_confusion(d, class_col="lang")
    b = nb_class_confusion(d.repartition(23, "doc_id"), class_col="lang")
    assert _rows(a) == _rows(b)


def test_corr_matrix_known_values(spark):
    from etl_lealone_spark.operators.stats import exact_corr_matrix

    # y = 2x (r=1), z = -x (r=-1), w uncorrelated-ish constant+noise
    rows = [(float(i), 2.0 * i, -1.0 * i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["col_a"], r["col_b"]): r["corr_x1e6"]
        for r in exact_corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert out[("x", "y")] == 1_000_000
    assert out[("x", "z")] == -1_000_000
    assert out[("y", "z")] == -1_000_000


def test_corr_matrix_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.stats import exact_corr_matrix

    cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    li = tables["lineitem"]
    a = exact_corr_matrix(li, cols)
    b = exact_corr_matrix(li.repartition(29, "l_orderkey"), cols)
    assert _rows(a) == _rows(b)


def test_corr_matrix_bounds_and_nulls(spark, tables):
    from etl_lealone_spark.operators.stats import exact_corr_matrix

    cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    li = tables["lineitem"]
    out = exact_corr_matrix(li, cols).collect()
    assert len(out) == 6
    for r in out:
        assert -1_000_000 <= r["corr_x1e6"] <= 1_000_000
        assert r["col_a"] < r["col_b"]
    # nulls are dropped listwise: null-ing one column shrinks n_rows
    li2 = li.withColumn(
        "l_tax",
        F.when(F.col("l_orderkey") % 100 == 0, None).otherwise(F.col("l_tax")),
    )
    out2 = exact_corr_matrix(li2, cols).collect()
    assert out2[0]["n_rows"] < out[0]["n_rows"]


def test_chi2_separable_vocab_tops_the_ranking(spark):
    from etl_lealone_spark.operators.classify import chi2_top_terms

    # class-pure tokens must dominate; a class-neutral token must not
    # appear in the top rows
    rows = []
    for i in range(60):
        cls = "aa" if i % 2 == 0 else "bb"
        pure = "applepure" if cls == "aa" else "zebrapure"
        rows.append((i, f"{pure} neutraltok", cls))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_top_terms(d, class_col="lang", top=4).collect()
    assert len(out) == 4
    # top-2: the two class-pure tokens, one (class, bucket) row each,
    # equal maximal chi2; then the class-neutral token at chi2 = 0
    assert out[0]["chi2_x1e3"] == out[1]["chi2_x1e3"] > 0
    assert out[2]["chi2_x1e3"] == out[3]["chi2_x1e3"] == 0
    assert {out[0]["cls"], out[1]["cls"]} == {"aa", "bb"}


def test_chi2_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.classify import chi2_top_terms

    d = tables["documents"]
    a = chi2_top_terms(d, class_col="lang", top=10)
    b = chi2_top_terms(d.repartition(21, "source"), class_col="lang", top=10)
    assert _rows(a) == _rows(b)


def test_power_iteration_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.stats import power_iteration_projection

    e = tables["embeddings"]
    a = power_iteration_projection(e, iters=2)
    b = power_iteration_projection(e.repartition(11, "vec_id"), iters=2)
    assert _rows(a) == _rows(b)


def test_power_iteration_finds_planted_direction(spark):
    # Plant variance along axis 0 (values +-big), noise-free elsewhere:
    # the final projection must separate the two label groups with a
    # margin, and account for every vector.
    rows = []
    for i in range(40):
        sign = 1.0 if i % 2 == 0 else -1.0
        vec = [sign * 0.5] + [0.001 * (i % 5)] * 7
        rows.append((i, vec, 0 if sign > 0 else 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from etl_lealone_spark.operators.stats import power_iteration_projection

    out = {r["label"]: r for r in power_iteration_projection(df, iters=3).collect()}
    assert out[0]["n_vecs"] == 20 and out[1]["n_vecs"] == 20
    # the two groups sit on opposite sides of the centered projection
    assert (out[0]["min_proj"] > 0) != (out[1]["min_proj"] > 0)
    assert out[0]["max_proj"] != out[1]["max_proj"]


def test_power_iteration_zero_matvec_raises(spark):
    from etl_lealone_spark.operators.stats import power_iteration_projection

    # all-identical vectors center to exact zeros -> zero matvec
    rows = [(i, [0.25, 0.25, 0.25, 0.25], 0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with pytest.raises(ValueError, match="zero matvec"):
        power_iteration_projection(df, iters=1)


def test_separation_audit_accounts_and_orders(spark, tables):
    from etl_lealone_spark.operators.clustering import kmeans_separation_audit

    e = tables["embeddings"]
    out = kmeans_separation_audit(e, k=4, iters=2).collect()
    assert sum(r["n_vecs"] for r in out) == e.count()
    for r in out:
        # second-nearest is never closer than nearest
        assert r["sum_d2"] >= r["sum_d1"] >= 0
        assert r["separation_x1e6"] is None or r["separation_x1e6"] >= 1_000_000


def test_separation_audit_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.clustering import kmeans_separation_audit

    e = tables["embeddings"]
    a = kmeans_separation_audit(e, k=4, iters=2)
    b = kmeans_separation_audit(e.repartition(9, "vec_id"), k=4, iters=2)
    assert _rows(a) == _rows(b)


def test_separation_audit_zero_variance_cluster_is_null(spark):
    from etl_lealone_spark.operators.clustering import kmeans_separation_audit

    # two point-masses at distant corners, one seed (vec_id < 2) in
    # each: after the update every member sits exactly ON its centroid,
    # so sum_d1 = 0 and the separation ratio must be NULL, not a
    # division error
    df = spark.createDataFrame(
        [(0, [10.0, 10.0], 0), (1, [-10.0, -10.0], 1)]
        + [(i, [10.0, 10.0], 0) for i in range(2, 7)]
        + [(i, [-10.0, -10.0], 1) for i in range(7, 12)],
        "vec_id long, embedding array<float>, label int",
    )
    out = kmeans_separation_audit(df, k=2, iters=2).collect()
    assert len(out) == 2
    for r in out:
        assert r["sum_d1"] == 0 and r["separation_x1e6"] is None
        assert r["sum_d2"] > 0


def test_kmeans_empty_cluster_drops_out_like_the_oracle(spark):
    # seeds 0 and 1 are IDENTICAL points: every vector assigns to cid 0
    # (lowest-cid tie-break), cluster 1 receives no members and must
    # DROP OUT of the centroid set (the oracle's means CTE loses the
    # group) — the profile then reports a single cluster, not a phantom
    # zero-centroid one.
    rows = [(0, [1.0, 1.0], 0), (1, [1.0, 1.0], 1)]
    rows += [(i, [1.0 + 0.01 * i, 1.0], i % 3) for i in range(2, 20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    prof = kmeans_cluster_profile(df, k=2, iters=2).collect()
    assert [r["cluster_id"] for r in prof] == [0]
    assert prof[0]["n_vecs"] == 20
    # and the audit refuses to rank a second-nearest that does not exist
    from etl_lealone_spark.operators.clustering import kmeans_separation_audit

    with pytest.raises(ValueError, match="surviving centroids"):
        kmeans_separation_audit(df, k=2, iters=2)


def test_corr_matrix_constant_column_is_null(spark):
    from etl_lealone_spark.operators.stats import exact_corr_matrix

    rows = [(float(i), 2.0 * i, 7.0) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["col_a"], r["col_b"]): r["corr_x1e6"]
        for r in exact_corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert out[("x", "y")] == 1_000_000
    assert out[("x", "z")] is None and out[("y", "z")] is None


def test_classify_text_col_is_honored(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", "IGNORED"), (1, "alpha gamma", "IGNORED")],
        "doc_id long, body string, text string",
    )
    out = tfidf_doc_keywords(docs, n_docs=2, top=5, text_col="body").collect()
    terms = {r["term"] for r in out}
    assert "alpha" in terms and "ignored" not in terms


def test_nb_auc_separable_is_perfect_and_single_class_is_null(spark):
    from etl_lealone_spark.operators.classify import nb_binary_auc

    rows = []
    for i in range(40):
        cls = "en" if i % 4 < 2 else "xx"
        word = "engword english" if cls == "en" else "zzq yyx"
        rows.append((i, f"{word} {word}", cls))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = nb_binary_auc(d, positive_class="en").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (10, 10)
    assert r["auc_x1e6"] == 1_000_000
    # scoring the class the test split never contains as positive
    only = d.filter(F.col("lang") == "en")
    r2 = nb_binary_auc(only, positive_class="xx").collect()[0]
    assert r2["n_pos"] == 0 and r2["auc_x1e6"] is None


def test_nb_auc_all_ties_is_half(spark):
    from etl_lealone_spark.operators.classify import nb_binary_auc

    # identical text everywhere: every test doc gets the SAME 'en'
    # score, so AUC must be exactly 0.5 (all mass in the tie term)
    rows = [(i, "same same same", "en" if i % 4 < 2 else "xx") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = nb_binary_auc(d, positive_class="en").collect()[0]
    assert r["auc_x1e6"] == 500_000


def test_nb_calibration_accounts_and_bounds(spark, tables):
    from etl_lealone_spark.operators.classify import nb_calibration_deciles

    d = tables["documents"]
    out = nb_calibration_deciles(d, positive_class="en").collect()
    n_test = d.filter(
        (F.col("doc_id") % 2 == 1) & _has_tokens()
    ).count()
    assert sum(r["n_docs"] for r in out) == n_test
    for r in out:
        assert 0 <= r["decile"] <= 9
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert 0 <= r["pos_rate_x1e6"] <= 1_000_000


def test_nb_auc_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.classify import nb_binary_auc

    d = tables["documents"]
    a = nb_binary_auc(d, positive_class="en")
    b = nb_binary_auc(d.repartition(27, "source"), positive_class="en")
    assert _rows(a) == _rows(b)


def test_kmeans_iterations_are_not_vacuous(spark, tables):
    # the unrolled oracle CTEs must be load-bearing: one Lloyd update
    # actually moves the centroids on the fixture, so an oracle that
    # ignored iteration depth would hash-mismatch
    e = tables["embeddings"]
    p1 = _rows(kmeans_cluster_profile(e, k=8, iters=1))
    p2 = _rows(kmeans_cluster_profile(e, k=8, iters=2))
    assert p1 != p2


def test_auc_bin_resolution_is_not_vacuous(spark, tables):
    from etl_lealone_spark.operators.classify import nb_binary_auc

    d = tables["documents"]
    fine = nb_binary_auc(d, n_bins=4096).collect()[0]["auc_x1e6"]
    coarse = nb_binary_auc(d, n_bins=10).collect()[0]["auc_x1e6"]
    # binning collapses resolution — the two must differ on real data,
    # and both stay in [0, 1e6]
    assert fine != coarse
    assert 0 <= coarse <= 1_000_000 and 0 <= fine <= 1_000_000


# ---------------------------------------------------------------------------
# logistic regression (operators/logreg.py)
# ---------------------------------------------------------------------------
def test_logreg_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.logreg import logreg_label_probe

    e = tables["embeddings"]
    a = _rows(logreg_label_probe(e.coalesce(1), target_label=0))
    b = _rows(logreg_label_probe(e.repartition(7), target_label=0))
    assert a == b and len(a) > 0


def test_logreg_iterations_are_not_vacuous(spark, tables):
    # each unrolled oracle CTE block must be load-bearing: one more
    # gradient step moves the per-label scores on the fixture
    from etl_lealone_spark.operators.logreg import logreg_label_probe

    e = tables["embeddings"]
    p1 = _rows(logreg_label_probe(e, target_label=0, iters=1))
    p2 = _rows(logreg_label_probe(e, target_label=0, iters=2))
    assert p1 != p2


def test_logreg_bounds_and_empty(spark, tables):
    from etl_lealone_spark.operators.logreg import (
        MAX_DIMS,
        logreg_train,
    )

    e = tables["embeddings"]
    with pytest.raises(ValueError, match="MAX_DIMS"):
        logreg_train(e, target_label=0, dims=MAX_DIMS + 1)
    with pytest.raises(ValueError, match="iters"):
        logreg_train(e, target_label=0, iters=0)
    with pytest.raises(ValueError, match="empty"):
        logreg_train(e.filter(F.col("vec_id") < 0), target_label=0)


def test_logreg_probe_accounts_every_vector(spark, tables):
    from etl_lealone_spark.operators.logreg import logreg_label_probe

    e = tables["embeddings"]
    rows = logreg_label_probe(e, target_label=0).collect()
    assert sum(r["n_vecs"] for r in rows) == e.count()
    for r in rows:
        assert 0 <= r["n_pred_target"] <= r["n_vecs"]
        assert 0 <= r["avg_score_x1e6"] <= 1_000_000


# ---------------------------------------------------------------------------
# grouped OLS (operators/stats.grouped_ols)
# ---------------------------------------------------------------------------
def test_ols_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.stats import grouped_ols

    li = tables["lineitem"]
    kw = dict(
        y_col="l_extendedprice", x1_col="l_quantity",
        x2_col="l_discount", group_cols=["l_returnflag"],
    )
    a = _rows(grouped_ols(li.coalesce(1), **kw))
    b = _rows(grouped_ols(li.repartition(7), **kw))
    assert a == b and len(a) > 0


def test_ols_singular_system_yields_nulls(spark):
    # x2 exactly collinear with x1 -> Cramer det is exactly 0.0 in the
    # pinned arithmetic -> NULL coefficients, never Inf/NaN
    from etl_lealone_spark.operators.stats import grouped_ols

    rows = [(0, float(i), float(i), float(i)) for i in range(1, 9)]
    out = grouped_ols(
        spark.createDataFrame(rows, "g int, y double, x1 double, x2 double"),
        y_col="y", x1_col="x1", x2_col="x2", group_cols=["g"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 8
    assert r["b0_x1e6"] is None and r["b1_x1e6"] is None
    assert r["b2_x1e6"] is None and r["r2_x1e6"] is None


def test_ols_near_singular_yields_nulls(spark):
    # EXACTLY collinear features (q2 = q1 + 13) whose moments exceed
    # 2^53: the exact-integer det is 0, but each decimal moment rounds
    # independently at the double cast, so the pinned Cramer sequence
    # leaves a tiny-but-NONZERO residue det (-1.6e15 against ~1e35-scale
    # products) and the solved b0 is a garbage 3.5e12 — past the
    # |b| < 1e12 sanity bound, so every output NULLs in BOTH engines
    # instead of DuckDB erroring at cast(3.5e18 as bigint)
    # (r10 advisor finding). All quantized products fit bigint: this is
    # inside the operator's input contract, unlike an Inf from overflow.
    from etl_lealone_spark.operators.stats import grouped_ols

    rows = []
    for i in range(1, 8):
        q1 = 7.0e8 + i * i * 1.0e4 + i * 31
        rows.append((0, float(i * 997 + i % 3), q1, (q1 + 13) / 100.0))
    out = grouped_ols(
        spark.createDataFrame(rows, "g int, y double, x1 double, x2 double"),
        y_col="y", x1_col="x1", x2_col="x2", group_cols=["g"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 7
    assert r["b0_x1e6"] is None and r["b1_x1e6"] is None
    assert r["b2_x1e6"] is None and r["r2_x1e6"] is None


def test_logreg_null_label_raises(spark, tables):
    # a NULL label would drop out of the gradient numerator but still
    # count in n, while the oracle's CASE maps it to y = 0 — enforced
    # precondition, typed error (r10 advisor finding)
    from etl_lealone_spark.operators.logreg import logreg_train

    e = tables["embeddings"].withColumn(
        "label",
        F.when(F.col("vec_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("label")
        ),
    )
    with pytest.raises(ValueError, match="NULL label"):
        logreg_train(e, target_label=0)


def test_ols_recovers_exact_linear_relation(spark):
    # y = 3 + 2*x1 - 0.5*x2 exactly (in quantized units: qy values are
    # exact cents) -> R^2 must be exactly 1e6 and coefficients match
    # the generating model in quantized space
    from etl_lealone_spark.operators.stats import grouped_ols

    rows = []
    for i in range(1, 13):
        # x2 in 0.02 steps so 0.5*x2 is a whole cent — the relation
        # stays EXACT after cent quantization (odd half-cents would
        # round and break R^2 = 1)
        x1, x2 = float(i), 2.0 * float((i * 7) % 5) / 100.0
        y = 3.0 + 2.0 * x1 - 0.5 * x2
        rows.append((0, y, x1, x2))
    out = grouped_ols(
        spark.createDataFrame(rows, "g int, y double, x1 double, x2 double"),
        y_col="y", x1_col="x1", x2_col="x2", group_cols=["g"],
    ).collect()[0]
    # quantized-unit space: qy(cents) = 300 + 200*q1 - 0.5*q2
    assert out["r2_x1e6"] == 1_000_000
    assert out["b0_x1e6"] == 300 * 1_000_000
    assert out["b1_x1e6"] == 200 * 1_000_000
    assert out["b2_x1e6"] == -500_000


# ---------------------------------------------------------------------------
# grouped ridge (operators/stats.grouped_ridge, r11)
# ---------------------------------------------------------------------------
def test_ridge_partitioning_invariant(spark, tables):
    from etl_lealone_spark.operators.stats import grouped_ridge

    li = tables["lineitem"]
    kw = dict(
        y_col="l_extendedprice", x1_col="l_quantity",
        x2_col="l_discount", group_cols=["l_returnflag"],
    )
    a = _rows(grouped_ridge(li.coalesce(1), **kw))
    b = _rows(grouped_ridge(li.repartition(7), **kw))
    assert a == b and len(a) > 0


def test_ridge_lam_zero_matches_ols_coefficients(spark, tables):
    # w = 0 -> t11 = s11 + 0.0*n, bit-identical for the nonnegative
    # moments here, so the Cramer solve IS the OLS solve. (R^2 differs
    # by construction: ridge evaluates the honest quadratic form, OLS
    # the normal-equation shortcut — algebraically equal at the OLS
    # optimum but not the same IEEE sequence.)
    from etl_lealone_spark.operators.stats import grouped_ols, grouped_ridge

    li = tables["lineitem"]
    kw = dict(
        y_col="l_extendedprice", x1_col="l_quantity",
        x2_col="l_discount", group_cols=["l_returnflag"],
    )
    ols = {r["l_returnflag"]: r for r in grouped_ols(li, **kw).collect()}
    rdg = {
        r["l_returnflag"]: r
        for r in grouped_ridge(li, lam_num=0, lam_den=1, **kw).collect()
    }
    assert set(ols) == set(rdg) and len(ols) > 0
    for g in ols:
        for c in ("n_rows", "b0_x1e6", "b1_x1e6", "b2_x1e6"):
            assert ols[g][c] == rdg[g][c], (g, c)


def test_ridge_shrinks_and_differs_from_ols(spark, tables):
    # non-vacuity: the workload's lambda actually moves the estimates
    from etl_lealone_spark.operators.stats import grouped_ols, grouped_ridge

    li = tables["lineitem"]
    kw = dict(
        y_col="l_extendedprice", x1_col="l_quantity",
        x2_col="l_discount", group_cols=["l_returnflag"],
    )
    ols = _rows(grouped_ols(li, **kw))
    rdg = _rows(grouped_ridge(li, lam_num=100, lam_den=1, **kw))
    assert ols != rdg


def test_ridge_solves_exactly_collinear_system(spark):
    # the whole point of the penalty: q2 = 100*q1 exactly (OLS det = 0
    # -> NULLs), but the ridge matrix is positive definite for any
    # w > 0, so coefficients are finite and defined in both engines
    from etl_lealone_spark.operators.stats import grouped_ols, grouped_ridge

    rows = [(0, 3.0 + 2.0 * i, float(i), float(i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "g int, y double, x1 double, x2 double")
    kw = dict(y_col="y", x1_col="x1", x2_col="x2", group_cols=["g"])
    o = grouped_ols(df, **kw).collect()[0]
    assert o["b1_x1e6"] is None  # singular under OLS
    r = grouped_ridge(df, lam_num=1, lam_den=1, **kw).collect()[0]
    assert r["n_rows"] == 8
    for c in ("b0_x1e6", "b1_x1e6", "b2_x1e6", "r2_x1e6"):
        assert r[c] is not None, c
    # under an equal penalty the weight concentrates on the larger-scale
    # feature in proportion to scale: q2 = 100*q1 -> b2 = 100*b1 exactly
    # (numpy replay: b = [300.017, 0.0199976, 1.99976]); and the
    # effective slope b1 + 100*b2 stays ~200 qy-units per q1 (the
    # generating 2.0 y-per-x in quantized space) minus the small shrink
    assert abs(r["b2_x1e6"] - 100 * r["b1_x1e6"]) <= 100
    eff = r["b1_x1e6"] + 100 * r["b2_x1e6"]
    assert abs(eff - 200_000_000) <= 100_000


def test_argmin_expr_string_matches_column_built_reference(spark, tables):
    # the argmin is built as ONE JVM-parsed SQL string (BENCHLOG.md r11
    # addendum: Column-by-Column literal construction costs 1.1-1.6s of
    # py4j roundtrips per expression); this pins the string form to a
    # Column-built reference bit-for-bit so future edits to the SQL
    # text can't drift the semantics
    from etl_lealone_spark.operators.clustering import (
        _argmin_assignment,
        _prepare,
        _seed_centroids,
    )

    q = _prepare(tables["embeddings"], "vec_id", "embedding", "label")
    cents = _seed_centroids(q, 5)

    def column_reference(vec, centroids):
        def dist(c):
            lit_vec = F.array(*[F.lit(int(x)).cast("bigint") for x in c])
            return F.aggregate(
                F.zip_with(vec, lit_vec, lambda x, cc: (x - cc) * (x - cc)),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
        return F.array_min(
            F.array(
                *[
                    F.struct(
                        dist(c).alias("dist"),
                        F.lit(int(cid)).cast("bigint").alias("cid"),
                    )
                    for cid, c in centroids
                ]
            )
        )

    a = _rows(q.select("vec_id", _argmin_assignment("qvec", cents).alias("b"))
              .select("vec_id", "b.dist", "b.cid"))
    b = _rows(q.select("vec_id", column_reference(F.col("qvec"), cents).alias("b"))
              .select("vec_id", "b.dist", "b.cid"))
    assert a == b and len(a) > 0
