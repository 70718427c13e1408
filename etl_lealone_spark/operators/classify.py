"""Text classification / relevance operators — TF-IDF keyword
extraction and a multinomial naive-Bayes corpus classifier.

Why these exist in a training-data engine: the standard corpus-curation
classifiers (CCNet's LM filter, fastText language-ID, quality/domain
classifiers a la Brown et al. 2020 appendix A) are all bag-of-words
linear models — training them IS counting, which is exactly what a
distributed engine is good at. TF-IDF keywords are the per-document
relevance profile every dataset card and search index wants.

Reference parity: the reference engine (sevenfang/etl-Lealone) has
full-text helpers but no corpus statistics; this extends the text
surface the way operators/textops.py does (SURVEY.md §2 extensions).
Semantics are the public classics: multinomial NB for text (McCallum &
Nigam 1998), the feature-hashing trick (Weinberger et al. 2009), chi2
feature selection (Yang & Pedersen 1997), and smoothed TF-IDF
(Sparck Jones 1972; the +1 idf form sklearn documents).

Scale shapes:

- **TF-IDF**: document frequency is ONE vocabulary-sized aggregation
  over the token stream (map-side partials); term frequency is computed
  only for the target documents (predicate pushed to the scan); the
  vocabulary-sized idf table broadcasts back onto the bounded tf side.
  No raw-text shuffle.
- **Naive Bayes**: tokens hash into a fixed bucket space (the hashing
  trick — vocabulary becomes a constant), so the entire trained model
  is |classes| × buckets rows. Training is one aggregation over the
  training split; scoring joins the broadcast model onto the test token
  stream and sums per (doc, class) — map-side combinable. The
  cross-join that fans each test token out to |classes| candidates is a
  bounded broadcast (|classes| rows).
- **Determinism**: every log-probability is fixed-point quantized
  (floor(ln(...)·1e6 + 0.5) as bigint — the unigram_logprob discipline,
  operators/textops.py:338) so per-document scores are exact integer
  sums: associative, partitioning-proof, engine-portable. Argmax ties
  break on the class name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import words

SCALE = 1_000_000
MAX_CLASSES = 64  # broadcast-model guard: |classes| x buckets rows
_DEC = "decimal(38,0)"  # exact wide sums (AUC pair mass at corpus scale)


def _fp(col: Column) -> Column:
    """floor(x*1e6 + 0.5) as bigint — the fixed-point quantizer."""
    return F.floor(col * float(SCALE) + F.lit(0.5)).cast("bigint")


def _tokens(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    # repartition BEFORE the tokenize explode (r12, guide §2.5 input
    # skew): a single parquet split otherwise runs the whole
    # explode+hash pass in ONE task (the dedup kernels'
    # _parallelize_for_compute rationale — measured there 12s vs <1s at
    # sf0.1). At cluster scale the input arrives as many splits and
    # this is a cheap keyed rebalance.
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n, *id_cols[:1])
        .select(*id_cols, F.explode(words(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
    )


def tfidf_doc_keywords(
    docs: DataFrame,
    n_docs: int = 10,
    top: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top`` TF-IDF keywords for documents with id < ``n_docs``.

    idf = ln((N+1)/(df+1)) + 1 (the smoothed sklearn form), fixed-point
    quantized; score = tf · idf_x1e6 (exact bigint). df/N come from the
    FULL corpus; tf only from the bounded target docs. Returns
    (doc_id, term, tf, score_x1e6), top terms per doc, ties on term.
    """
    tok_all = _tokens(docs, [id_col], text_col)
    n_total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    df_tbl = (
        tok_all.groupBy("w")
        .agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "w",
            _fp(
                F.log(
                    (F.col("n_total") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                )
                + F.lit(1.0)
            ).alias("idf_x1e6"),
        )
    )
    tf = (
        _tokens(docs.filter(F.col(id_col) < n_docs), [id_col], text_col)
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = tf.join(df_tbl, "w").select(
        F.col(id_col).alias("doc_id"),
        F.col("w").alias("term"),
        "tf",
        (F.col("tf") * F.col("idf_x1e6")).alias("score_x1e6"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_x1e6"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top)
        .select("doc_id", "term", "tf", "score_x1e6")
        .orderBy("doc_id", F.desc("score_x1e6"), "term")
    )


def _bucket(col: Column, buckets: int) -> Column:
    """md5-hash a token into a fixed bucket space (the hashing trick;
    identical to textops.unigram_logprob's bucketing so the oracle
    mirror is the proven one)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % buckets
    )


def chi2_top_terms(
    docs: DataFrame,
    class_col: str = "lang",
    buckets: int = 4096,
    top: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chi-squared feature selection over hashed token buckets — the
    standard pick-the-discriminative-vocabulary step before training a
    bag-of-words corpus classifier (and the statistical twin of PMI
    collocation mining in textops.bigram_pmi).

    Per (class, bucket), the 2x2 token-occurrence contingency is
      a = tokens of this class in this bucket     b = n_class - a
      c = tokens of other classes in this bucket  d = n_other - c
    and chi2 = N*(a*d - b*c)^2 / ((a+b)*(c+d)*(a+c)*(b+d)).

    Counts are exact bigints; the products move to double BEFORE
    multiplying (a*d at 100 TB token counts overflows int64) in one
    fixed op sequence, then fixed-point quantize — the engine-portable
    discipline. Returns the ``top`` (class, bucket, chi2_x1e3) rows by
    chi2 descending, ties on (class, bucket).

    Scale shape: one vocabulary-sized aggregation (|classes| x buckets
    groups, map-side partials) joined to two tiny broadcast stat tables;
    top-k via TakeOrderedAndProject. The corpus never shuffles.
    """
    n_cls_distinct = docs.agg(F.countDistinct(class_col)).first()[0]
    if n_cls_distinct > MAX_CLASSES:
        raise ValueError(
            f"{n_cls_distinct} classes exceeds MAX_CLASSES={MAX_CLASSES}"
        )
    base = _tokens(docs, [id_col, class_col], text_col).select(
        F.col(class_col).alias("cls"),
        _bucket(F.col("w"), buckets).alias("b"),
    )
    # ONE tokenize pass (r12, guide §1.2): every margin of the 2x2
    # contingency is a re-sum of the (cls, bucket) counts — identical
    # exact bigints by associativity — so the class/bucket/grand totals
    # derive from cb instead of re-tokenizing the corpus three more
    # times. cb is bounded (GROUP BY caps it at |classes| x buckets);
    # eager checkpoint so its four consumers read the materialized
    # table, with the structural LIMIT re-stated above the checkpoint
    # (never truncates) for the fleet lint.
    cb = (
        base.groupBy("cls", "b")
        .agg(F.count(F.lit(1)).alias("a"))
        .limit(MAX_CLASSES * buckets)
        .localCheckpoint(eager=True)
        .limit(MAX_CLASSES * buckets)
    )
    cls_tot = (
        cb.groupBy("cls")
        .agg(F.sum("a").cast("long").alias("n_cls"))
        .limit(MAX_CLASSES)
    )
    grand = cb.agg(F.sum("a").cast("long").alias("n_all"))
    bucket_tot = (
        cb.groupBy("b")
        .agg(F.sum("a").cast("long").alias("n_b"))
        .limit(buckets)
    )
    j = (
        cb.join(F.broadcast(cls_tot), "cls")
        .join(F.broadcast(bucket_tot), "b")
        .crossJoin(F.broadcast(grand))
        # degenerate margins (a class or bucket holding EVERY token)
        # zero the denominator; exclude them on the exact int counts
        .filter(
            (F.col("n_cls") < F.col("n_all")) & (F.col("n_b") < F.col("n_all"))
        )
    )
    a = F.col("a").cast("double")
    bq = (F.col("n_cls") - F.col("a")).cast("double")
    c = (F.col("n_b") - F.col("a")).cast("double")
    d = (F.col("n_all") - F.col("n_cls") - F.col("n_b") + F.col("a")).cast(
        "double"
    )
    n = F.col("n_all").cast("double")
    diff = a * d - bq * c
    denom = (a + bq) * (c + d) * (a + c) * (bq + d)
    chi2 = n * diff * diff / denom
    return (
        j.select(
            F.col("cls").alias("cls"),
            F.col("b").alias("bucket"),
            F.floor(chi2 * 1000.0 + F.lit(0.5)).cast("bigint").alias(
                "chi2_x1e3"
            ),
        )
        .orderBy(F.desc("chi2_x1e3"), "cls", "bucket")
        .limit(top)
    )


def nb_scores(
    docs: DataFrame,
    class_col: str = "lang",
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train the NB model on even-id documents and return every
    (doc_id, true_cls, cls, score) for the odd-id test docs — the
    shared scoring kernel behind the confusion matrix, the binned AUC,
    and the calibration table. ``score`` = Σ token log-probs + prior,
    exact fixed-point bigint (see :func:`nb_class_confusion`)."""
    n_cls = docs.agg(F.countDistinct(class_col)).first()[0]
    if n_cls > MAX_CLASSES:
        raise ValueError(
            f"{n_cls} classes exceeds MAX_CLASSES={MAX_CLASSES}: the trained "
            "model broadcasts |classes| x buckets rows — shard the class "
            "space or raise buckets-aware limits deliberately"
        )
    base = _tokens(docs, [id_col, class_col], text_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(class_col).alias("cls"),
        _bucket(F.col("w"), buckets).alias("b"),
    )
    train = base.filter(F.col("doc_id") % 2 == 0)
    test = base.filter(F.col("doc_id") % 2 == 1).withColumnRenamed(
        "cls", "true_cls"
    )

    # ONE tokenize pass over the training split (r12, guide §1.2): the
    # (cls, bucket) counts are the finest aggregate every model table
    # needs — cls_tok is their per-class re-sum (identical bigint
    # totals by associativity), so deriving it from cb instead of from
    # the token stream removes a second explode+hash pass over the
    # corpus. cb is bounded (GROUP BY caps it at |classes| x buckets);
    # the eager checkpoint materializes it once for its two consumers
    # (model + cls_tok) — without it each reference re-runs the
    # tokenize subtree (the _score_bins lesson).
    cb = (
        train.groupBy("cls", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .limit(MAX_CLASSES * buckets)
        .localCheckpoint(eager=True)
        .limit(MAX_CLASSES * buckets)
    )
    cls_tok = (
        cb.groupBy("cls")
        .agg(F.sum("c").cast("long").alias("n_tok"))
        .limit(MAX_CLASSES)
    )
    n_train_docs = (
        docs.filter(F.col(id_col) % 2 == 0)
        .agg(F.count(F.lit(1)).alias("n_train"))
    )
    cls_docs = (
        docs.filter(F.col(id_col) % 2 == 0)
        .groupBy(F.col(class_col).alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_docs_cls"))
    )
    classes = (
        cls_tok.join(cls_docs, "cls")
        .crossJoin(F.broadcast(n_train_docs))
        .select(
            "cls",
            _fp(
                F.log(
                    F.lit(1.0)
                    / (F.col("n_tok") + buckets).cast("double")
                )
            ).alias("lp_floor"),
            _fp(
                F.log(
                    F.col("n_docs_cls").cast("double")
                    / F.col("n_train").cast("double")
                )
            ).alias("lp_prior"),
        )
        # never truncates (guard above); encodes the |classes| bound in
        # the physical plan so the broadcast is provably constant-size
        .limit(MAX_CLASSES)
    )
    model = (
        cb.join(cls_tok, "cls")
        .select(
            "cls",
            "b",
            _fp(
                F.log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("n_tok") + buckets).cast("double")
                )
            ).alias("lp"),
        )
        # GROUP BY (cls, b) caps cardinality at |classes| x buckets;
        # the LIMIT states that bound structurally (never truncates)
        .limit(MAX_CLASSES * buckets)
    )
    scored = (
        test.crossJoin(F.broadcast(classes.select("cls", "lp_floor")))
        .join(F.broadcast(model), ["cls", "b"], "left")
        .select(
            "doc_id",
            "true_cls",
            "cls",
            F.coalesce(F.col("lp"), F.col("lp_floor")).alias("lp_tok"),
        )
        .groupBy("doc_id", "true_cls", "cls")
        .agg(F.sum("lp_tok").cast("bigint").alias("lp_sum"))
        .join(F.broadcast(classes.select("cls", "lp_prior")), "cls")
        .select(
            "doc_id",
            "true_cls",
            "cls",
            (F.col("lp_sum") + F.col("lp_prior")).alias("score"),
        )
    )
    return scored


def nb_class_confusion(
    docs: DataFrame,
    class_col: str = "lang",
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train a multinomial naive-Bayes classifier on even-id documents,
    score odd-id documents, return the confusion matrix.

    Model: P(class) · Π P(bucket|class) with Laplace smoothing over the
    ``buckets`` hashed-token space; all log-probs fixed-point bigint.
    Per-class term probabilities use (c+1)/(n_class+buckets); unseen
    (class, bucket) pairs fall back to the class's smoothing floor
    ln(1/(n_class+buckets)). Prediction ties break on the class name.
    Returns (true_class, pred_class, n_docs) ordered by the pair.
    """
    scored = nb_scores(docs, class_col, buckets, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cls")
    pred = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", "true_cls", F.col("cls").alias("pred_cls"))
    )
    return (
        pred.groupBy(
            F.col("true_cls").alias("true_class"),
            F.col("pred_cls").alias("pred_class"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_class", "pred_class")
    )


def _binary_scored(
    docs: DataFrame,
    positive_class: str,
    class_col: str,
    buckets: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(doc_id, score, is_pos) for the positive class's NB score over
    the test split — the input both binary-eval operators share."""
    s = nb_scores(docs, class_col, buckets, id_col, text_col)
    return s.filter(F.col("cls") == positive_class).select(
        "doc_id",
        "score",
        F.when(F.col("true_cls") == positive_class, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_pos"),
    )


def _score_bins(scored: DataFrame, n_bins: int) -> DataFrame:
    """Histogram the exact integer scores into ``n_bins`` fixed bins.

    Integer division in BOTH engines (Spark ``DIV``, DuckDB ``//`` —
    identical on the non-negative operands here), so binning is exact
    and engine-portable; a double division could round up across a bin
    boundary. Returns (bin, n_pos, n_neg), ≤ n_bins rows, with the
    structural LIMIT that makes the bound provable to the fleet lint.
    """
    # the NB train+score pipeline above is the expensive part; without
    # pinning, min/max + binning re-execute it and every downstream
    # reference of the histogram multiplies that again (measured 54
    # FileScan copies / 40 jobs for one AUC row). Persist the scored
    # set for its two passes, then eagerly checkpoint the <= n_bins-row
    # histogram so consumers reuse a bounded materialized table.
    scored = scored.persist()
    try:
        rng = scored.agg(
            F.min("score").alias("s_min"), F.max("score").alias("s_max")
        )
        binned = scored.crossJoin(F.broadcast(rng)).select(
            F.expr(
                f"(score - s_min) * {n_bins} DIV (s_max - s_min + 1)"
            ).alias("bin"),
            "is_pos",
        )
        hist = (
            binned.groupBy("bin")
            .agg(
                F.sum("is_pos").cast("bigint").alias("n_pos"),
                F.sum(1 - F.col("is_pos")).cast("bigint").alias("n_neg"),
            )
            .limit(n_bins)
            .localCheckpoint(eager=True)
        )
    finally:
        scored.unpersist()
    # the checkpoint replaced the plan with a bare RDD scan, which
    # erases the GlobalLimit the fleet lint reads as the bound —
    # re-state it above the materialized table (still never truncates)
    return hist.limit(n_bins)


def nb_binary_auc(
    docs: DataFrame,
    positive_class: str = "en",
    class_col: str = "lang",
    buckets: int = 4096,
    n_bins: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Binned AUC (Mann-Whitney) of the NB positive-class score — the
    standard quality-classifier evaluation at corpus scale.

    Exact scores histogram into ``n_bins`` fixed bins (score resolution
    beyond 1/n_bins of the range is collapsed — the same downsampling
    Spark ML's BinaryClassificationMetrics(numBins) applies, because a
    global per-document rank is the one thing a 100 TB evaluation must
    not do). Within the binned resolution the computation is EXACT
    integer arithmetic: 2U = Σ_{b>b'} 2·pos_b·neg_b' + Σ_b pos_b·neg_b
    (ties at the same bin count half), accumulated in decimal(38,0),
    and AUC = 2U / (2·n_pos·n_neg) as one final division. The
    cross-bin term is a bounded self-join of the ≤n_bins-row histogram
    — no global window, no per-doc rank, nothing data-proportional
    after the histogram aggregation.

    Returns one row (n_pos, n_neg, auc_x1e6); AUC is NULL when either
    class is absent from the test split.
    """
    hist = _score_bins(
        _binary_scored(
            docs, positive_class, class_col, buckets, id_col, text_col
        ),
        n_bins,
    )
    a = hist.select(
        F.col("bin").alias("bin_a"),
        F.col("n_pos").alias("pos_a"),
        F.col("n_neg").alias("neg_a"),
    )
    b = hist.select(
        F.col("bin").alias("bin_b"), F.col("n_neg").alias("neg_b")
    )
    # widen BEFORE multiplying: a bigint product of two ~2e9+ bin
    # counts wraps silently in Spark (and errors in DuckDB) — the
    # decimal/hugeint accumulation only guarantees parity if the
    # factors enter it un-wrapped
    cross = (
        a.join(F.broadcast(b), F.col("bin_b") < F.col("bin_a"))
        .agg(
            F.coalesce(
                F.sum(
                    F.lit(2).cast(_DEC)
                    * F.col("pos_a").cast(_DEC)
                    * F.col("neg_b").cast(_DEC)
                ),
                F.lit(0).cast(_DEC),
            ).alias("u2_cross")
        )
    )
    same = hist.agg(
        F.coalesce(
            F.sum(F.col("n_pos").cast(_DEC) * F.col("n_neg").cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("u2_same"),
        # counts are 0, never NULL, on an empty scored set (the
        # empty-build bloom_bits_set convention)
        F.coalesce(F.sum("n_pos").cast("bigint"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("n_neg").cast("bigint"), F.lit(0)).alias("n_neg"),
    )
    return same.crossJoin(F.broadcast(cross)).select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.floor(
                (F.col("u2_cross") + F.col("u2_same")).cast("double")
                / (
                    F.lit(2).cast(_DEC)
                    * F.col("n_pos").cast(_DEC)
                    * F.col("n_neg").cast(_DEC)
                ).cast("double")
                * 1000000.0
                + F.lit(0.5)
            ).cast("bigint"),
        ).alias("auc_x1e6"),
    )


def nb_calibration_deciles(
    docs: DataFrame,
    positive_class: str = "en",
    class_col: str = "lang",
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reliability table: NB positive-class scores cut into 10 fixed
    score-range bins; per bin, how often the positive class actually
    occurs. The calibration read any score-thresholding pipeline needs
    before it trusts a cutoff. Same exact integer binning as the AUC;
    one ≤10-group aggregation. Returns (decile, n_docs, n_pos,
    pos_rate_x1e6) ordered by decile.
    """
    hist = _score_bins(
        _binary_scored(
            docs, positive_class, class_col, buckets, id_col, text_col
        ),
        10,
    )
    return (
        hist.select(
            F.col("bin").alias("decile"),
            (F.col("n_pos") + F.col("n_neg")).alias("n_docs"),
            "n_pos",
            F.floor(
                F.col("n_pos").cast("double")
                * 1000000.0
                / (F.col("n_pos") + F.col("n_neg")).cast("double")
            )
            .cast("bigint")
            .alias("pos_rate_x1e6"),
        )
        .orderBy("decile")
    )
