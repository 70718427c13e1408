"""Distributed logistic regression by fixed-point gradient steps — the
linear-probe companion of the k-means / power-iteration family
(operators/clustering.py, stats.py).

One-vs-all logistic regression over the embeddings table: y = 1 for the
target weak label, 0 otherwise; features are the first ``dims``
quantized vector components plus a bias. Trains ``iters`` full-batch
gradient steps from w = 0 and reports, per ORIGINAL label, how the
learned linear classifier scores that label's vectors — the standard
"is this weak label linearly separable" corpus audit.

Why not MLlib / raw-float SGD: the engine's iterative-operator
discipline (ml_q.py module docstring) requires every iteration to
re-enter integer space so a DuckDB oracle can UNROLL the training as
CTE blocks and match bit-for-bit. Two consequences:

1. **Rational sigmoid, not exp.** The logistic link 1/(1+e^-z) needs
   libm ``exp``, and cross-runtime libm identity is not a contract
   (test_ml_properties policy: ln/exp get invariants, never replays).
   The link used here is the fast sigmoid

       s(z) = 0.5 + z / (2 * (1 + |z|))

   — mul/div/abs/add only, a fixed IEEE sequence both engines evaluate
   identically, with the same shape (monotone, s(0)=1/2, saturating to
   0/1) and the classic perceptron-like gradient behavior. This is the
   documented determinism trade: a *specified* link variant, not an
   approximation of exp whose error could differ per engine.
2. **Requantize everything that crosses an iteration.** Per row the
   sigmoid output rounds once to 1e-6 (``floor(s*1e6 + 0.5)``), the
   residual and gradient accumulate as exact decimal(38,0) integers,
   and the weight update floors back to integer 1e-6 units — so
   iteration t+1's input weights are bit-identical across engines and
   partitionings (the kmeans/_update_centroids pattern).

Scale shape (the power_iteration_projection template): per gradient
step ONE map-only scoring pass over the corpus (weights inlined as
literals — no join, no broadcast) feeding a (dims+1)-group aggregation
of map-side partial sums — a constant-size shuffle independent of
corpus size — and a bounded driver collect of dims+1 gradient
components. The final report is one more map-only pass + a label-group
aggregate. Nothing is quadratic; driver state is O(dims).

Reference parity: the reference engine (lealone-sql) has no ML
surface; this extends the SURVEY.md §2.14 family.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_S = 1_000_000  # fixed-point scale (matches similarity.quantize)
_DEC = "decimal(38,0)"
MAX_DIMS = 64  # driver-side weight vector bound (clustering.MAX_K twin)


def _fast_sigmoid_x1e6(dot: Column) -> Column:
    """floor((0.5 + z/(2*(1+|z|))) * 1e6 + 0.5) for z = dot/1e12.

    ``dot`` is an exact bigint (sum of <= MAX_DIMS+1 products of
    1e6-scaled components, < 2^53, so the double cast is exact); every
    double op after it is a fixed sequence mirrored verbatim by the
    oracle SQL — change one parenthesis here and you must change the
    workload's generated CTE too."""
    z = dot.cast("double") / F.lit(1.0e12)
    p = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
    return F.floor(p * F.lit(1.0e6) + F.lit(0.5)).cast("bigint")


def _dot_literal(vec: Column, w: list[int]) -> Column:
    # UNROLLED bounded sum, not aggregate(zip_with(...)) — the fold runs
    # interpreted outside codegen (r10 verdict task 4; measurement in
    # clustering._sq_dist_to_literal). Bit-identical by integer
    # associativity; F.get + the size guard preserve the fold's NULL
    # semantics on ragged input in both directions.
    out: Column = F.lit(0).cast("bigint")
    for i, c in enumerate(w):
        out = out + F.get(vec, i) * F.lit(int(c)).cast("bigint")
    return F.when(F.size(vec) <= F.lit(len(w)), out)


def _prepare(
    emb: DataFrame,
    target_label: int,
    dims: int,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """(vec_id, label, y, qvec) with qvec = first ``dims`` components
    quantized x1e6 PLUS a trailing constant-1e6 bias feature."""
    from .similarity import quantize

    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).cast("bigint").alias("label"),
        (F.col(label_col).cast("bigint") == F.lit(int(target_label)))
        .cast("bigint")
        .alias("y"),
        F.concat(
            quantize(F.slice(F.col(vec_col), 1, dims)),
            F.array(F.lit(_S).cast("bigint")),
        ).alias("qvec"),
    )


def delta_w(g: int, n: int, lr_num: int, lr_den: int) -> int:
    """The driver-side weight-update rounding, one pinned IEEE sequence:
    floor((float(g) * lr_num) / ((float(n) * 1e6) * lr_den) + 0.5).
    The oracle SQL evaluates the identical parenthesization; ``g`` may
    exceed 2^53 at corpus scale, but decimal(38,0) (Spark) and HUGEINT
    (DuckDB) both cast to double round-to-nearest, so the inputs agree
    bit-for-bit too."""
    return int(
        math.floor(
            (float(g) * lr_num) / ((float(n) * 1.0e6) * lr_den) + 0.5
        )
    )


def logreg_train(
    emb: DataFrame,
    target_label: int,
    dims: int = 8,
    iters: int = 2,
    lr_num: int = 4,
    lr_den: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> list[int]:
    """Run ``iters`` full-batch gradient steps from w = 0 and return the
    final integer weight vector (dims features + trailing bias, 1e-6
    units). Driver state is the weight vector only (<= MAX_DIMS+1)."""
    if dims > MAX_DIMS:
        raise ValueError(f"dims={dims} exceeds MAX_DIMS={MAX_DIMS}")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    q = _prepare(emb, target_label, dims, id_col, vec_col, label_col)
    # NULL-label guard (r10 advisor): a NULL label yields y = NULL, which
    # drops the row from the gradient numerator but still counts in n —
    # while the oracle's CASE WHEN maps NULL to y = 0 and keeps the row
    # in the gradient. The engines diverge silently, so non-null labels
    # are an enforced precondition (same discipline as the ragged-input
    # guard below). One pushed-IsNotNull probe scan, limit-1 bounded.
    # Cost disposition (r11 advisor, accepted as-is): the probe adds one
    # extra action per train call, paid unconditionally; it has never
    # shown in a profile (limit-1 short-circuits the scan). If it ever
    # does, fold it into the first gradient pass — count NULL labels in
    # that aggregation and raise after its collect.
    if q.filter(F.col("label").isNull()).limit(1).count():
        raise ValueError(
            "NULL label: logreg train requires non-null labels (a NULL "
            "row diverges between engine and oracle); filter upstream"
        )
    d1 = dims + 1
    w = [0] * d1
    for _ in range(iters):
        scored = q.select(
            "y",
            "qvec",
            _fast_sigmoid_x1e6(_dot_literal(F.col("qvec"), w)).alias("s"),
        )
        g_rows = (
            scored.select(
                (F.col("y") * F.lit(_S) - F.col("s")).alias("r"),
                F.posexplode("qvec").alias("pos", "x"),
            )
            .groupBy("pos")
            .agg(
                F.sum((F.col("r") * F.col("x")).cast(_DEC)).alias("g"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        if not g_rows:
            raise ValueError("empty input: no vectors to train on")
        counts = {int(r["n"]) for r in g_rows}
        if len(counts) != 1 or len(g_rows) != d1:
            # a vector shorter than ``dims`` posexplodes into fewer
            # positions — fail loudly instead of training on silently
            # NULL-padded dots the oracle cannot mirror
            raise ValueError(
                f"ragged input: expected {d1} equal-count position "
                f"groups, got {len(g_rows)} with counts {sorted(counts)}"
            )
        n = counts.pop()
        g = {int(r["pos"]): int(r["g"]) for r in g_rows}
        w = [
            w[p] + delta_w(g[p], n, lr_num, lr_den) for p in range(d1)
        ]
    return w


def logreg_label_probe(
    emb: DataFrame,
    target_label: int,
    dims: int = 8,
    iters: int = 2,
    lr_num: int = 4,
    lr_den: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Train one-vs-all, then report per ORIGINAL label how the learned
    linear classifier scores that label's slice:

    - n_vecs
    - n_pred_target: rows the classifier calls target. s(z) >= 1/2 is
      EXACTLY dot >= 0, so the decision is an integer compare — no
      float enters the prediction.
    - avg_score_x1e6: floor(sum(s)/n) over the quantized sigmoid
      scores (sum exact decimal, one double division — the
      kmeans-means rounding shape).

    A separable target label shows avg_score near 1e6 on its own row
    and near the base rate elsewhere; the bias row keeps the probe
    honest when the target prior is tiny."""
    w = logreg_train(
        emb, target_label, dims, iters, lr_num, lr_den,
        id_col, vec_col, label_col,
    )
    q = _prepare(emb, target_label, dims, id_col, vec_col, label_col)
    scored = q.select(
        "label",
        _dot_literal(F.col("qvec"), w).alias("dot"),
    ).select(
        "label",
        (F.col("dot") >= 0).cast("bigint").alias("pred"),
        _fast_sigmoid_x1e6(F.col("dot")).alias("s"),
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("pred").cast("bigint").alias("n_pred_target"),
            F.floor(
                F.sum(F.col("s").cast(_DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
            .cast("bigint")
            .alias("avg_score_x1e6"),
        )
        .orderBy("label")
    )
