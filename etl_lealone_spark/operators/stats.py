"""Exact numeric statistics — a Pearson correlation matrix whose
moments are exact integers, so the matrix is bit-identical across
engines, partitionings, and reruns.

Why not ``F.corr``: Spark's built-in correlation accumulates raw
doubles, so a 32-partition run and a serial DuckDB run disagree in the
last ulps and the driver's value-hash flags it. The classic fix is the
one every money-sum workload in this repo uses (workloads/__init__.py
rule 1) taken one step further: quantize each column to integer units
(cents), accumulate ALL first and second moments as exact wide
integers, and only at the very end cast the three exact terms of

    r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))

to double — one identical IEEE op sequence in both engines.

Scale shape: ONE ungrouped aggregation computes every moment for every
column pair in a single corpus pass (map-side partials, 1-row result);
the pair matrix is then a literal explode of that row. No shuffle
beyond the 1-row final exchange, no second pass, no UDFs.

The power-iteration PCA below is the classic von Mises iteration
(von Mises & Pollaczek-Geiringer 1929) in fixed-point form. The
reference engine (sevenfang/etl-Lealone) has neither exact-moment
statistics nor a linear-algebra surface; both are SURVEY.md §2
extensions in the operators/similarity.py tradition.

Width headroom: moments accumulate in decimal(38,0) (Spark) / HUGEINT
(DuckDB oracle) — exact to 1e38. With cent-scaled prices (≤1e7 units)
the binding term is n*Sxy ≤ n^2 * 1e14, safe to n ≈ 1e12 rows; past
that, pre-aggregate per shard or drop to per-column z-scales chosen so
products stay inside the window (documented, not silently truncated).
"""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"
_V_SCALE = 1_000_000  # fixed-point scale of the power-iteration vector


def _q(col: str, scale: int) -> Column:
    """Exact integer quantization: floor(x*scale + 0.5) as bigint.

    The inputs are money/measure doubles that ARE exact multiples of
    1/scale (parquet carries 2-decimal values); the floor(+0.5) form is
    the repo-wide tie-safe rounding. Stays bigint so the per-row
    products run in whole-stage codegen (a cent-scaled product is
    ≤ ~1e14, far inside int64); only the SUM accumulates in
    decimal(38,0), where overflow is real."""
    return F.floor(F.col(col) * float(scale) + F.lit(0.5)).cast("bigint")


def exact_corr_matrix(
    df: DataFrame, cols: list[str], scale: int = 100
) -> DataFrame:
    """Pearson correlation for every unordered pair of ``cols``.

    Returns (col_a, col_b, n_rows, corr_x1e6) with col_a < col_b,
    corr fixed-point quantized (floor(r*1e6 + 0.5)). Rows must be
    complete across ``cols`` (dropna) — listwise deletion, the
    convention a correlation MATRIX needs for positive
    semidefiniteness (pairwise-complete matrices need not be PSD).
    """
    base = df.select(*cols).dropna()
    aggs = [F.count(F.lit(1)).cast(_DEC).alias("n")]
    for c in cols:
        aggs.append(F.sum(_q(c, scale).cast(_DEC)).alias(f"s_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(
            F.sum((_q(a, scale) * _q(b, scale)).cast(_DEC)).alias(f"s_{a}_{b}")
        )
    for c in cols:
        aggs.append(
            F.sum((_q(c, scale) * _q(c, scale)).cast(_DEC)).alias(f"s_{c}_{c}")
        )
    m = base.agg(*aggs)

    pair_structs = []
    for a, b in combinations(cols, 2):
        num = (F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(
            "double"
        )
        var_a = (F.col("n") * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
            "double"
        )
        var_b = (F.col("n") * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(
            "double"
        )
        r = num / (F.sqrt(var_a) * F.sqrt(var_b))
        pair_structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").cast("bigint").alias("n_rows"),
                # zero-variance guard: a constant column has no defined
                # correlation — emit NULL in BOTH engines instead of
                # letting NaN/Inf hit the bigint cast (Spark would emit
                # garbage silently; DuckDB would error)
                F.when(
                    (var_a > 0) & (var_b > 0),
                    F.floor(r * 1000000.0 + F.lit(0.5)).cast("bigint"),
                ).alias("corr_x1e6"),
            )
        )
    return (
        m.select(F.explode(F.array(*pair_structs)).alias("p"))
        .select("p.col_a", "p.col_b", "p.n_rows", "p.corr_x1e6")
        .orderBy("col_a", "col_b")
    )


def _dot_sql(vec_sql: str, v: list[int]) -> str:
    """Exact bigint dot product of an int-vector column with a
    Python-literal vector, as ONE Spark-SQL expression string.

    Stays the ``aggregate(zip_with(...))`` fold DELIBERATELY (r10
    verdict task 4, measured verdict: rejection for this call site —
    same finding as clustering._sq_dist_sql: the unrolled 64-term tree
    wins per row but pays Catalyst+janino fixed cost per ACTION, and
    power iteration re-plans every step on a 2000-row corpus; unrolled
    read 4.8s vs 3.5s on pca_label_projection A/B, BENCHLOG.md r11.
    logreg._dot_literal is the adopted twin — its dims+1 <= 9-term
    tree is too small to show plan cost). Built as a SQL string parsed
    JVM-side in one call — Column-by-Column literal construction costs
    ~1s of py4j roundtrips per 64-dim expression (same measurement)."""
    arr = "array(" + ",".join(f"{int(c)}L" for c in v) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (x, c) -> x * c), "
        f"0L, (acc, val) -> acc + val)"
    )


def power_iteration_projection(
    emb: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Top principal direction by fixed-point power iteration, reported
    as per-label projection statistics — "how separable are the weak
    labels along PC1", the embedding-quality audit a curation pipeline
    runs before trusting cluster- or label-based sampling.

    Method (all engine-portable fixed-point):

    1. quantize vectors (``similarity.quantize``) and CENTER on the
       floor-rounded integer component means — exact ints again;
    2. v0 = all-ones at scale 1e6; each iteration computes
       y_i = floor((x_i . v) / 1e6)  (per-row, map-only, exact bigint
       dot then one deterministic double division), then
       z = X^T y via a dim-group aggregation whose sums accumulate in
       decimal(38,0) (exact far past int64 at corpus scale), then
       renormalizes v = floor(z * 1e6 / max|z| + 0.5) — the vector
       re-enters integer space, so every iteration is bit-identical
       across engines and partitionings;
    3. output per label: n_vecs, sum_proj, min_proj, max_proj of the
       final projection y (exact bigints — no means, no doubles).

    Scale shape: per iteration ONE map-only projection over the corpus
    plus ONE dim-group shuffle of map-side partial sums (constant
    k=dim groups — the k-means update shape); the dim-row z vector is
    collected driver-side (bounded) to seed the next iteration's
    literals. max|z| = 0 (an exactly-zero matvec) cannot occur for
    non-degenerate real data and would raise here rather than divide
    by zero.

    Reference parity: the reference engine has no linear-algebra
    surface; this extends the analytics family like
    operators/similarity.py (SURVEY.md §2 extensions).
    """
    from .similarity import quantize

    q = emb.select(
        F.col(id_col).alias("vec_id"),
        quantize(F.col(vec_col)).alias("qvec"),
        F.col(label_col).cast("bigint").alias("label"),
    )
    mu_rows = (
        q.select(F.posexplode("qvec").alias("pos", "vv"))
        .groupBy("pos")
        .agg(
            # widen before accumulating (same rule as the moment sums
            # above): sum(bigint) wraps at 2^63 where the oracle's
            # HUGEINT stays exact; decimal(38,0)->double rounds the same
            # as bigint->double below the wrap point, so this is
            # bit-neutral at any corpus size that fits int64.
            F.floor(
                F.sum(F.col("vv").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("mu")
        )
        .collect()
    )
    mu = {int(r["pos"]): int(r["mu"]) for r in mu_rows}
    dim = len(mu)
    # centering as one JVM-parsed expression string (same py4j-storm
    # avoidance as _dot_sql; the zip_with fold semantics are unchanged)
    mu_arr = "array(" + ",".join(f"{mu[p]}L" for p in range(dim)) + ")"
    c = q.select(
        "vec_id",
        "label",
        F.expr(f"zip_with(qvec, {mu_arr}, (x, m) -> x - m)").alias("cvec"),
    )
    v = [_V_SCALE] * dim
    for _ in range(iters):
        y = c.select(
            "label",
            "cvec",
            F.floor(
                F.expr(_dot_sql("cvec", v)).cast("double")
                / float(_V_SCALE)
            )
            .cast("bigint")
            .alias("y"),
        )
        z_rows = (
            y.select("y", F.posexplode("cvec").alias("pos", "x"))
            .groupBy("pos")
            .agg(
                F.sum((F.col("y") * F.col("x")).cast(_DEC)).alias("z")
            )
            .collect()
        )
        z = {int(r["pos"]): int(r["z"]) for r in z_rows}
        m = max(abs(val) for val in z.values())
        if m == 0:
            raise ValueError(
                "power iteration hit an exactly-zero matvec (degenerate "
                "input); no principal direction exists"
            )
        # identical rounding to the SQL mirror: double mul/div then floor
        v = [
            int(math.floor(float(z[p]) * float(_V_SCALE) / float(m) + 0.5))
            for p in range(dim)
        ]
    proj = c.select(
        "label",
        F.floor(
            F.expr(_dot_sql("cvec", v)).cast("double") / float(_V_SCALE)
        )
        .cast("bigint")
        .alias("proj"),
    )
    return (
        proj.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("proj").cast("bigint").alias("sum_proj"),
            F.min("proj").alias("min_proj"),
            F.max("proj").alias("max_proj"),
        )
        .orderBy("label")
    )


def _reg_moments(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_cols: list[str],
    y_scale: int,
    x1_scale: int,
    x2_scale: int,
):
    """The ten exact decimal(38,0) normal-equation moments per group —
    the shared single-scan kernel of grouped_ols and grouped_ridge
    (r11 review: the guard bound and moment set were hand-mirrored
    twice; only the pinned SOLVES must stay separate). Returns
    (m, d): the aggregate DataFrame and its double-cast column dict —
    every moment casts to double exactly once, mirrored by the
    oracles' d CTE."""
    q_y = _q(y_col, y_scale)
    q_1 = _q(x1_col, x1_scale)
    q_2 = _q(x2_col, x2_scale)
    base = df.select(
        *group_cols, q_y.alias("qy"), q_1.alias("q1"), q_2.alias("q2")
    ).dropna()
    m = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("q1").cast(_DEC)).alias("sx1"),
        F.sum(F.col("q2").cast(_DEC)).alias("sx2"),
        F.sum(F.col("qy").cast(_DEC)).alias("sy"),
        F.sum((F.col("q1") * F.col("q1")).cast(_DEC)).alias("s11"),
        F.sum((F.col("q1") * F.col("q2")).cast(_DEC)).alias("s12"),
        F.sum((F.col("q2") * F.col("q2")).cast(_DEC)).alias("s22"),
        F.sum((F.col("q1") * F.col("qy")).cast(_DEC)).alias("s1y"),
        F.sum((F.col("q2") * F.col("qy")).cast(_DEC)).alias("s2y"),
        F.sum((F.col("qy") * F.col("qy")).cast(_DEC)).alias("syy"),
    )
    d = {
        c: F.col(c).cast("double")
        for c in (
            "n", "sx1", "sx2", "sy", "s11", "s12", "s22", "s1y", "s2y",
            "syy",
        )
    }
    return m, d


# the shared near-singular bound (r10 advisor): NULL every output when
# any |coefficient| >= _REG_BOUND or |r2| >= _REG_BOUND, so the x1e6
# quantization stays inside bigint in BOTH engines (DuckDB errors on
# the cast; Spark saturates silently). abs(NaN) < bound is false in
# both engines, so NaN solves NULL too. The oracle SQL pins the
# IDENTICAL predicate — edit both together.
_REG_BOUND = 1.0e12


def _reg_select(m, group_cols, ok, b0, b1, b2, r2, ss_tot):
    """The shared quantize-and-guard output projection."""
    _B = F.lit(_REG_BOUND)

    def _x1e6(v):
        return F.floor(v * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")

    return m.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n_rows"),
        F.when(ok, _x1e6(b0)).alias("b0_x1e6"),
        F.when(ok, _x1e6(b1)).alias("b1_x1e6"),
        F.when(ok, _x1e6(b2)).alias("b2_x1e6"),
        F.when(
            ok & (ss_tot > F.lit(0.0)) & (F.abs(r2) < _B), _x1e6(r2)
        ).alias("r2_x1e6"),
    ).orderBy(*group_cols)


_REG_MOMENT_COLS = (
    "n", "sx1", "sx2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy",
)


def _reg_stage(m, d, group_cols, det, d0, d1, d2):
    """Stage the Cramer solve through NAMED projections (r12, guide
    §1.2-2 per-task work): det and b0/b1/b2 are each referenced by the
    ok guard, every quantized output, and ss_res — inlined into one
    projection, the duplicated solve trees made the ridge physical plan
    ~57 KB of expression text and cost ~0.25s of per-action
    planning+codegen at ANY data size (measured staged-vs-inline
    interleaved A/B at sf0.1, rows asserted identical: 2.26 -> 2.01s
    isolated min). CollapseProject leaves multiply-referenced non-cheap
    aliases in place (the minhash_signatures mechanism), so the staging
    survives optimization; each staged column is the SAME double ops in
    the SAME pinned parenthesization — outputs are bit-identical and
    the oracle SQL mirrors are untouched.

    Returns ``(staged, D, (b0, b1, b2))``: the staged frame (still
    carrying decimal ``n`` for the n_rows output and ``det`` for the
    singular guard), the moment→double-column map, and the coefficient
    columns."""
    s1 = m.select(
        *group_cols,
        "n",
        *[d[c].alias(f"{c}_d") for c in _REG_MOMENT_COLS],
        det.alias("det"),
        d0.alias("det0"),
        d1.alias("det1"),
        d2.alias("det2"),
    )
    # try_divide, not `/`: ANSI errors on a zero denominator, and
    # whole-stage codegen's common-subexpression elimination hoists
    # shared divisions OUT of the CASE's conditional protection — a
    # singular group (det = 0) would crash the query instead of
    # NULLing. try_divide is bit-identical for det != 0 and yields
    # NULL at 0, which the ok guard absorbs; the oracle's double
    # division returns Inf/NULL at 0, absorbed by the SAME CASE
    # predicate.
    s2 = s1.select(
        *group_cols,
        "n",
        *[f"{c}_d" for c in _REG_MOMENT_COLS],
        "det",
        F.try_divide(F.col("det0"), F.col("det")).alias("cb0"),
        F.try_divide(F.col("det1"), F.col("det")).alias("cb1"),
        F.try_divide(F.col("det2"), F.col("det")).alias("cb2"),
    )
    D = {c: F.col(f"{c}_d") for c in _REG_MOMENT_COLS}
    return s2, D, (F.col("cb0"), F.col("cb1"), F.col("cb2"))


def grouped_ols(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_cols: list[str],
    y_scale: int = 100,
    x1_scale: int = 1,
    x2_scale: int = 100,
) -> DataFrame:
    """Per-group ordinary least squares with two features + intercept,
    solved in CLOSED FORM from exact integer moments — the regression
    twin of :func:`exact_corr_matrix` (no iterations, no driver state).

    Per group, ONE aggregation accumulates the ten normal-equation
    moments (n, Sx1, Sx2, Sy, Sx1x1, Sx1x2, Sx2x2, Sx1y, Sx2y, Syy) as
    exact decimal(38,0) sums of quantized-integer products; the 3x3
    system then solves via Cramer's rule in a FIXED double sequence —
    each moment casts to double once (decimal->double and the oracle's
    HUGEINT->double both round to nearest, so the inputs agree
    bit-for-bit), then only mul/sub/add/div in a pinned
    parenthesization mirrored verbatim by the workload oracle SQL.
    Coefficients and R^2 quantize x1e6 (floor(v*1e6 + 0.5)).

    Outputs per group: n_rows, b0/b1/b2_x1e6 (in quantized-unit space:
    y_q ~ b0 + b1*x1_q + b2*x2_q), r2_x1e6. A singular system (exactly
    collinear features — det == 0.0 after the pinned arithmetic) and a
    zero-variance target both yield NULLs in BOTH engines rather than
    an Inf/NaN reaching the bigint cast.

    Scale shape: one grouped aggregation with map-side partials — the
    shuffle carries |groups| x 10 decimals no matter the corpus size —
    and everything after is a projection on the aggregate row. The
    100 TB cost is exactly one scan.
    """
    m, d = _reg_moments(
        df, y_col, x1_col, x2_col, group_cols, y_scale, x1_scale, x2_scale
    )
    # the pinned Cramer sequence — the oracle SQL (_OLS solve block in
    # workloads/ml_q.py) mirrors this parenthesization term for term;
    # edit both together
    det = (
        d["n"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["sx1"] * (d["sx1"] * d["s22"] - d["s12"] * d["sx2"])
        + d["sx2"] * (d["sx1"] * d["s12"] - d["s11"] * d["sx2"])
    )
    d0 = (
        d["sy"] * (d["s11"] * d["s22"] - d["s12"] * d["s12"])
        - d["sx1"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        + d["sx2"] * (d["s1y"] * d["s12"] - d["s11"] * d["s2y"])
    )
    d1 = (
        d["n"] * (d["s1y"] * d["s22"] - d["s12"] * d["s2y"])
        - d["sy"] * (d["sx1"] * d["s22"] - d["s12"] * d["sx2"])
        + d["sx2"] * (d["sx1"] * d["s2y"] - d["s1y"] * d["sx2"])
    )
    d2 = (
        d["n"] * (d["s11"] * d["s2y"] - d["s1y"] * d["s12"])
        - d["sx1"] * (d["sx1"] * d["s2y"] - d["s1y"] * d["sx2"])
        + d["sy"] * (d["sx1"] * d["s12"] - d["s11"] * d["sx2"])
    )
    # staged solve (see _reg_stage — try_divide rationale lives there;
    # the divide-by-zero guard was caught by
    # test_ols_singular_system_yields_nulls when the r2 bound joined
    # the CASE condition)
    s, D, (b0, b1, b2) = _reg_stage(m, d, group_cols, det, d0, d1, d2)
    ss_tot = D["syy"] - (D["sy"] * D["sy"]) / D["n"]
    ss_res = D["syy"] - (b0 * D["sy"] + b1 * D["s1y"] + b2 * D["s2y"])
    r2 = F.lit(1.0) - F.try_divide(ss_res, ss_tot)
    # singular AND near-singular guard — see _REG_BOUND
    _B = F.lit(_REG_BOUND)
    ok = (
        (F.col("det") != F.lit(0.0))
        & (F.abs(b0) < _B)
        & (F.abs(b1) < _B)
        & (F.abs(b2) < _B)
    )
    return _reg_select(s, group_cols, ok, b0, b1, b2, r2, ss_tot)


def grouped_ridge(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_cols: list[str],
    y_scale: int = 100,
    x1_scale: int = 1,
    x2_scale: int = 100,
    lam_num: int = 100,
    lam_den: int = 1,
) -> DataFrame:
    """Per-group RIDGE regression (two features + intercept, L2 penalty
    on the feature coefficients, intercept unpenalized) solved in closed
    form — grouped_ols generalized with the r9-verdict option's
    pinned-solve discipline (r10 verdict task 7).

    Same ten exact decimal(38,0) moments in ONE grouped aggregation
    (the 100 TB cost is one scan; the shuffle carries |groups| x 10
    decimals); the solve then runs Cramer on the RIDGE normal matrix

        [[n,   sx1,        sx2       ],
         [sx1, s11 + w*n,  s12       ],     w = lam_num / lam_den
         [sx2, s12,        s22 + w*n ]]

    in a FIXED double sequence the oracle SQL (_RIDGE_SQL in
    workloads/ml_q.py) mirrors term for term — edit both together. The
    penalty is PER-ROW scaled (``w*n``, the sklearn ``alpha*n`` /
    lambda-per-sample convention): s11/s22 grow linearly with corpus
    size, so a raw constant would shrink less the more data arrives —
    w*n keeps the shrinkage strength invariant as the same distribution
    scales from sf0.001 to 100 TB. ``w`` is in squared quantized-x
    units; w = 0 degenerates to OLS exactly (t11 = s11 + 0.0*n is
    bit-identical to s11 for the nonnegative moments here).

    Ridge R^2 is computed HONESTLY from the full quadratic form —
    ss_res = syy - 2*b'X'y + b'X'Xb with the RAW (unpenalized) X'X —
    because the OLS shortcut ss_res = syy - b'X'y relies on the normal
    equations holding at b, which a penalized solution violates.

    NULL semantics match grouped_ols: singular / near-singular (any
    |b| >= 1e12) and zero-variance-target groups yield NULL outputs in
    BOTH engines. With any w > 0 the ridge matrix is positive definite
    for n >= 1, so exactly-collinear features — NULL under OLS — get
    finite, defined coefficients (pinned by test).
    """
    if lam_den == 0:
        raise ValueError("lam_den must be nonzero")
    if lam_num < 0 or lam_den < 0:
        raise ValueError("ridge penalty must be nonnegative (w = lam_num/lam_den)")
    m, d = _reg_moments(
        df, y_col, x1_col, x2_col, group_cols, y_scale, x1_scale, x2_scale
    )
    # one pinned division, then one pinned mul/add per diagonal term
    w = F.lit(float(lam_num)).cast("double") / F.lit(float(lam_den)).cast(
        "double"
    )
    t11 = d["s11"] + w * d["n"]
    t22 = d["s22"] + w * d["n"]
    det = (
        d["n"] * (t11 * t22 - d["s12"] * d["s12"])
        - d["sx1"] * (d["sx1"] * t22 - d["s12"] * d["sx2"])
        + d["sx2"] * (d["sx1"] * d["s12"] - t11 * d["sx2"])
    )
    d0 = (
        d["sy"] * (t11 * t22 - d["s12"] * d["s12"])
        - d["sx1"] * (d["s1y"] * t22 - d["s12"] * d["s2y"])
        + d["sx2"] * (d["s1y"] * d["s12"] - t11 * d["s2y"])
    )
    d1 = (
        d["n"] * (d["s1y"] * t22 - d["s12"] * d["s2y"])
        - d["sy"] * (d["sx1"] * t22 - d["s12"] * d["sx2"])
        + d["sx2"] * (d["sx1"] * d["s2y"] - d["s1y"] * d["sx2"])
    )
    d2 = (
        d["n"] * (t11 * d["s2y"] - d["s1y"] * d["s12"])
        - d["sx1"] * (d["sx1"] * d["s2y"] - d["s1y"] * d["sx2"])
        + d["sy"] * (d["sx1"] * d["s12"] - t11 * d["sx2"])
    )
    # staged solve (see _reg_stage — same CSE-under-ANSI try_divide
    # rationale as grouped_ols)
    s, D, (b0, b1, b2) = _reg_stage(m, d, group_cols, det, d0, d1, d2)
    ss_tot = D["syy"] - (D["sy"] * D["sy"]) / D["n"]
    # full quadratic form with the RAW moments (see docstring)
    bxxb = (
        b0 * b0 * D["n"]
        + b1 * b1 * D["s11"]
        + b2 * b2 * D["s22"]
        + F.lit(2.0) * b0 * b1 * D["sx1"]
        + F.lit(2.0) * b0 * b2 * D["sx2"]
        + F.lit(2.0) * b1 * b2 * D["s12"]
    )
    ss_res = (
        D["syy"]
        - F.lit(2.0) * (b0 * D["sy"] + b1 * D["s1y"] + b2 * D["s2y"])
        + bxxb
    )
    r2 = F.lit(1.0) - F.try_divide(ss_res, ss_tot)
    _B = F.lit(_REG_BOUND)
    ok = (
        (F.col("det") != F.lit(0.0))
        & (F.abs(b0) < _B)
        & (F.abs(b1) < _B)
        & (F.abs(b2) < _B)
    )
    return _reg_select(s, group_cols, ok, b0, b1, b2, r2, ss_tot)
