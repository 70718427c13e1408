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


def _dot_literal(vec: Column, v: list[int]) -> Column:
    """Exact bigint dot product of an int-vector column with a
    Python-literal vector (inlined constants, stays in codegen)."""
    lit_vec = F.array(*[F.lit(int(c)).cast("bigint") for c in v])
    return F.aggregate(
        F.zip_with(vec, lit_vec, lambda x, c: x * c),
        F.lit(0).cast("bigint"),
        lambda acc, val: acc + val,
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
    mu_lit = F.array(*[F.lit(mu[p]).cast("bigint") for p in range(dim)])
    c = q.select(
        "vec_id",
        "label",
        F.zip_with("qvec", mu_lit, lambda x, m: x - m).alias("cvec"),
    )
    v = [_V_SCALE] * dim
    for _ in range(iters):
        y = c.select(
            "label",
            "cvec",
            F.floor(
                _dot_literal(F.col("cvec"), v).cast("double")
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
            _dot_literal(F.col("cvec"), v).cast("double") / float(_V_SCALE)
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
