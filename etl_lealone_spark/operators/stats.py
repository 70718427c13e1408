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

Width headroom: moments accumulate in decimal(38,0) (Spark) / HUGEINT
(DuckDB oracle) — exact to 1e38. With cent-scaled prices (≤1e7 units)
the binding term is n*Sxy ≤ n^2 * 1e14, safe to n ≈ 1e12 rows; past
that, pre-aggregate per shard or drop to per-column z-scales chosen so
products stay inside the window (documented, not silently truncated).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _q(col: str, scale: int) -> Column:
    """Exact integer quantization: floor(x*scale + 0.5) as decimal(38,0).

    The inputs are money/measure doubles that ARE exact multiples of
    1/scale (parquet carries 2-decimal values); the floor(+0.5) form is
    the repo-wide tie-safe rounding."""
    return (
        F.floor(F.col(col) * float(scale) + F.lit(0.5)).cast("bigint").cast(_DEC)
    )


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
        aggs.append(F.sum(_q(c, scale)).alias(f"s_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(_q(a, scale) * _q(b, scale)).alias(f"s_{a}_{b}"))
    for c in cols:
        aggs.append(F.sum(_q(c, scale) * _q(c, scale)).alias(f"s_{c}_{c}"))
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
                F.floor(r * 1000000.0 + F.lit(0.5)).cast("bigint").alias(
                    "corr_x1e6"
                ),
            )
        )
    return (
        m.select(F.explode(F.array(*pair_structs)).alias("p"))
        .select("p.col_a", "p.col_b", "p.n_rows", "p.corr_x1e6")
        .orderBy("col_a", "col_b")
    )
