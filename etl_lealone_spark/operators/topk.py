"""Threshold-pruned exact top-k — the Spark answer to vectorized top-k.

``ORDER BY x LIMIT k`` plans as ``TakeOrderedAndProject``: a per-row
bounded-heap insert with an UnsafeRow comparator, OUTSIDE whole-stage
codegen. Engines with vectorized top-k (DuckDB, and the reference's
BTree-backed ORDER BY — sevenfang/etl-Lealone serves W5 from its
primary-key index) instead push a dynamic threshold into the scan: once
the heap is full, batches are first filtered by the current k-th value,
so almost every row is rejected by a cheap vectorized compare rather
than a heap probe. Measured at 5e8 rows this is the difference between
8.3s (heap) and ~2s (DuckDB).

Spark has no dynamic scan threshold, but the same pruning decomposes
into two whole-stage-codegen passes:

1. **threshold pass** — a Bernoulli sample of the primary sort column,
   top-``sample_k`` of the sample; the smallest of those is ``tau``.
   With ``sample_k`` = 256 at any corpus size, ~256/fraction rows are
   expected above ``tau`` — a tiny, size-independent candidate set.
2. **candidate pass** — ``filter(col >= tau)`` (codegen, and pushed to
   parquet row-group statistics, so sorted/clustered layouts skip whole
   row groups) feeding TakeOrdered over the surviving sliver.

Exactness does NOT depend on the sample: if the candidate pass returns
``k + offset`` rows, every excluded row (strictly beyond ``tau``, or
NULL in a NULLS-LAST ordering) sorts after the ones kept, so the result
equals the plain plan's; any shortfall falls back to the plain plan.
A badly lucky sample therefore degrades to the original cost, never to
a wrong answer.

Scale shape: both passes are single scans with no shuffle (TakeOrdered
merges per-partition heaps driver-side, bounded by k+offset per
partition); the sample pass reads ONE column. At 1000 executors the
threshold pass is the same one-column scan, and the candidate pass
prunes by row-group stats exactly as it does locally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def threshold_topk(
    df: DataFrame,
    primary: str,
    k: int,
    offset: int = 0,
    descending: bool = True,
    tiebreak: list[Column] | None = None,
    sample_fraction: float = 1e-3,
    sample_k: int = 256,
    seed: int = 7,
) -> DataFrame:
    """Exact ``df.orderBy(primary [desc], *tiebreak).offset(offset)
    .limit(k)`` via sampled-threshold pruning.

    ``primary`` must be an orderable column (numeric / date / string);
    default null ordering applies (DESC -> NULLS LAST, ASC -> NULLS
    FIRST), matching ``Column.desc()`` / ``.asc()``. The result is a
    small materialized DataFrame (k rows) with ``df``'s schema.
    """
    if k < 0 or offset < 0:
        raise ValueError("threshold_topk: k and offset must be >= 0")
    n_take = k + offset
    primary_sorted = (
        F.col(primary).desc() if descending else F.col(primary).asc()
    )
    order = [primary_sorted] + list(tiebreak or [])
    spark = df.sparkSession

    def plain() -> DataFrame:
        out = df.orderBy(*order).offset(offset).limit(k)
        return spark.createDataFrame(out.collect(), df.schema)

    if n_take == 0:
        return df.limit(0)

    samp_rows = (
        df.select(F.col(primary).alias("p"))
        .filter(F.col("p").isNotNull())
        .sample(False, sample_fraction, seed)
        .orderBy(F.col("p").desc() if descending else F.col("p").asc())
        .limit(sample_k)
        .collect()
    )
    if len(samp_rows) < sample_k:
        # sample too small to bound confidently (tiny input) — the plain
        # plan on a tiny input is already cheap
        return plain()
    tau = samp_rows[-1]["p"]
    if descending:
        cand = df.filter(F.col(primary) >= tau)  # NULLS LAST: drop nulls
    else:
        # ASC is NULLS FIRST: nulls belong to the top, keep them
        cand = df.filter(
            (F.col(primary) <= tau) | F.col(primary).isNull()
        )
    top = cand.orderBy(*order).limit(n_take).collect()
    if len(top) < n_take:
        return plain()
    return spark.createDataFrame(top[offset:], df.schema)
