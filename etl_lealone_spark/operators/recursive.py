"""Recursive CTE (WITH RECURSIVE ... UNION ALL) as a driver-side fixpoint.

The reference supports single recursive CTEs, UNION ALL only, executed by
re-running the view query until no new rows appear
(reference: Parser.java:4593-4646, ViewIndex.java:107-210,
TableView.java:48,56). Spark (<4 recursion support) has no recursive CTE,
so we run the standard semi-naive iteration on the driver:

    result = base
    delta  = base
    while delta nonempty and depth < max_depth:
        delta = step(delta) [minus already-seen rows when distinct]
        result = result UNION ALL delta

Scale notes: each iteration is a normal distributed job. ``checkpoint_every``
truncates the ever-growing lineage (local checkpoint) so plan size stays
bounded — without it iteration 50 re-plans 50 unioned scans.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    distinct: bool = False,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Evaluate a recursive CTE.

    ``base`` is the anchor query; ``step(delta)`` is the recursive member
    applied to the PREVIOUS iteration's new rows (semi-naive: linear
    recursion only, which is also the reference's restriction —
    ViewIndex.java:172-176 rejects non-UNION-ALL recursion).

    ``distinct=True`` gives UNION (set) semantics: rows already produced
    are subtracted from each delta, which is also the termination proof
    for cyclic graphs.
    """
    spark = base.sparkSession
    result = base
    delta = base
    for i in range(max_iterations):
        delta = step(delta)
        if distinct:
            delta = delta.distinct().exceptAll(result).distinct()
        if (i + 1) % checkpoint_every == 0:
            delta = delta.localCheckpoint(eager=True)
            result = result.localCheckpoint(eager=True)
        if delta.isEmpty():
            return result
        result = result.unionAll(delta)
    raise RuntimeError(
        f"recursive_cte did not reach a fixpoint in {max_iterations} iterations"
    )
