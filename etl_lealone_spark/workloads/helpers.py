"""Cross-engine determinism helpers shared by all workloads."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column.

    Casting to decimal makes addition exact and associative, so the result
    is identical whether computed across 1 partition (DuckDB) or 1000
    (Spark). The final cast back to double keeps the output schema simple.
    Oracle-side equivalent: ``cast(sum(cast(x as decimal(p,s))) as double)``.
    """
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum, then one double division.

    ``cast(sum(decimal) as double) / count`` is a single IEEE division of
    deterministic operands — identical across engines and partitionings.
    """
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double") / F.count(col)


def o_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    """Oracle-SQL text matching :func:`dsum`."""
    return f"cast(sum(cast({expr} as decimal({precision},{scale}))) as double)"


def o_davg(expr: str, scale: int = 2, precision: int = 18) -> str:
    """Oracle-SQL text matching :func:`davg`."""
    return (
        f"cast(sum(cast({expr} as decimal({precision},{scale}))) as double)"
        f" / count({expr})"
    )
