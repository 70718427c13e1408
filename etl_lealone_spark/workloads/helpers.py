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


def persisted_state_root(
    sf_dir: str,
    tables: "tuple[str, ...]",
    spec: str,
    namespace: str,
) -> str:
    """Content-keyed persisted-state root under /tmp for workloads that
    build reusable on-disk state (bucketed layouts, snapshot histories,
    SCD2 state): keyed by the input tables' parquet fingerprints
    (path + size + mtime per part file) AND the builder's source code
    (``spec``), so regenerated testdata or a code change can never
    silently reuse stale state. One definition — the scd2/time-travel/
    bucketed workloads all key their roots through here."""
    import hashlib
    import os
    import tempfile

    parts_all = []
    for t in tables:
        p = os.path.join(os.path.realpath(sf_dir), f"{t}.parquet")
        parts = [p] if os.path.isfile(p) else sorted(
            os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
        ) if os.path.isdir(p) else []
        parts_all.append(
            p + "|" + ";".join(
                f"{os.path.getsize(f)}:{os.path.getmtime(f):.0f}" for f in parts
            )
        )
    key = hashlib.md5("|".join(parts_all + [spec]).encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), namespace, key)
