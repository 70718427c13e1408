"""Driver-facing workload inventory.

Each workload pairs a Spark DataFrame builder with (where expressible) an
equivalent ANSI-SQL oracle string for DuckDB. The driver runs both at
sf=0.01 and compares row-count + schema + order-insensitive value hash
(see repo root ``__spark_entry__.py``).

Cross-engine determinism rules every workload in this package follows:

1. **No raw double aggregation.** ``sum(double)`` is order-dependent, so a
   32-partition Spark sum will not bit-match DuckDB's serial sum. Money-ish
   doubles are cast to ``decimal(18,2)`` (or wider) before SUM — decimal
   addition is exact and associative — then the final value is cast back to
   double in BOTH engines so values and schemas line up.
2. **Deterministic LIMIT.** Any LIMIT/top-k orders by a unique key chain so
   ties cannot reshuffle rows between engines.
3. **Aliases everywhere.** The driver sorts columns by name before hashing;
   every computed column carries the same alias in the Spark build and the
   oracle SQL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Workload:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, Workload] = {}


def workload(name: str, oracle: Optional[str], doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Workload(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_workloads() -> dict[str, Workload]:
    # Import side-effect registration; keep imports here so a broken module
    # surfaces at driver time, not package-import time.
    from . import core_sql  # noqa: F401
    from . import core_sql2  # noqa: F401
    from . import core_sql3  # noqa: F401
    from . import asof_q  # noqa: F401
    from . import core_sql4  # noqa: F401
    from . import json_q  # noqa: F401
    from . import functions_q  # noqa: F401
    from . import dml_q  # noqa: F401
    from . import recursive_q  # noqa: F401
    from . import dedup_q  # noqa: F401
    from . import similarity_q  # noqa: F401
    from . import text_q  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: w.build for name, w in all_workloads().items()}


def oracle_sql() -> dict[str, str]:
    return {name: w.oracle for name, w in all_workloads().items() if w.oracle}
