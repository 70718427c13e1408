"""Physical-plan inspection helpers.

The reference's optimizer evidence is its cost-based join order + index
selection (SURVEY.md §4.1); ours is the Catalyst physical plan. These
helpers extract the properties that matter at 100 TB — broadcast vs
shuffle joins, filter/column pushdown into the parquet scan, partial
(map-side) aggregation, top-k via TakeOrderedAndProject, and the number
of exchanges (shuffles) — so tests can pin them and regressions surface
as test failures, not cluster bills.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate partial_...)."""
    s = explain_str(df)
    return "partial_" in s or "partial" in s.lower()


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    s = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", s))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    s = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", s):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (column pruning
    evidence: a 2-column projection must not read 16 columns)."""
    s = explain_str(df)
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", s):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans
