"""Recursive CTE workloads (SURVEY.md §2.10) — driver-side fixpoint loop
vs DuckDB's native WITH RECURSIVE oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.recursive import recursive_cte
from . import workload


@workload(
    "recursive_series",
    """
    WITH RECURSIVE r(n) AS (
      SELECT 1
      UNION ALL
      SELECT n + 1 FROM r WHERE n < 100
    )
    SELECT count(*) AS cnt, cast(sum(n) as bigint) AS total FROM r
    """,
    doc="WITH RECURSIVE number series 1..100 (ViewIndex.java:107-210 "
    "recursion → driver fixpoint loop).",
)
def recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = spark.range(1, 2).select(F.col("id").cast("int").alias("n"))
    result = recursive_cte(
        base,
        lambda d: d.filter(F.col("n") < 100).select((F.col("n") + 1).alias("n")),
        max_iterations=128,
    )
    return result.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").cast("bigint").alias("total"),
    )


@workload(
    "recursive_tree_depth",
    """
    WITH RECURSIVE edges AS (
      SELECT range AS child, cast(floor(range / 2) as bigint) AS parent
      FROM range(2, 1001)
    ),
    d(node, depth) AS (
      SELECT cast(1 as bigint), 0
      UNION ALL
      SELECT e.child, d.depth + 1 FROM d JOIN edges e ON e.parent = d.node
    )
    SELECT depth, count(*) AS n_nodes FROM d GROUP BY depth
    """,
    doc="Transitive closure over a binary-heap edge table: node count per "
    "depth (recursive join member).",
)
def recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = spark.range(2, 1001).select(
        F.col("id").alias("child"), F.floor(F.col("id") / 2).cast("bigint").alias("parent")
    )
    base = spark.createDataFrame([(1, 0)], schema="node long, depth int")
    result = recursive_cte(
        base,
        lambda d: d.join(edges, edges.parent == d.node).select(
            F.col("child").alias("node"), (F.col("depth") + 1).alias("depth")
        ),
        max_iterations=32,
    )
    return result.groupBy("depth").agg(F.count(F.lit(1)).alias("n_nodes"))
