"""Graph-analytics workloads over the part co-occurrence graph
(extension surface — the reference has no graph operators; the engine
already runs connected components for dedup clustering, these add the
other two standard distributed-graph statistics).

Graph: nodes = parts, edge (a, b) iff some order contains high-quantity
lines of both parts. Edge derivation is an order-bounded self-join —
each order contributes at most C(13, 2) pairs, so the pair explosion is
bounded per key and the only corpus-scale cost is one distinct shuffle
on the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from . import workload

_EDGE_SQL = """
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ),
    e AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS pa,
             greatest(a.l_partkey, b.l_partkey) AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p1"))
    b = li.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, (F.col("k") == F.col("k2")) & (F.col("p1") < F.col("p2")))
        .select(
            F.least("p1", "p2").alias("pa"), F.greatest("p1", "p2").alias("pb")
        )
        .distinct()
    )


@workload(
    "graph_degree_topk",
    _EDGE_SQL
    + """
    , deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e
      ) GROUP BY node
    )
    SELECT node, degree FROM deg
    ORDER BY degree DESC, node
    LIMIT 20
    """,
    doc="Co-occurrence graph degree: hubs of the basket graph. One "
    "bounded pair-explosion + distinct + one keyed agg.",
)
def graph_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    return (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.desc("degree"), "node")
        .limit(20)
    )


@workload(
    "graph_triangle_count",
    _EDGE_SQL
    + """
    SELECT (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*)
            FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                      JOIN e e3 ON e1.pa = e3.pa AND e2.pb = e3.pb)
             AS n_triangles
    """,
    doc="Triangle counting via the ordered node-iterator join "
    "(a<b<c orientation, each triangle counted once). Two equi-joins "
    "on node keys; at extreme skew orient edges low-degree -> "
    "high-degree so wedge counts stay bounded.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir).localCheckpoint()
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b2"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a3"), F.col("pb").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


# ---------------------------------------------------------------------------
# fixed-point PageRank over the symmetric co-occurrence graph
# ---------------------------------------------------------------------------
def _pagerank_oracle(iters: int = 4, d_num: int = 850) -> str:
    """Unrolled-iteration DuckDB oracle replaying the EXACT integer
    arithmetic of operators.graph.pagerank (// is integer division on
    DuckDB bigints; all masses stay positive)."""
    cte = (
        _EDGE_SQL
        + """
    , edges AS (
      SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb AS s, pa AS t FROM e
    ),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    outdeg AS (SELECT s AS node, count(*) AS deg FROM edges GROUP BY s),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1000000000::BIGINT AS r FROM nodes)
    """
    )
    for i in range(iters):
        cte += f""",
    s{i} AS (
      SELECT r{i}.node, o.deg, (((r{i}.r * {d_num}) // 1000) // o.deg) AS share
      FROM r{i} JOIN outdeg o ON r{i}.node = o.node
    ),
    b{i} AS (
      SELECT ((SELECT n FROM nn) * 1000000000 - COALESCE(sum(share * deg), 0))
             // (SELECT n FROM nn) AS base
      FROM s{i}
    ),
    c{i} AS (
      SELECT ed.t AS node, sum(s{i}.share) AS inflow
      FROM edges ed JOIN s{i} ON ed.s = s{i}.node
      GROUP BY ed.t
    ),
    r{i + 1} AS (
      SELECT n.node,
             (COALESCE(c{i}.inflow, 0) + (SELECT base FROM b{i}))::BIGINT AS r
      FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node
    )"""
    return (
        cte
        + f"""
    SELECT node, r AS rank_x1e9 FROM r{iters}
    ORDER BY rank_x1e9 DESC, node
    LIMIT 20
    """
    )


@workload(
    "graph_pagerank",
    _pagerank_oracle(),
    doc="Fixed-point PageRank (4 rounds, damping 0.85) over the "
    "symmetric co-occurrence graph — exact integer mass propagation, "
    "bit-identical across engines/partitionings; one edge-keyed join + "
    "one destination agg per round (operators/graph.py).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    e = _edges(spark, sf_dir)
    sym = e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
        e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    return (
        pagerank(sym, iters=4)
        .orderBy(F.desc("rank_x1e9"), "node")
        .limit(20)
    )
