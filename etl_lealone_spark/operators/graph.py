"""Graph algorithms over edge lists (extension surface).

Connected components live in operators/dedup.py (they serve dedup
clustering); degree and triangle counting are workload-level
compositions (workloads/graph_q.py). This module adds the iterative
mass-propagation class: PageRank in exact fixed-point integer
arithmetic.

Why fixed-point: a float PageRank sums per-node contributions in
partition order — every rerun and every repartition drifts in the last
ulps, so ranks are not reproducible and top-k boundaries flap. Integer
mass (scaled by 1e9) makes every iteration exact and associative:
ranks are bit-identical across partitionings, reruns, and engines
(pinned by test against a pure-Python reference).

Scale shape per iteration: one join of the rank table onto the edge
list keyed by source (the rank table is node-sized — broadcast it when
nodes ≪ edges, else it is a keyed shuffle), one groupBy-sum on the
destination, plus two tiny aggregates (dangling mass, node count —
1-row each). O(iterations) rounds with checkpointed lineage, the same
loop discipline as connected_components and the recursive-CTE driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # 1e9 fixed-point mass units per unit of rank


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, rank_x1e9) after ``iters`` rounds of damped propagation.

    Semantics (all arithmetic exact integer):
    - every node starts with ``SCALE`` mass;
    - each round a node sends ``damping`` of its mass split equally over
      its out-edges (floor division; the sub-unit remainder of each
      split stays with the sender's teleport share rather than being
      amplified);
    - dangling-node mass is redistributed equally to all nodes;
    - teleport share ``(1-damping)`` of the total mass returns equally.

    ``damping`` is applied as an exact rational (multiply-then-floor-div
    by 1000), so the whole computation stays in bigints.
    """
    d_num = int(round(damping * 1000))
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:  # empty edge list -> empty rank table, same schema
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank_x1e9")
        )
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("r"))
    total = n * SCALE

    for i in range(iters):
        # exact integer arithmetic everywhere: SQL `div` (long integer
        # division), never `/` (double — last-ulp drift near exact
        # quotients would break bit-reproducibility)
        rd = (
            ranks.join(outdeg, ranks["node"] == outdeg["s"], "left")
            .select("node", "r", F.coalesce("deg", F.lit(0)).alias("deg"))
            .withColumn("dm", F.expr(f"(r * {d_num}) div 1000"))
            .withColumn("share", F.expr("CASE WHEN deg > 0 THEN dm div deg ELSE 0 END"))
        )
        contrib = (
            e.join(
                rd.filter(F.col("deg") > 0).select(
                    F.col("node").alias("s"), "share"
                ),
                "s",
            )
            .groupBy("t")
            .agg(F.sum("share").alias("inflow"))
        )
        # one aggregate pass: total mass actually sent along edges
        # (share*deg, after floor losses) — everything else teleports,
        # so the balance stays exact: dangling mass, damping remainder,
        # and floor dust all return through the uniform base share
        sent = rd.agg(
            F.coalesce(F.sum(F.col("share") * F.col("deg")), F.lit(0))
        ).collect()[0][0]
        base = (int(total) - int(sent)) // n
        ranks = nodes.join(contrib, nodes["node"] == contrib["t"], "left").select(
            "node",
            (F.coalesce("inflow", F.lit(0)) + F.lit(base).cast("long")).alias("r"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_x1e9"))
