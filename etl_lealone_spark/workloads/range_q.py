"""Range-join workload: point-in-interval matching via bucketized
equi-join (operators/joins.py:range_join_bucketed).

The oracle expresses the SAME semantics as the naive BETWEEN theta
join — proving the bucketed rewrite finds every candidate exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import range_join_bucketed
from ..tables import load_tables
from . import workload
from .helpers import o_dsum


@workload(
    "range_join_events",
    f"""
    SELECT o_orderkey,
           count(*) AS n_pts,
           {o_dsum('l_quantity')} AS sum_qty
    FROM (SELECT o_orderkey, o_orderdate,
                 o_orderdate + INTERVAL 7 DAY AS end_ts
          FROM orders WHERE o_totalprice > 450000) i
    JOIN (SELECT l_shipdate, l_quantity
          FROM lineitem WHERE l_quantity > 45) p
      ON p.l_shipdate >= i.o_orderdate AND p.l_shipdate <= i.end_ts
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
    doc="Range join (point-in-interval): bucketized equi-join plan vs "
    "the oracle's naive BETWEEN theta join — identical matches, "
    "O(n+m) instead of O(n·m).",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    intervals = (
        t["orders"]
        .filter(F.col("o_totalprice") > 450000)
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("end_ts"),
        )
    )
    points = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 45)
        .select("l_shipdate", "l_quantity")
    )
    joined = range_join_bucketed(
        points, intervals, "l_shipdate", "o_orderdate", "end_ts", bucket_days=7
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
                "sum_qty"
            ),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# interval-overlap join: promo windows x order-fulfillment windows
# ---------------------------------------------------------------------------
@workload(
    "interval_overlap_orders",
    """
    WITH promo AS (
      SELECT o_orderkey AS promo_id,
             cast(o_orderdate as date) AS ps,
             cast(o_orderdate as date) + INTERVAL 21 DAY AS pe
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    win AS (
      SELECT o_orderkey,
             cast(o_orderdate as date) AS ws,
             cast(o_orderdate as date)
               + to_days(cast(o_orderkey % 14 + 2 as int)) AS we
      FROM orders WHERE o_totalprice > 300000
    )
    SELECT promo_id, count(*) AS n_overlaps,
           min(o_orderkey) AS first_order
    FROM promo JOIN win
      ON promo.ps <= win.we AND win.ws <= promo.pe
    GROUP BY promo_id
    """,
    doc="Interval-overlap join (both sides are date ranges): bucketized "
    "equi-join with exact-once reference-point ownership (no dedup "
    "stage) vs the oracle's naive theta join — identical matches, one "
    "shuffle instead of O(n*m).",
)
def interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import interval_overlap_join

    o = load_tables(spark, sf_dir)["orders"]
    promo = o.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("promo_id"),
        F.col("o_orderdate").cast("date").alias("ps"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 21 DAY")).alias(
            "pe"
        ),
    )
    win = o.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("ws"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 14 + 2).cast("int"),
        ).alias("we"),
    )
    joined = interval_overlap_join(promo, win, "ps", "pe", "ws", "we", bucket_days=7)
    return joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.min("o_orderkey").alias("first_order"),
    )
