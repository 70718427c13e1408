"""Fourth core batch: theta (non-equi) join, view scans with pushed
predicates — closing out the §2.3/§2.10 inventory."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from . import workload
from .helpers import dsum, o_dsum


# ---------------------------------------------------------------------------
# theta join — arbitrary non-equi ON condition (TableFilter.joinCondition
# :79). Spark executes as broadcast-nested-loop when one side is small —
# keep the small side (price bands) tiny and broadcast it.
# ---------------------------------------------------------------------------
@workload(
    "join_theta_bands",
    f"""
    WITH bands AS (
      SELECT * FROM (VALUES ('low', 0.0, 20.0), ('mid', 20.0, 40.0),
                            ('high', 40.0, 1e9)) AS b(band, lo, hi)
    )
    SELECT band, count(*) AS n, {o_dsum('l_extendedprice')} AS total
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    doc="Theta join: range-band condition (non-equi ON, "
    "TableFilter.joinCondition:79) — tiny side broadcast → BNLJ.",
)
def join_theta_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    bands = spark.createDataFrame(
        [("low", 0.0, 20.0), ("mid", 20.0, 40.0), ("high", 40.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice")).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# view scan with predicate pushed through the view (ViewIndex.java:74-105)
# ---------------------------------------------------------------------------
@workload(
    "view_predicate_pushdown",
    f"""
    WITH order_summary AS (
      SELECT o_custkey, count(*) AS n_orders,
             {o_dsum('o_totalprice')} AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT count(*) AS n_big_customers, {o_dsum('total', 2)} AS grand_total
    FROM order_summary WHERE total > 500000
    """,
    doc="View with an outer predicate (ViewIndex.java:74-105): Catalyst "
    "pushes the filter through the view body automatically.",
)
def view_predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("orders_vp")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW order_summary_vp AS
        SELECT o_custkey, count(*) AS n_orders,
               {o_dsum('o_totalprice')} AS total
        FROM orders_vp GROUP BY o_custkey
        """
    )
    return spark.sql(
        f"""
        SELECT count(*) AS n_big_customers, {o_dsum('total', 2)} AS grand_total
        FROM order_summary_vp WHERE total > 500000
        """
    )
