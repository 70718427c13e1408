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


# ---------------------------------------------------------------------------
# CUBE / GROUPING SETS — extensions beyond ROLLUP (§2.4 note: the
# reference has no grouping-sets surface at all).
# ---------------------------------------------------------------------------
@workload(
    "cube_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
           {o_dsum('l_quantity')} AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE with GROUPING() disambiguation (extension).",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n"
    )


@workload(
    "grouping_sets_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS list (extension).",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(dsum(F.col("l_quantity")).alias("sum_qty"))


# ---------------------------------------------------------------------------
# RANGE-frame window — value-based frames are deterministic even with
# duplicate ORDER BY keys (every peer of the boundary value is included),
# unlike ROWS frames. Decimal-cast sums keep the frame aggregation exact.
# ---------------------------------------------------------------------------
@workload(
    "window_range_frame",
    """
    SELECT o_orderkey, o_orderpriority,
           cast(sum(cast(o_totalprice as decimal(18,2)))
                OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) as double)
             AS rolling_total
    FROM orders
    """,
    doc="RANGE BETWEEN n PRECEDING window (value-based frame, extension).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_total"),
    )


# ---------------------------------------------------------------------------
# Named ICU collation at a compare site (reference CompareMode.java /
# CompareModeIcu4J.java; SET COLLATION in dml/Set.java). Both engines
# embed ICU, so German-collated ORDER over a case-mixed vocabulary is
# recomputed identically: ICU primary weights interleave 'Upper' words
# with lowercase (binary would put ALL uppercase first). Case variation
# is derived deterministically (upper() on even-length tokens) because
# the synthetic corpus is all-lowercase; the binary token is the
# tiebreak so the total order is engine-independent even where a locale
# tailoring could disagree on equal-primary strings.
# ---------------------------------------------------------------------------
@workload(
    "collation_orderby",
    """
    WITH toks AS (
      SELECT DISTINCT unnest(string_split_regex(text, '[^a-z]+')) AS tok
      FROM documents
    ),
    variants AS (
      SELECT CASE WHEN length(tok) % 2 = 0 THEN upper(tok) ELSE tok END AS w
      FROM toks WHERE tok <> ''
    )
    SELECT w, rnk FROM (
      SELECT w, row_number() OVER (ORDER BY w COLLATE de, w) AS rnk
      FROM variants
    ) t WHERE rnk <= 200
    """,
    doc="German ICU collation ORDER BY, driver-oracled: Spark 4 native "
    "collation vs DuckDB's built-in ICU — ranks must match bit-for-bit.",
)
def collation_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_tables(spark, sf_dir)["documents"]
    variants = (
        d.select(F.explode(F.split(F.col("text"), "[^a-z]+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
        .select(
            F.when(F.length("tok") % 2 == 0, F.upper("tok"))
            .otherwise(F.col("tok"))
            .alias("w")
        )
    )
    w = Window.orderBy(F.collate(F.col("w"), "de"), F.col("w"))
    return (
        variants.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 200)
        .select("w", "rnk")
    )
