"""Core relational workloads: SURVEY.md §2.1–§2.7, §2.10.

Every workload here exercises an operator family from the reference's
inventory (file:line cites inline) as an idiomatic Catalyst plan:
filters/projections push to the parquet scan, small dimensions broadcast,
aggregations run partial+final, and limits compile to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_tables
from . import workload
from .helpers import davg, dsum, o_davg, o_dsum


# ---------------------------------------------------------------------------
# §2.4 aggregation — hash agg w/ HAVING (reference: Select.java:995-1067,
# HAVING as hidden select expr Select.java:208-214)
# ---------------------------------------------------------------------------
@workload(
    "agg_groupby_having",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           {o_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {o_davg('l_quantity')} AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) > 10
    """,
    doc="TPC-H Q1 shape: multi-agg groupBy + HAVING (Select.java:995-1067).",
)
def agg_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "sum_disc_price"
            ),
            davg(F.col("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .filter(F.col("count_order") > 10)
    )


# ---------------------------------------------------------------------------
# §2.2 predicates: BETWEEN / IN-list / LIKE / IS NULL / AND-OR
# (reference: Comparison.java:32-95, ConditionIn.java:25, CompareLike.java:29)
# ---------------------------------------------------------------------------
@workload(
    "filter_predicates",
    f"""
    SELECT o_orderpriority,
           count(*) AS n,
           {o_dsum('o_totalprice')} AS total
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 200000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
    GROUP BY o_orderpriority
    """,
    doc="BETWEEN + IN + LIKE + IS NOT NULL pushed to the parquet scan.",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.filter(
            F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_custkey").isNotNull()
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


# ---------------------------------------------------------------------------
# §2.3 joins — inner equi-join chain with broadcast dims.
# Reference executes ALL joins as index nested-loop (TableFilter.java:324-407);
# here Catalyst picks broadcast-hash for the small sides.
# ---------------------------------------------------------------------------
@workload(
    "join_inner_agg",
    f"""
    SELECT n_name,
           {o_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 5-way join, dims broadcast, revenue per nation.",
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 LEFT OUTER JOIN w/ NULL-row extension (TableFilter.java:414-425)
# ---------------------------------------------------------------------------
@workload(
    "join_left_outer",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="LEFT JOIN null extension: customers with zero orders keep n_orders=0.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# §2.3 RIGHT OUTER JOIN — the reference parses RIGHT then swaps sides to
# execute as LEFT (Parser.java:1780-1798); Spark supports it natively.
# ---------------------------------------------------------------------------
@workload(
    "join_right_outer",
    """
    SELECT n_name, count(c_custkey) AS n_customers
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="RIGHT JOIN (reference rewrites to swapped LEFT, Parser.java:1780).",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# §2.3 FULL OUTER JOIN — unsupported in the reference (syntax error at
# Parser.java:1815-1816); exposed here as an engine extension.
# ---------------------------------------------------------------------------
@workload(
    "join_full_outer",
    """
    WITH a AS (SELECT o_custkey AS k, count(*) AS n_o FROM orders
               WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         b AS (SELECT o_custkey AS k, count(*) AS n_p FROM orders
               WHERE o_orderstatus = 'P' GROUP BY o_custkey)
    SELECT coalesce(a.k, b.k) AS custkey,
           coalesce(n_o, 0) AS n_final, coalesce(n_p, 0) AS n_pending
    FROM a FULL OUTER JOIN b ON a.k = b.k
    """,
    doc="FULL OUTER JOIN extension (reference errors: Parser.java:1815).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    a = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "P")
        .groupBy(F.col("o_custkey").alias("k2"))
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    return a.join(b, a.k == b.k2, "full").select(
        F.coalesce(a.k, b.k2).alias("custkey"),
        F.coalesce(F.col("n_o"), F.lit(0)).alias("n_final"),
        F.coalesce(F.col("n_p"), F.lit(0)).alias("n_pending"),
    )


# ---------------------------------------------------------------------------
# §2.3 CROSS JOIN (Parser.java:1846-1855)
# ---------------------------------------------------------------------------
@workload(
    "join_cross",
    """
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
    doc="CROSS JOIN: 5 regions × 25 nations = 125 rows.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


# ---------------------------------------------------------------------------
# §2.3 NATURAL JOIN — common columns equated and deduplicated
# (Parser.java:1856+, Select.java:313-326)
# ---------------------------------------------------------------------------
@workload(
    "join_natural",
    """
    SELECT regionkey, r.r_name AS region_name, count(*) AS n_nations
    FROM (SELECT r_regionkey AS regionkey, r_name FROM region) r
    JOIN (SELECT n_regionkey AS regionkey, n_name FROM nation) n
    USING (regionkey)
    GROUP BY regionkey, r.r_name
    """,
    doc="NATURAL/USING join: shared column equated once, emitted once.",
)
def join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    r = t["region"].select(F.col("r_regionkey").alias("regionkey"), "r_name")
    n = t["nation"].select(F.col("n_regionkey").alias("regionkey"), "n_name")
    return (
        r.join(n, ["regionkey"])  # USING-style: one regionkey column out
        .groupBy("regionkey", F.col("r_name").alias("region_name"))
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


# ---------------------------------------------------------------------------
# §2.2 IN (SELECT) → left-semi join (ConditionInSelect.java:26)
# ---------------------------------------------------------------------------
@workload(
    "semi_join_in_subquery",
    f"""
    SELECT count(*) AS n, {o_dsum('l_extendedprice')} AS total
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
    """,
    doc="IN (SELECT): compiled to left-semi join (ConditionInSelect.java:26).",
)
def semi_join_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    small_parts = t["part"].filter(F.col("p_size") < 10).select("p_partkey")
    return (
        t["lineitem"]
        .join(
            small_parts,
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice")).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 EXISTS / NOT EXISTS → semi/anti join (ConditionExists.java:22)
# ---------------------------------------------------------------------------
@workload(
    "anti_join_not_exists",
    """
    SELECT count(*) AS n_customers_without_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="NOT EXISTS: left-anti join (ConditionExists.java:22).",
)
def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


# ---------------------------------------------------------------------------
# §2.10 scalar subquery (Subquery.java:27)
# ---------------------------------------------------------------------------
@workload(
    "scalar_subquery",
    f"""
    SELECT count(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT {o_davg('o_totalprice')} FROM orders)
    """,
    doc="Scalar subquery: orders above the average total price.",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT count(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT {o_davg('o_totalprice')} FROM orders)
        """
    )


# ---------------------------------------------------------------------------
# §2.7 set operations (SelectUnion.java:43-63,164-241)
# ---------------------------------------------------------------------------
def _segments(spark: SparkSession, sf_dir: str):
    c = load_tables(spark, sf_dir)["customer"]
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    return a, b


_SEG_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SEG_B = "SELECT c_custkey FROM customer WHERE c_acctbal > 0"


@workload(
    "setop_union",
    f"SELECT count(*) AS n FROM (({_SEG_A}) UNION ({_SEG_B})) u",
    doc="UNION dedups (SelectUnion.java:164-241).",
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _segments(spark, sf_dir)
    return a.union(b).distinct().agg(F.count(F.lit(1)).alias("n"))


@workload(
    "setop_union_all",
    f"SELECT count(*) AS n FROM (({_SEG_A}) UNION ALL ({_SEG_B})) u",
    doc="UNION ALL keeps duplicates.",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _segments(spark, sf_dir)
    return a.union(b).agg(F.count(F.lit(1)).alias("n"))


@workload(
    "setop_except",
    f"SELECT count(*) AS n FROM (({_SEG_A}) EXCEPT ({_SEG_B})) u",
    doc="EXCEPT distinct semantics (SelectUnion.java:216-224).",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _segments(spark, sf_dir)
    return a.exceptAll(b).distinct().agg(F.count(F.lit(1)).alias("n"))


@workload(
    "setop_intersect",
    f"SELECT count(*) AS n FROM (({_SEG_A}) INTERSECT ({_SEG_B})) u",
    doc="INTERSECT distinct semantics.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _segments(spark, sf_dir)
    return a.intersect(b).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# §2.4 DISTINCT (Select.optimizeDistinct:426-491 → df.distinct)
# ---------------------------------------------------------------------------
@workload(
    "distinct_multi",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="Multi-column DISTINCT.",
)
def distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# §2.6 ORDER BY + LIMIT + OFFSET → TakeOrderedAndProject
# (SortOrder.java:185-205 top-k; LocalResult.applyLimit/applyOffset)
# ---------------------------------------------------------------------------
@workload(
    "orderby_limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 5
    """,
    doc="Top-k with offset; unique-key tie-break for determinism.",
)
def orderby_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(10)
    )


@workload(
    "orderby_limit_threshold",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 5
    """,
    doc="The same top-k+offset served by the threshold-pruned strategy "
    "(operators/topk.threshold_topk): sampled tau bound -> codegen "
    "filter -> tiny sort; exact by construction with a verified "
    "fallback. At 5e8 rows this flips W5 from 3.6x slower than the "
    "vectorized-top-k baseline to 0.7x (Spark ahead); the oracle pins "
    "it row-identical to the plain ORDER BY plan.",
)
def orderby_limit_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import threshold_topk

    o = load_tables(spark, sf_dir)["orders"]
    # sample sized so the THRESHOLD path (not the tiny-input fallback)
    # executes at the driver's sf0.001-0.01 row counts
    return threshold_topk(
        o.select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        k=10,
        offset=5,
        descending=True,
        tiebreak=[F.col("o_orderkey")],
        sample_fraction=0.2,
        sample_k=64,
    )


# ---------------------------------------------------------------------------
# §2.6 ORDER BY w/ NULLS FIRST/LAST (SortOrder.java:28-50)
# ---------------------------------------------------------------------------
@workload(
    "orderby_nulls",
    """
    SELECT k, v FROM (
      SELECT o_custkey AS k,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey <= 200
    ) t
    ORDER BY v DESC NULLS FIRST, k
    LIMIT 20
    """,
    doc="NULLS FIRST ordering flags (SortOrder.java:28-50).",
)
def orderby_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    t = o.filter(F.col("o_orderkey") <= 200).select(
        F.col("o_custkey").alias("k"),
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("v"),
    )
    return t.orderBy(F.col("v").desc_nulls_first(), F.col("k")).limit(20)


# ---------------------------------------------------------------------------
# §2.5 ROWNUM / ROW_NUMBER (Rownum.java:21-31) — reference numbers rows in
# scan order (pre-sort); we pin a documented deterministic order (PK).
# ---------------------------------------------------------------------------
@workload(
    "rownum_row_number",
    """
    SELECT rn, o_orderkey FROM (
      SELECT row_number() OVER (ORDER BY o_orderkey) AS rn, o_orderkey
      FROM orders
    ) t WHERE rn <= 20
    """,
    doc="ROWNUM semantics pinned to PK order (reference is scan-order).",
)
def rownum_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.orderBy("o_orderkey")
    return (
        o.select(F.row_number().over(w).alias("rn"), "o_orderkey")
        .filter(F.col("rn") <= 20)
    )


# ---------------------------------------------------------------------------
# Window functions — extension beyond the reference (§2.5: reference has
# none). Top-k per group, the canonical OLAP window pattern.
# ---------------------------------------------------------------------------
@workload(
    "window_topk_per_group",
    """
    SELECT c_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) t WHERE rnk <= 3
    """,
    doc="Top-3 orders per customer (window extension; reference lacks OVER).",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@workload(
    "window_running_sum",
    f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           cast(sum(cast(l_quantity as decimal(18,2)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_orderkey, l_linenumber) as double) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
    doc="Running sum per supplier (window frame extension).",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    # default RANGE frame: (l_orderkey, l_linenumber) is not unique in the
    # synthetic data, so peers must aggregate together for determinism
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return li.filter(F.col("l_suppkey") <= 3).select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


# ---------------------------------------------------------------------------
# §2.2 CASE / COALESCE / NULLIF / GREATEST / LEAST (Function.java:106-110)
# ---------------------------------------------------------------------------
@workload(
    "case_coalesce_nullif",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           greatest(o_totalprice, 100000.0) AS at_least_100k,
           least(cast(o_custkey as double), 50.0) AS at_most_50
    FROM orders WHERE o_orderkey <= 500
    """,
    doc="CASE/COALESCE/NULLIF/GREATEST/LEAST battery (Function.java:106-110).",
)
def case_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("at_least_100k"),
        F.least(F.col("o_custkey").cast("double"), F.lit(50.0)).alias("at_most_50"),
    )


# ---------------------------------------------------------------------------
# §2.2 arithmetic + || concat (Operation.java:26,31-61)
# ---------------------------------------------------------------------------
@workload(
    "expr_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity + l_tax AS add_col,
           l_extendedprice - l_discount AS sub_col,
           l_extendedprice * (1 - l_discount) AS mul_col,
           l_extendedprice / 100.0 AS div_col,
           l_orderkey % 7 AS mod_col,
           l_returnflag || '/' || l_linestatus AS concat_col,
           -l_quantity AS neg_col
    FROM lineitem WHERE l_orderkey <= 100
    """,
    doc="+, -, *, /, %, || concat, unary minus (Operation.java:26-61).",
)
def expr_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_orderkey") <= 100).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + F.col("l_tax")).alias("add_col"),
        (F.col("l_extendedprice") - F.col("l_discount")).alias("sub_col"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("mul_col"),
        (F.col("l_extendedprice") / 100.0).alias("div_col"),
        (F.col("l_orderkey") % 7).alias("mod_col"),
        F.concat(F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")).alias(
            "concat_col"
        ),
        (-F.col("l_quantity")).alias("neg_col"),
    )


# ---------------------------------------------------------------------------
# §2.4 GROUP_CONCAT(x ORDER BY x SEPARATOR s) (Aggregate.java:61,358-395)
# ---------------------------------------------------------------------------
@workload(
    "group_concat",
    """
    SELECT n_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    WHERE n_nationkey < 5
    GROUP BY n_nationkey
    """,
    doc="GROUP_CONCAT w/ ORDER BY + SEPARATOR (Aggregate.java:358-395): "
    "array_sort(collect_list) + array_join.",
)
def group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .filter(F.col("n_nationkey") < 5)
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names")
        )
    )


# ---------------------------------------------------------------------------
# §2.4 HISTOGRAM(x) (Aggregate.java:131, AggregateDataHistogram.java) —
# value/count pairs; emitted as rows (the relational form of the array).
# ---------------------------------------------------------------------------
@workload(
    "histogram_agg",
    """
    SELECT o_orderpriority AS value, count(*) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="HISTOGRAM aggregate as (value, count) rows (AggregateDataHistogram).",
)
def histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy(F.col("o_orderpriority").alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# §2.4 SELECTIVITY(x) (Aggregate.java:126) — distinct% estimate used by
# ANALYZE. Exact form here for the oracle; approx variant in bench.
# ---------------------------------------------------------------------------
@workload(
    "selectivity_agg",
    """
    SELECT cast(round(100.0 * count(DISTINCT o_custkey) / count(o_custkey), 0)
                as bigint) AS selectivity
    FROM orders
    """,
    doc="SELECTIVITY aggregate (Aggregate.java:126): 100*distinct/count.",
)
def selectivity_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.agg(
        F.round(
            100.0 * F.countDistinct("o_custkey") / F.count("o_custkey"), 0
        )
        .cast("bigint")
        .alias("selectivity")
    )


# ---------------------------------------------------------------------------
# §2.1 SYSTEM_RANGE(a, b[, step]) (RangeTable.java:24-29) → spark.range
# ---------------------------------------------------------------------------
@workload(
    "system_range",
    """
    SELECT count(*) AS n, cast(sum(range) as bigint) AS total
    FROM range(1, 10001)
    """,
    doc="SYSTEM_RANGE(1,10000) → spark.range (RangeTable.java:24-29).",
)
def system_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1, 10001).agg(
        F.count(F.lit(1)).alias("n"), F.sum("id").cast("bigint").alias("total")
    )


# ---------------------------------------------------------------------------
# §2.1 VALUES table constructor (Parser.java:1675,4134)
# ---------------------------------------------------------------------------
@workload(
    "values_table",
    """
    SELECT a, b FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(a, b)
    """,
    doc="Inline VALUES in FROM (Parser.java:1675).",
)
def values_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], schema="a int, b string"
    )


# ---------------------------------------------------------------------------
# GROUPING SETS / ROLLUP — extension (absent from the reference, §2.4 note)
# ---------------------------------------------------------------------------
@workload(
    "rollup_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP extension (reference has no grouping sets).",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty")
    )


# ---------------------------------------------------------------------------
# Pivot — extension; oracle expressed with conditional aggregation.
# ---------------------------------------------------------------------------
@workload(
    "pivot_agg",
    f"""
    SELECT l_returnflag,
           {o_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {o_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="PIVOT on linestatus (extension; oracle = conditional agg).",
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            dsum(
                F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))
            ).alias("qty_O"),
            dsum(
                F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))
            ).alias("qty_F"),
        )
    )


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregation (batch form). Streaming carrier lives
# in etl_lealone_spark/streaming; batch form is oracle-checkable.
# ---------------------------------------------------------------------------
@workload(
    "events_tumbling_agg",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
           event_type,
           count(*) AS n,
           {o_dsum('value', 4)} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h window aggregate over events (batch form).",
)
def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value"), 4).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Sessionization: gap-based sessions via lag + cumulative flag — the
# batch expression of session windows (extension; streaming variant in
# streaming/ingest.py).
# ---------------------------------------------------------------------------
@workload(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, cast(sum(new_session) as bigint) AS n_sessions,
           count(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
    doc="Gap-based sessionization (30 min) via lag + cumsum.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic, not cast-to-epoch: the driver's parquet stores
    # ts as TIMESTAMP(MICROS) which Spark reads as TIMESTAMP_NTZ, and NTZ
    # does not cast to bigint; ts - lag(ts) yields a day-time interval in
    # every timestamp flavor (and mirrors the oracle SQL literally)
    flagged = e.select(
        "user_id",
        F.when(
            (
                F.col("ts") - F.lag(F.col("ts")).over(w)
                > F.expr("INTERVAL 30 MINUTES")
            )
            | F.lag(F.col("ts")).over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# §2.4 extension: UNPIVOT (wide → long), the inverse of pivot_agg
# ---------------------------------------------------------------------------
@workload(
    "unpivot_measures",
    f"""
    SELECT measure,
           count(*) AS n,
           {o_dsum('val', 4)} AS total
    FROM (SELECT l_extendedprice, l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 1000)
    UNPIVOT (val FOR measure IN (l_extendedprice, l_discount, l_tax))
    GROUP BY measure
    ORDER BY measure
    """,
    doc="UNPIVOT (melt): three measure columns into (measure, val) rows "
    "+ per-measure aggregate — map-only reshape, no shuffle until "
    "the agg.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_orderkey") < 1000)
        .select("l_extendedprice", "l_discount", "l_tax")
        .unpivot(
            [],
            ["l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "val",
        )
        .groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("val"), 4).alias("total"),
        )
        .orderBy("measure")
    )
