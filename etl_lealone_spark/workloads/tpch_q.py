"""TPC-H-adapted whole-query suite over the synthetic star schema.

The reference publishes no TPC-H runs (SURVEY.md §6), but its operator
inventory (SURVEY.md §2: multi-way joins Select.java/JoinTest.java,
grouped aggregation Aggregate.java, EXISTS/IN subqueries
ConditionExists.java / ConditionInSelect.java, ORDER BY + LIMIT
SelectOrderBy/SelectLimit) is exactly the vocabulary TPC-H exercises, so
this module composes those operators into the classic 22-query shapes —
adapted to the driver's slimmer schema (no partsupp table; no
commitdate/receiptdate/shipmode/phone/comment columns; see each query's
docstring for the substitution).

Determinism rules (package docstring): every money aggregate goes
through the decimal-cast helpers, every LIMIT carries a unique-key
ORDER BY chain, every computed column is aliased identically on both
engines.

Scale notes (100 TB): region/nation/supplier/part are dimension tables —
explicitly broadcast so every fact-side join is map-side; lineitem⋈orders
is the only unavoidable shuffle pair and both sides shuffle on the join
key once.  Correlated-subquery shapes (q4/q17/q21/q22) are expressed as
semi/anti/broadcast-agg joins rather than per-row subqueries, which is
the distributed plan a 1000-executor cluster needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from . import workload
from .helpers import davg, dsum, o_davg, o_dsum


def _rev(price="l_extendedprice", disc="l_discount"):
    return F.col(price) * (1 - F.col(disc))


_O_REV = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q3 — shipping priority (customer ⋈ orders ⋈ lineitem, top-10 revenue)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q3",
    f"""
    SELECT l_orderkey,
           {o_dsum(_O_REV, 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < timestamp '1998-03-15 00:00:00'
      AND l_shipdate  > timestamp '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 (shippriority column → o_orderpriority).",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cut = F.lit("1998-03-15").cast("timestamp")
    return (
        t["lineitem"].filter(F.col("l_shipdate") > cut)
        .join(
            t["orders"].filter(F.col("o_orderdate") < cut),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t["customer"].filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS → left-semi join)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= timestamp '1997-07-01 00:00:00'
      AND o_orderdate <  timestamp '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 (commitdate<receiptdate → shipdate>orderdate).",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 — local-supplier volume (6-table join, local = same nation)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q5",
    f"""
    SELECT n_name, {o_dsum(_O_REV, 4)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o_orderdate <  timestamp '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5: 6-way join incl. the c_nationkey=s_nationkey 'local' edge.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    nr = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["customer"],
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan + predicate + scalar agg)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q6",
    f"""
    SELECT {o_dsum('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
      AND l_shipdate <  timestamp '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: fully-pushed-down scan + scalar aggregate.",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------
@workload(
    "tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {o_dsum('volume', 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             {_O_REV} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_7'  AND n2.n_name = 'NATION_12')
          OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_7'))
        AND l_shipdate BETWEEN timestamp '1996-01-01 00:00:00'
                           AND timestamp '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: nation-pair revenue by ship year (two nation aliases).",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    names = ("NATION_7", "NATION_12")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*names))
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*names))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    return (
        li.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region for one part type
# ---------------------------------------------------------------------------
@workload(
    "tpch_q8",
    f"""
    SELECT o_year,
           {o_dsum("CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END", 4)}
             / {o_dsum('volume', 4)} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_O_REV} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN timestamp '1996-01-01 00:00:00'
                            AND timestamp '1997-12-31 00:00:00'
        AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8: market-share CASE ratio over an 8-table join.",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust_nr = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_n = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select(
                F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "nation")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    vol = (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_nr, F.col("o_custkey") == F.col("c_custkey"), "leftsemi")
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev().alias("volume"),
            "nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0), 4)
                / dsum(F.col("volume"), 4)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (no partsupp: supplycost → 0.5 * p_retailprice)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q9",
    f"""
    SELECT nation, o_year, {o_dsum('amount', 4)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             {_O_REV} - 0.5 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 (ps_supplycost → 0.5*p_retailprice; no partsupp table).",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    supp_n = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select(
                F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
            )),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "nation")
    )
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").like("%red%")).select(
                "p_partkey", "p_retailprice"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            (_rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top-20 customers by lost revenue)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q10",
    f"""
    SELECT c_custkey, c_name, {o_dsum(_O_REV, 4)} AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= timestamp '1997-10-01 00:00:00'
      AND o_orderdate <  timestamp '1998-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-lineitem revenue per customer, top-20.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipment distribution (shipmode → priority class;
#        commit/receipt lag → shipdate more than 60 days after orderdate)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q12",
    """
    SELECT priority_class,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) as bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) as bigint) AS low_line_count
    FROM (
      SELECT CASE WHEN l_linenumber <= 2 THEN 'EARLY_LINE' ELSE 'LATE_LINE' END
               AS priority_class,
             o_orderpriority
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND l_shipdate >= timestamp '1997-01-01 00:00:00'
        AND l_shipdate <  timestamp '1998-01-01 00:00:00'
    ) shipped
    GROUP BY priority_class
    ORDER BY priority_class
    """,
    doc="TPC-H Q12 (l_shipmode → linenumber class; lag = shipdate-orderdate>60d).",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .select(
            F.when(F.col("l_linenumber") <= 2, "EARLY_LINE")
            .otherwise("LATE_LINE")
            .alias("priority_class"),
            hi.alias("hi"),
        )
        .groupBy("priority_class")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("hi"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("priority_class")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double group-by)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: left-outer join + two-level aggregation.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (CASE ratio over part ⋈ lineitem)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q14",
    f"""
    SELECT 100.00 * {o_dsum("CASE WHEN p_type = 'PROMO' THEN " + _O_REV + " ELSE 0 END", 4)}
                  / {o_dsum(_O_REV, 4)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= timestamp '1997-09-01 00:00:00'
      AND l_shipdate <  timestamp '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14: promo revenue share.",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    return (
        li.join(t["part"].select("p_partkey", "p_type"),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                100.0
                * dsum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0), 4)
                / dsum(_rev(), 4)
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (revenue view + max-revenue subquery)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q15",
    f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, {o_dsum(_O_REV, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
        AND l_shipdate <  timestamp '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue0
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: per-supplier revenue CTE + scalar-max filter.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev(), 4).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier counts by part attributes (partsupp → lineitem link;
#        complaint-comment exclusion → negative-acctbal exclusion)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) links, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#5'
      AND p_type NOT IN ('ECONOMY', 'STANDARD')
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 (partsupp → distinct lineitem part-supp links).",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    links = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").isin("ECONOMY", "STANDARD"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        links.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg → broadcast agg join)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q17",
    f"""
    SELECT {o_dsum('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      AND p_type = 'MEDIUM'
      AND l_quantity < (SELECT 0.2 * ({o_davg('l_quantity')})
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
    doc="TPC-H Q17: correlated per-part avg rewritten as a broadcast agg join.",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    li = t["lineitem"].join(
        p, F.col("l_partkey") == F.col("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(avg_q, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING on a grouped join key)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {o_dsum('l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING sum(cast(l_quantity as decimal(18,2))) > 180)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18: big-order IN-subquery via aggregate semi-join.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One lineitem pass (r12, guide §1.2/§2.4): the HAVING aggregate IS
    # the output aggregate — o_orderkey is the orders PK and appears in
    # the output group key, so every final group is exactly one big
    # order and its sum_qty equals the per-orderkey decimal sum already
    # computed for the > 180 gate. The classic shape (semi-join lineitem
    # against the big keys, re-join, re-aggregate) scans and shuffles
    # lineitem twice to recompute a value the first aggregate produced;
    # carrying `q` through instead drops one full lineitem scan + the
    # probe-side shuffle + the final 5-column aggregate. Value and type
    # identical: dsum == sum(cast(decimal(18,2))) cast double, over the
    # same row set (inner joins to orders/customer only drop orphans in
    # BOTH shapes). Oracle-verified at sf0.001/0.01/0.1.
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 180)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", F.col("q").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate;
#        container/shipmode clauses → size/quantity bands only)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q19",
    f"""
    SELECT {o_dsum(_O_REV, 4)} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
            AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
            AND l_quantity >= 20 AND l_quantity <= 30))
    """,
    doc="TPC-H Q19: OR-of-ANDs join predicate (no container/shipmode cols).",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(t["part"].select("p_partkey", "p_brand", "p_size"),
              F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(dsum(_rev(), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess stock of promo parts (partsupp availqty →
#        shipped-quantity threshold from lineitem)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q20",
    """
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_type = 'PROMO'
          AND l_shipdate >= timestamp '1997-01-01 00:00:00'
          AND l_shipdate <  timestamp '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(cast(l_quantity as decimal(18,2))) > 120
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    ORDER BY s_name, s_acctbal
    """,
    doc="TPC-H Q20 (availqty threshold → shipped-qty HAVING).",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    promo = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(promo, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 120)
        .select("l_suppkey")
    )
    n = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    return (
        t["supplier"]
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "leftsemi")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (receipt/commit lag → the
#        supplier whose lineitem shipped LAST in a multi-supplier order)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q21",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21: EXISTS + NOT-EXISTS over self-joined lineitem.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n = t["nation"].filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "leftsemi")
        .select("s_suppkey", "s_name")
    )
    l1 = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    l2 = t["lineitem"].select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = t["lineitem"].select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    return (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey"))
            & (F.col("d3") > F.col("l_shipdate")),
            "leftanti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (phone country code → nationkey % 10)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q22",
    f"""
    SELECT cntrycode, count(*) AS numcust,
           {o_dsum('c_acctbal')} AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
        AND c_acctbal > (SELECT {o_davg('c_acctbal')} FROM customer
                         WHERE c_acctbal > 0 AND c_nationkey % 10 IN (1, 3, 5, 7, 9))
    ) promising
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= timestamp '2000-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    doc="TPC-H Q22 (phone substring → c_nationkey % 10; 'no orders' → "
        "'no orders since 2000' — every sf0.01 customer has some order).",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    codes = (1, 3, 5, 7, 9)
    c = t["customer"].withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("int")
    ).filter(F.col("cntrycode").isin(*codes))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal")).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "leftanti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (full column set; agg_groupby_having is the
# simplified §2.4 teaching shape, this is the complete report)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           {o_dsum(_O_REV, 4)} AS sum_disc_price,
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
             AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount', 4)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '2001-08-31 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: the full pricing summary (8 aggregates, decimal-exact "
    "sums, one partial+final hash agg).",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(_rev(), 4).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                6,
            ).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (no partsupp: cost → s_acctbal among the
# suppliers that actually shipped the part, from the lineitem link)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q2",
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem
    ),
    costed AS (
      SELECT ps.partkey, ps.suppkey, s.s_acctbal, s.s_name, s.s_nationkey
      FROM ps JOIN supplier s ON ps.suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT c.s_acctbal, c.s_name, n.n_name, p.p_partkey, p.p_type
    FROM costed c
    JOIN part p ON c.partkey = p.p_partkey
    JOIN nation n ON c.s_nationkey = n.n_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'PROMO'
      AND c.s_acctbal = (SELECT min(c2.s_acctbal) FROM costed c2
                         WHERE c2.partkey = c.partkey)
    ORDER BY c.s_acctbal DESC, n.n_name, c.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (ps_supplycost → min s_acctbal among shippers of the "
    "part; region-filtered). Correlated-min via per-part agg join.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ps = t["lineitem"].select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    nr = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    costed = (
        ps.join(t["supplier"], F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("partkey", "suppkey", "s_acctbal", "s_name", "n_name")
    )
    min_cost = costed.groupBy(F.col("partkey").alias("mc_key")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    p = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
    return (
        costed.join(
            min_cost,
            (F.col("partkey") == F.col("mc_key"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(p, F.col("partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (no partsupp: part value =
# shipped qty × retail price; HAVING vs a scalar fraction of the total)
# ---------------------------------------------------------------------------
@workload(
    "tpch_q11",
    """
    WITH pv AS (
      SELECT l_partkey AS partkey,
             sum(cast(l_quantity * p_retailprice as decimal(28,2))) AS val
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT partkey, cast(val as double) AS part_value
    FROM pv
    WHERE val > (SELECT sum(val) * 0.002 FROM pv)
    ORDER BY val DESC, partkey
    """,
    doc="TPC-H Q11 (ps_availqty*supplycost → shipped qty*retailprice): "
    "grouped decimal value + scalar-subquery HAVING threshold.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    supp_n = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(F.col("n_name") == "NATION_3")
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    pv = (
        t["lineitem"]
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["part"].select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(28,2)")
            ).alias("val")
        )
    )
    total = pv.agg((F.sum("val") * F.lit(0.002)).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("val"), "partkey")
    )
