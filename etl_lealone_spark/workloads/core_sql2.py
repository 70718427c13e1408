"""Second core-SQL batch: the rest of the aggregate catalog (§2.4),
quantified/correlated subqueries (§2.2, §2.10), LIKE ESCAPE, set-op ALL
variants (§2.7), SAMPLE_SIZE (§2.6), null-safe comparison."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from . import workload


# ---------------------------------------------------------------------------
# STDDEV/VAR family (Aggregate.java:86-101) — cross-engine-deterministic
# via exact decimal sums: n, Σx, Σx² exactly, then one double formula.
# This is ALSO the reference's own distributed decomposition
# (getSQL_STDDEV_VAR partial rewrite, Aggregate.java:676-711).
# ---------------------------------------------------------------------------
_STDDEV_ORACLE = """
    WITH m AS (
      SELECT l_returnflag,
             count(l_quantity) AS n,
             cast(sum(cast(l_quantity as decimal(18,6))) as double) AS s1,
             cast(sum(cast(l_quantity * l_quantity as decimal(24,6))) as double) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (s2 - s1 * s1 / n) / n AS var_pop,
           (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
           sqrt((s2 - s1 * s1 / n) / n) AS stddev_pop,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp
    FROM m
"""


@workload(
    "stddev_var_agg",
    _STDDEV_ORACLE,
    doc="STDDEV_POP/SAMP, VAR_POP/SAMP via the reference's own partial "
    "decomposition (COUNT+SUM+SUM(x²), Aggregate.java:676-711) — exact "
    "decimal partials make the result partitioning-independent.",
)
def stddev_var_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    q = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(q).alias("n"),
        F.sum(q.cast("decimal(18,6)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(24,6)")).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    return m.select(
        "l_returnflag",
        ((s2 - s1 * s1 / n) / n).alias("var_pop"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("var_samp"),
        F.sqrt((s2 - s1 * s1 / n) / n).alias("stddev_pop"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("stddev_samp"),
    )


# ---------------------------------------------------------------------------
# BOOL_AND/BOOL_OR + BIT_AND/BIT_OR (Aggregate.java:106-121)
# ---------------------------------------------------------------------------
@workload(
    "bool_bit_agg",
    """
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 150000) AS any_over_150k,
           bit_and(o_custkey) AS band,
           bit_or(o_custkey) AS bor
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="BOOL_AND/BOOL_OR/BIT_AND/BIT_OR aggregates (Aggregate.java:106-121).",
)
def bool_bit_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 150000).alias("any_over_150k"),
        F.bit_and("o_custkey").alias("band"),
        F.bit_or("o_custkey").alias("bor"),
    )


# ---------------------------------------------------------------------------
# DISTINCT aggregate variants (Aggregate.java: distinct flag :51-86)
# ---------------------------------------------------------------------------
@workload(
    "distinct_aggregates",
    """
    SELECT count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
           cast(sum(DISTINCT cast(l_quantity as decimal(18,2))) as double) AS sum_distinct_qty,
           cast(sum(DISTINCT cast(l_quantity as decimal(18,2))) as double)
             / count(DISTINCT cast(l_quantity as decimal(18,2))) AS avg_distinct_qty
    FROM lineitem
    """,
    doc="COUNT/SUM/AVG DISTINCT incl. multi-column count (distinct sums "
    "via decimal for order-independence; avg = exact sum / exact count).",
)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    qd = F.col("l_quantity").cast("decimal(18,2)")
    return li.agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_status"),
        F.sum_distinct(qd).cast("double").alias("sum_distinct_qty"),
        (F.sum_distinct(qd).cast("double") / F.countDistinct(qd)).alias(
            "avg_distinct_qty"
        ),
    )


# ---------------------------------------------------------------------------
# Quantified comparison op ALL/ANY (ConditionInSelect.java:35-57) —
# rewritten to min/max aggregates, the reference's own evaluation strategy.
# ---------------------------------------------------------------------------
@workload(
    "quantified_all_any",
    """
    SELECT count(*) AS n_above_all_building
    FROM orders
    WHERE o_totalprice > (
      SELECT max(o_totalprice) FROM orders o2
      JOIN customer ON c_custkey = o2.o_custkey
      WHERE c_mktsegment = 'BUILDING'
    )
    """,
    doc="> ALL (subquery) via max-aggregate rewrite (ConditionInSelect.java).",
)
def quantified_all_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    threshold = (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("c_mktsegment") == "BUILDING")
        .agg(F.max("o_totalprice").alias("m"))
    )
    return (
        t["orders"]
        .join(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("m"))
        .agg(F.count(F.lit(1)).alias("n_above_all_building"))
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (Subquery.java:27; decorrelated by Catalyst —
# strictly better than the reference's per-row re-execution)
# ---------------------------------------------------------------------------
@workload(
    "correlated_scalar_subquery",
    """
    SELECT count(*) AS n_above_own_avg
    FROM orders o
    WHERE o_totalprice > (
      SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated scalar subquery: orders above their customer's own "
    "average (Catalyst decorrelates to an aggregate+join).",
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT count(*) AS n_above_own_avg
        FROM orders o
        WHERE o_totalprice > (
          SELECT cast(sum(cast(o_totalprice as decimal(18,2))) as double) / count(*)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


# ---------------------------------------------------------------------------
# Tuple IN (subquery) (ConditionInSelect.java:26)
# ---------------------------------------------------------------------------
@workload(
    "tuple_in_subquery",
    """
    WITH big AS (
      SELECT l_returnflag AS f, l_linestatus AS s FROM lineitem
      GROUP BY 1, 2 HAVING count(*) > 1000
    )
    SELECT count(*) AS n
    FROM lineitem
    WHERE EXISTS (SELECT 1 FROM big WHERE f = l_returnflag AND s = l_linestatus)
    """,
    doc="Row-value IN (subquery): struct semi-join (oracle via EXISTS — "
    "DuckDB rejects multi-column IN subqueries).",
)
def tuple_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT count(*) AS n
        FROM lineitem
        WHERE (l_returnflag, l_linestatus) IN (
          SELECT l_returnflag, l_linestatus FROM lineitem
          GROUP BY l_returnflag, l_linestatus HAVING count(*) > 1000
        )
        """
    )


# ---------------------------------------------------------------------------
# LIKE ... ESCAPE + REGEXP (CompareLike.java:29,75)
# ---------------------------------------------------------------------------
@workload(
    "like_escape_regexp",
    """
    SELECT count(CASE WHEN nm LIKE '%a!_l%' ESCAPE '!' THEN 1 END) AS n_like,
           count(CASE WHEN regexp_matches(p_type, '[0-9]') THEN 1 END) AS n_regexp
    FROM (SELECT replace(p_name, 'al', 'a_l') AS nm, p_type FROM part) t
    """,
    doc="LIKE with ESCAPE char + REGEXP predicate (CompareLike.java:29,75).",
)
def like_escape_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    t = p.select(
        F.replace(F.col("p_name"), F.lit("al"), F.lit("a_l")).alias("nm"),
        "p_type",
    )
    return t.agg(
        F.count(F.when(F.expr("nm LIKE '%a!_l%' ESCAPE '!'"), 1)).alias("n_like"),
        F.count(F.when(F.col("p_type").rlike("[0-9]"), 1)).alias("n_regexp"),
    )


# ---------------------------------------------------------------------------
# EXCEPT ALL / INTERSECT ALL — multiset set ops (extension; reference's
# EXCEPT/INTERSECT are distinct-only, SelectUnion.java:216-241)
# ---------------------------------------------------------------------------
@workload(
    "setop_all_variants",
    """
    WITH a AS (SELECT l_returnflag AS f FROM lineitem WHERE l_suppkey <= 5),
         b AS (SELECT l_returnflag AS f FROM lineitem WHERE l_suppkey >= 3)
    SELECT f, count(*) AS n FROM (
      (SELECT f FROM a EXCEPT ALL SELECT f FROM b)
      UNION ALL
      (SELECT f FROM a INTERSECT ALL SELECT f FROM b)
    ) u GROUP BY f
    """,
    doc="EXCEPT ALL / INTERSECT ALL multiset semantics (extension).",
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    a = li.filter(F.col("l_suppkey") <= 5).select(F.col("l_returnflag").alias("f"))
    b = li.filter(F.col("l_suppkey") >= 3).select(F.col("l_returnflag").alias("f"))
    return (
        a.exceptAll(b)
        .union(a.intersectAll(b))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# SAMPLE_SIZE n (Query.java:54,515-530): reference stops the SCAN after n
# rows (input sampling, not output limit). Scan order is nondeterministic
# distributed, so our documented semantics pin PK order.
# ---------------------------------------------------------------------------
@workload(
    "sample_size_input",
    """
    SELECT l_returnflag, count(*) AS n
    FROM (
      SELECT l_returnflag FROM lineitem
      ORDER BY l_orderkey, l_linenumber, l_returnflag LIMIT 1000
    ) s
    GROUP BY l_returnflag
    """,
    doc="SAMPLE_SIZE 1000: input sampled BEFORE aggregation, pinned to PK "
    "order (Query.java:515-530; reference order is scan-dependent).",
)
def sample_size_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    sample = (
        li.select("l_returnflag", "l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag")
        .limit(1000)
    )
    return sample.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Null-safe comparison <=> (Comparison.java EQUAL_NULL_SAFE :72-77)
# ---------------------------------------------------------------------------
@workload(
    "null_safe_equal",
    """
    SELECT count(*) AS n_null_safe_matches
    FROM (
      SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderstatus END AS s
      FROM orders
    ) t
    WHERE s IS NOT DISTINCT FROM NULL
    """,
    doc="EQUAL_NULL_SAFE <=> (Comparison.java:72-77): NULL <=> NULL is true.",
)
def null_safe_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    t = o.select(
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("s")
    )
    return t.filter(F.col("s").eqNullSafe(F.lit(None))).agg(
        F.count(F.lit(1)).alias("n_null_safe_matches")
    )


# ---------------------------------------------------------------------------
# Quick aggregate (COUNT(*)/MIN/MAX without grouping — Select.java:361-366
# answers from index metadata; Spark answers from parquet stats/scan)
# ---------------------------------------------------------------------------
@workload(
    "quick_aggregates",
    """
    SELECT count(*) AS n, min(o_orderkey) AS min_k, max(o_orderkey) AS max_k,
           min(o_orderpriority) AS min_p, max(o_orderpriority) AS max_p
    FROM orders
    """,
    doc="Quick aggregates COUNT/MIN/MAX (Select.java:361-366).",
)
def quick_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_k"),
        F.max("o_orderkey").alias("max_k"),
        F.min("o_orderpriority").alias("min_p"),
        F.max("o_orderpriority").alias("max_p"),
    )


# ---------------------------------------------------------------------------
# GROUP_CONCAT DISTINCT (Aggregate.java:61 distinct flag)
# ---------------------------------------------------------------------------
@workload(
    "group_concat_distinct",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="GROUP_CONCAT(DISTINCT x ORDER BY x) via collect_set+array_sort.",
)
def group_concat_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        )
    )
