"""Scalar function batteries (SURVEY.md §2.8 — reference registry
Function.java:188-381, ~130 names). Each battery exercises a family of
functions against the oracle over a deterministic row subset; the full
name-by-name engine registration lives in etl_lealone_spark/functions/
and is unit-tested in tests/test_functions.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from . import workload


# ---------------------------------------------------------------------------
# string functions (Function.java:89-95,236-286)
# ---------------------------------------------------------------------------
@workload(
    "string_functions",
    """
    SELECT p_partkey,
           ascii(p_name) AS ascii_c,
           length(p_name) AS len_c,
           lower(p_name) AS lower_c,
           upper(p_name) AS upper_c,
           substring(p_name, 2, 5) AS substr_c,
           instr(p_name, 'a') AS instr_c,
           trim(p_name) AS trim_c,
           lpad(p_brand, 12, '*') AS lpad_c,
           rpad(p_brand, 12, '*') AS rpad_c,
           repeat(p_brand, 2) AS repeat_c,
           replace(p_name, 'a', '@') AS replace_c,
           left(p_name, 4) AS left_c,
           right(p_name, 4) AS right_c,
           concat_ws('-', p_brand, p_type) AS concat_ws_c,
           reverse(p_brand) AS reverse_c,
           md5(p_name) AS md5_c,
           p_name LIKE '%al%' AS like_c,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS re_replace_c
    FROM part WHERE p_partkey <= 100
    """,
    doc="ASCII/LENGTH/LOWER/UPPER/SUBSTR/INSTR/TRIM/LPAD/RPAD/REPEAT/"
    "REPLACE/LEFT/RIGHT/CONCAT_WS/REVERSE/HASH/LIKE/REGEXP_REPLACE "
    "(Function.java:236-286).",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    return p.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.ascii("p_name").alias("ascii_c"),
        F.length("p_name").alias("len_c"),
        F.lower("p_name").alias("lower_c"),
        F.upper("p_name").alias("upper_c"),
        F.substring("p_name", 2, 5).alias("substr_c"),
        F.instr("p_name", "a").alias("instr_c"),
        F.trim("p_name").alias("trim_c"),
        F.lpad("p_brand", 12, "*").alias("lpad_c"),
        F.rpad("p_brand", 12, "*").alias("rpad_c"),
        F.repeat("p_brand", 2).alias("repeat_c"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("replace_c"),
        F.expr("left(p_name, 4)").alias("left_c"),
        F.expr("right(p_name, 4)").alias("right_c"),
        F.concat_ws("-", "p_brand", "p_type").alias("concat_ws_c"),
        F.reverse("p_brand").alias("reverse_c"),
        F.md5("p_name").alias("md5_c"),
        F.col("p_name").like("%al%").alias("like_c"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("re_replace_c"),
    )


# ---------------------------------------------------------------------------
# date/time functions (Function.java:97-101,289-323)
# ---------------------------------------------------------------------------
@workload(
    "date_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS year_c,
           month(o_orderdate) AS month_c,
           day(o_orderdate) AS day_c,
           hour(o_orderdate) AS hour_c,
           minute(o_orderdate) AS minute_c,
           quarter(o_orderdate) AS quarter_c,
           dayofyear(o_orderdate) AS doy_c,
           cast(weekofyear(o_orderdate) as int) AS week_c,
           (dayofweek(o_orderdate) + 1) AS dow_c,
           strftime(o_orderdate, '%Y-%m-%d') AS fmt_c,
           strftime(cast(o_orderdate as date) + 30, '%Y-%m-%d') AS dateadd_c,
           date_diff('day', cast(o_orderdate as date), DATE '1998-12-31') AS datediff_c,
           strftime(last_day(cast(o_orderdate as date)), '%Y-%m-%d') AS lastday_c,
           cast(epoch(o_orderdate) as bigint) AS epoch_c
    FROM orders WHERE o_orderkey <= 300
    """,
    doc="YEAR/MONTH/DAY/HOUR/MINUTE/QUARTER/DAYOFYEAR/WEEK/DAYOFWEEK/"
    "FORMATDATETIME/DATEADD/DATEDIFF/LAST_DAY/EPOCH (Function.java:289-323). "
    "DuckDB dayofweek is 0-based Sunday; Spark is 1-based — oracle adds 1.",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") <= 300).select(
        "o_orderkey",
        F.year("o_orderdate").alias("year_c"),
        F.month("o_orderdate").alias("month_c"),
        F.dayofmonth("o_orderdate").alias("day_c"),
        F.hour("o_orderdate").alias("hour_c"),
        F.minute("o_orderdate").alias("minute_c"),
        F.quarter("o_orderdate").alias("quarter_c"),
        F.dayofyear("o_orderdate").alias("doy_c"),
        F.weekofyear("o_orderdate").alias("week_c"),
        F.dayofweek("o_orderdate").alias("dow_c"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("fmt_c"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "dateadd_c"
        ),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "datediff_c"
        ),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "lastday_c"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_c"),
    )


# ---------------------------------------------------------------------------
# math functions (Function.java:83-87,188-234)
# ---------------------------------------------------------------------------
@workload(
    "math_functions",
    """
    SELECT p_partkey,
           abs(p_retailprice - 1000) AS abs_c,
           cast(ceil(p_retailprice) as double) AS ceil_c,
           cast(floor(p_retailprice) as double) AS floor_c,
           sqrt(p_retailprice) AS sqrt_c,
           ln(p_retailprice) AS ln_c,
           log10(p_retailprice) AS log10_c,
           pow(p_size, 2) AS power_c,
           cast(sign(p_retailprice - 1000) as double) AS sign_c,
           p_size % 5 AS mod_c,
           round(sin(p_size), 6) AS sin_c,
           round(cos(p_size), 6) AS cos_c,
           round(atan2(p_size, 10), 6) AS atan2_c,
           round(degrees(p_size / 10.0), 6) AS degrees_c,
           round(radians(cast(p_size as double)), 6) AS radians_c,
           round(exp(p_size / 25.0), 6) AS exp_c,
           cast(floor(p_retailprice * 10) / 10 as double) AS trunc1_c,
           pi() AS pi_c
    FROM part WHERE p_partkey <= 100
    """,
    doc="ABS/CEIL/FLOOR/SQRT/LN/LOG10/POWER/SIGN/MOD/trig/DEGREES/RADIANS/"
    "EXP/TRUNCATE/PI (Function.java:188-234). Trig rounded to 6dp "
    "(JVM Math vs libm can differ in the last ulp).",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    return p.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("abs_c"),
        F.ceil("p_retailprice").cast("double").alias("ceil_c"),
        F.floor("p_retailprice").cast("double").alias("floor_c"),
        F.sqrt("p_retailprice").alias("sqrt_c"),
        F.log(F.col("p_retailprice")).alias("ln_c"),
        F.log10("p_retailprice").alias("log10_c"),
        F.pow("p_size", F.lit(2)).alias("power_c"),
        F.signum(F.col("p_retailprice") - 1000).cast("double").alias("sign_c"),
        (F.col("p_size") % 5).alias("mod_c"),
        F.round(F.sin("p_size"), 6).alias("sin_c"),
        F.round(F.cos("p_size"), 6).alias("cos_c"),
        F.round(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 6).alias("atan2_c"),
        F.round(F.degrees(F.col("p_size") / 10.0), 6).alias("degrees_c"),
        F.round(F.radians(F.col("p_size").cast("double")), 6).alias("radians_c"),
        F.round(F.exp(F.col("p_size") / 25.0), 6).alias("exp_c"),
        (F.floor(F.col("p_retailprice") * 10) / 10).cast("double").alias("trunc1_c"),
        F.lit(3.141592653589793).alias("pi_c"),
    )


# ---------------------------------------------------------------------------
# conversion / cast functions (Function.java:106-110,337-367)
# ---------------------------------------------------------------------------
@workload(
    "cast_conversion",
    """
    SELECT o_orderkey,
           cast(floor(o_totalprice) as bigint) AS to_long_c,
           cast(cast(o_totalprice as decimal(18,1)) as varchar) AS to_str_c,
           cast(o_orderkey as varchar) AS key_str_c,
           cast(cast(o_orderkey as varchar) as bigint) AS roundtrip_c,
           strftime(cast(o_orderdate as date), '%Y-%m-%d') AS to_date_c,
           cast(floor(o_totalprice) as int) AS to_int_c
    FROM orders WHERE o_orderkey <= 200
    """,
    doc="CAST/CONVERT ladder (DataType.java): numeric↔string↔date round-trips. "
    "Note cast(double→int) truncates in Spark; oracle matched via DuckDB "
    "trunc-compatible values.",
)
def cast_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("to_long_c"),
        F.col("o_totalprice").cast("decimal(18,1)").cast("string").alias("to_str_c"),
        F.col("o_orderkey").cast("string").alias("key_str_c"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("roundtrip_c"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("to_date_c"),
        F.floor("o_totalprice").cast("int").alias("to_int_c"),
    )


# ---------------------------------------------------------------------------
# array functions (Function.java:350-359): ARRAY_GET (1-based), ARRAY_LENGTH,
# ARRAY_CONTAINS
# ---------------------------------------------------------------------------
@workload(
    "array_functions",
    """
    SELECT vec_id,
           len(embedding) AS arr_len_c,
           round(cast(embedding[1] as double), 6) AS arr_get_c,
           list_contains(list_transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)),
                         0) AS arr_contains_c
    FROM embeddings WHERE vec_id < 50
    """,
    doc="ARRAY_LENGTH/ARRAY_GET(1-based, matches element_at)/ARRAY_CONTAINS "
    "(Function.java:350-359).",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    return e.filter(F.col("vec_id") < 50).select(
        "vec_id",
        F.size("embedding").alias("arr_len_c"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("arr_get_c"),
        F.array_contains(
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.floor(x * 1000000.0 + 0.5).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
        ).alias("arr_contains_c"),
    )


# ---------------------------------------------------------------------------
# try_* error-safe evaluation battery (ANSI-mode safety valves)
# ---------------------------------------------------------------------------
@workload(
    "try_functions",
    """
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(l_returnflag AS INTEGER) AS tc_bad_int,
           TRY_CAST(cast(l_quantity AS VARCHAR) AS DOUBLE) AS tc_good_double,
           strftime(TRY_CAST('2024-13-40' AS DATE), '%Y-%m-%d') AS tc_bad_date,
           l_extendedprice / nullif(l_quantity - l_quantity, 0) AS td_zero,
           floor(l_extendedprice / nullif(l_quantity, 0) * 1000000 + 0.5) / 1000000.0 AS td_ok,
           [l_orderkey, l_partkey][9] AS tea_oob
    FROM lineitem
    WHERE l_orderkey < 200
    """,
    doc="Error-safe evaluation: TRY_CAST on malformed ints/dates, "
    "try_divide by zero, out-of-bounds element access — NULL instead of "
    "a runtime error, the batch-pipeline-survival semantics (one bad row "
    "must not kill a 100 TB job). All map-only.",
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").try_cast("int").alias("tc_bad_int"),
        F.col("l_quantity").cast("string").try_cast("double").alias(
            "tc_good_double"
        ),
        F.date_format(F.lit("2024-13-40").try_cast("date"), "yyyy-MM-dd").alias("tc_bad_date"),
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("td_zero"),
        (
            F.floor(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
                * 1000000
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("td_ok"),
        F.try_element_at(
            F.array(F.col("l_orderkey"), F.col("l_partkey")), F.lit(9)
        ).alias("tea_oob"),
    )


@workload(
    "udf_alias_agg",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
    FROM orders GROUP BY 1
    """,
    doc="CREATE ALIAS end-to-end (SURVEY §2.13, CreateFunctionAlias.java"
    ":25): the statement router parses the inline-source form, detects "
    "the pd.Series annotation, and registers an Arrow-vectorized "
    "pandas_udf; the query then buckets orders through the UDF and "
    "aggregates. Oracle re-derives the bucket arithmetically — pinning "
    "that the vectorized UDF path computes exactly the declared "
    "function (np.floor(p/50000) is the same IEEE sequence in both "
    "engines).",
)
def udf_alias_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import EngineSession

    sess = EngineSession(spark)
    sess.sql(
        "CREATE ALIAS WL_PRICE_BUCKET AS $$\n"
        "import numpy as np\n"
        "import pandas as pd\n"
        "def wl_price_bucket(p: pd.Series) -> pd.Series:\n"
        "    return np.floor(p / 50000.0)\n"
        "$$"
    )
    o = load_tables(spark, sf_dir)["orders"]
    o.createOrReplaceTempView("wl_udf_orders")
    return spark.sql(
        """
        SELECT CAST(WL_PRICE_BUCKET(o_totalprice) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS decimal(18,2))) AS DOUBLE)
                 AS sum_price
        FROM wl_udf_orders GROUP BY 1
        """
    )
