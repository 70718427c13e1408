"""JSON + percentile + higher-order array workloads (engine extensions —
the reference has no JSON or percentile support; training-data pipelines
need both)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from . import workload


# ---------------------------------------------------------------------------
# JSON extraction over events.props
# ---------------------------------------------------------------------------
@workload(
    "json_extract_agg",
    f"""
    SELECT event_type,
           count(*) AS n,
           cast(sum(cast(json_extract_string(props, '$.k') as int)) as bigint) AS sum_k,
           max(cast(json_extract_string(props, '$.k') as int)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction + aggregation over a JSON string column "
    "(get_json_object; extension).",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@workload(
    "json_schema_projection",
    """
    SELECT event_id, cast(json_extract_string(props, '$.k') as int) AS k
    FROM events WHERE event_id < 200
    """,
    doc="Typed projection out of a JSON column (from_json/get_json_object).",
)
def json_schema_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    parsed = e.filter(F.col("event_id") < 200).select(
        "event_id",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.select("event_id", F.col("p.k").alias("k"))


# ---------------------------------------------------------------------------
# exact percentile (extension; nearest reference concept is SELECTIVITY)
# ---------------------------------------------------------------------------
@workload(
    "percentile_agg",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (PERCENTILE_CONT semantics).",
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
    )


# ---------------------------------------------------------------------------
# higher-order array functions (filter/transform/aggregate)
# ---------------------------------------------------------------------------
@workload(
    "array_higher_order",
    """
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           cast(list_sum(list_transform(embedding,
                x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint)))
             as bigint) AS sum_q
    FROM embeddings WHERE vec_id < 100
    """,
    doc="Higher-order array ops: filter/transform/aggregate over "
    "array<float> (F.filter/F.transform/F.aggregate; extension).",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    quant = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * 1000000.0 + 0.5).cast("bigint"),
    )
    return e.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.aggregate(
            quant, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("sum_q"),
    )


# ---------------------------------------------------------------------------
# VARIANT (binary semi-structured JSON, Spark 4) — the scale path for
# JSON columns: parse once into the shredded binary encoding, then typed
# sub-field access without re-parsing text per predicate
# ---------------------------------------------------------------------------
@workload(
    "json_variant_agg",
    """
    SELECT event_type,
           cast(sum(cast(json_extract_string(props, '$.k') as int)) as bigint)
             AS sum_k,
           count(*) AS n_present
    FROM events
    WHERE cast(json_extract_string(props, '$.k') as int) >= 50
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="VARIANT path: parse_json → try_variant_get typed access "
    "(Spark 4 binary semi-structured encoding; DuckDB twin uses its "
    "JSON type). One parse per row, typed comparisons JVM-side.",
)
def json_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# table-valued generator: posexplode (positions + values) — the
# engine's FROM-clause generator surface beyond UDTFs
# ---------------------------------------------------------------------------
@workload(
    "array_posexplode",
    """
    SELECT vec_id, CAST(g.i - 1 AS INT) AS pos,
           cast(floor(cast(embedding[g.i] as double) * 1000000.0 + 0.5)
                as bigint) AS qval
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS g(i)
    WHERE vec_id < 10
    ORDER BY vec_id, pos
    """,
    doc="posexplode: one row per (array position, element), quantized "
    "for cross-engine float determinism (DuckDB twin: generate_series "
    "indexing). Map-side generate — zero shuffle before the sort.",
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    return (
        e.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            F.floor(F.col("val").cast("double") * 1000000.0 + 0.5)
            .cast("bigint")
            .alias("qval"),
        )
        .orderBy("vec_id", "pos")
    )
