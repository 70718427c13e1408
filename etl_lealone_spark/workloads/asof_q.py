"""As-of join workload: each click event matched to the user's most
recent at-or-before purchase. Oracle uses DuckDB's native ASOF JOIN —
our union-and-carry-forward composition must agree with it exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..tables import load_tables
from . import workload


@workload(
    "asof_join_events",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           round(p.purchase_value, 6) AS purchase_value_asof
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="As-of join (custom operator — Spark lacks it; composed as "
    "union + ignore-nulls carry-forward window, one shuffle on the key). "
    "Oracle is DuckDB's native ASOF JOIN.",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("purchase_value_asof", 6).alias("purchase_value_asof"),
    )
