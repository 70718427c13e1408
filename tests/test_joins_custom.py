"""Custom join operators: as-of join, salted skew join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_lealone_spark.operators.joins import asof_join, salted_join


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:05:00"), 101.0),
            (2, _ts("2024-01-01T10:01:00"), 50.0),
        ],
        "sym int, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:02:00")),  # → 100.0 (10:00 quote)
            (1, _ts("2024-01-01T10:05:00")),  # → 101.0 (tie: at-or-before)
            (2, _ts("2024-01-01T10:00:30")),  # → None (no quote yet)
        ],
        "sym int, tts timestamp",
    )
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", value_cols=["px"]
    )
    got = {(r["sym"], str(r["tts"])): r["px_asof"] for r in out.collect()}
    assert got[(1, "2024-01-01 10:02:00")] == 100.0
    assert got[(1, "2024-01-01 10:05:00")] == 101.0  # equal-ts quote counts
    assert got[(2, "2024-01-01 10:00:30")] is None


def test_asof_join_keeps_left_rowcount(spark, tables):
    e = tables["events"]
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    out = asof_join(clicks, purchases, ["user_id"], "ts", "ts", ["v"])
    assert out.count() == clicks.count()


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: 90% of rows share key 7
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, 7).otherwise(F.col("id")).cast("int").alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (0, "a"), (10, "b"), (20, "c")], "k int, tag string"
    )
    plain = left.join(right, "k").groupBy("tag").count()
    salted = salted_join(left, right, "k", salt=8).groupBy("tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
