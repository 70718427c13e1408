"""threshold_topk: exactness vs the plain orderBy plan on every edge
that matters — ties at the threshold boundary, nulls under both sort
directions, offsets, fallback on tiny inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lealone_spark.operators.topk import threshold_topk


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _plain(df, primary, k, offset, descending, tiebreak):
    order = [
        F.col(primary).desc() if descending else F.col(primary).asc()
    ] + list(tiebreak or [])
    return _rows(df.orderBy(*order).offset(offset).limit(k))


@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("offset", [0, 3])
def test_matches_plain_on_random_data(spark, descending, offset):
    df = spark.range(20_000).select(
        F.col("id").cast("int").alias("f1"),
        (F.xxhash64("id") % 100_000).alias("f2"),
    )
    got = _rows(
        threshold_topk(
            df, "f2", 5, offset, descending,
            tiebreak=[F.col("f1")], sample_fraction=0.05, sample_k=64,
        )
    )
    assert got == _plain(df, "f2", 5, offset, descending, [F.col("f1")])


@pytest.mark.parametrize("descending", [True, False])
def test_heavy_ties_at_boundary(spark, descending):
    # every value duplicated 1000x: the threshold lands ON a tie class
    df = spark.range(20_000).select(
        F.col("id").cast("int").alias("f1"),
        (F.col("id") % 20).alias("f2"),
    )
    got = _rows(
        threshold_topk(
            df, "f2", 7, 2, descending,
            tiebreak=[F.col("f1")], sample_fraction=0.05, sample_k=64,
        )
    )
    assert got == _plain(df, "f2", 7, 2, descending, [F.col("f1")])


@pytest.mark.parametrize("descending", [True, False])
def test_nulls_follow_default_ordering(spark, descending):
    # DESC -> NULLS LAST (nulls never in top-k unless short); ASC ->
    # NULLS FIRST (nulls ARE the top-k)
    df = spark.range(10_000).select(
        F.col("id").cast("int").alias("f1"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id") * 3)
        .alias("f2"),
    )
    got = _rows(
        threshold_topk(
            df, "f2", 6, 1, descending,
            tiebreak=[F.col("f1")], sample_fraction=0.05, sample_k=64,
        )
    )
    assert got == _plain(df, "f2", 6, 1, descending, [F.col("f1")])


def test_tiny_input_falls_back(spark):
    df = spark.range(50).select(
        F.col("id").cast("int").alias("f1"), (F.col("id") * 2).alias("f2")
    )
    got = _rows(threshold_topk(df, "f2", 5, 1, True, tiebreak=[F.col("f1")]))
    assert got == _plain(df, "f2", 5, 1, True, [F.col("f1")])


def test_k_exceeds_rowcount(spark):
    df = spark.range(10).select(
        F.col("id").cast("int").alias("f1"), (F.col("id") * 2).alias("f2")
    )
    got = _rows(threshold_topk(df, "f2", 50, 0, True))
    assert len(got) == 10


def test_string_primary_key(spark):
    # tau comparisons work on any orderable type, not just numerics
    df = spark.range(5_000).select(
        F.col("id").cast("int").alias("f1"),
        F.concat(F.lit("k"), F.lpad((F.xxhash64("id") % 1000).cast("string"), 6, "0")).alias("f2"),
    )
    got = _rows(
        threshold_topk(
            df, "f2", 4, 1, True,
            tiebreak=[F.col("f1")], sample_fraction=0.1, sample_k=32,
        )
    )
    assert got == _plain(df, "f2", 4, 1, True, [F.col("f1")])


def test_zero_k(spark):
    df = spark.range(10).select(F.col("id").alias("f1"), F.col("id").alias("f2"))
    assert threshold_topk(df, "f2", 0, 3, True).count() == 0


def test_bad_args_raise(spark):
    df = spark.range(10).select(F.col("id").alias("f2"))
    with pytest.raises(ValueError):
        threshold_topk(df, "f2", -1)
