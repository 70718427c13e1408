"""Text-analysis operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lealone_spark.operators.textops import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    substr_count,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [("one two three",), ("  padded   words  ",), ("",), ("single",)], "t string"
    )
    got = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 2, 0, 1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hi extraordinary",)], "t string")
    got = df.select(bpe_ish_token_count(F.col("t")).alias("n")).collect()[0]["n"]
    # 'hi' → 1, 'extraordinary' (13 chars) → ceil(13/4)=4
    assert got == 5


def test_substr_count(spark):
    df = spark.createDataFrame([("the cat and the hat and more",)], "t string")
    got = df.select(substr_count(F.col("t"), "and").alias("n")).collect()[0]["n"]
    assert got == 2


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is on the mat and the dog is here",),
            ("der hund ist gross und die katze ist klein",),
            ("le chat est sur la table et les livres",),
            ("zzz qqq xxx",),
        ],
        "t string",
    )
    got = [r["l"] for r in df.select(language_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_score_range(tables):
    out = quality_score(tables["documents"])
    rows = out.select("quality_score").collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)


def test_fingerprint_stability(spark):
    df = spark.createDataFrame([("Hello, World! 42",), ("hello world 42",)], "t string")
    got = [r["fp"] for r in df.select(fingerprint(F.col("t")).alias("fp")).collect()]
    # normalization makes punctuation/case-variants collide
    assert got[0] == got[1]
    assert len(got[0]) == 32
