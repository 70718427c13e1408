"""Core operator tests: recursive CTE, multimodal plumbing, session shell."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lealone_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthesize_media_table,
)
from etl_lealone_spark.operators.recursive import recursive_cte
from etl_lealone_spark.session import EngineSession


def test_recursive_series(spark):
    base = spark.range(1, 2).select(F.col("id").cast("int").alias("n"))
    out = recursive_cte(
        base, lambda d: d.filter(F.col("n") < 10).select((F.col("n") + 1).alias("n"))
    )
    vals = sorted(r["n"] for r in out.collect())
    assert vals == list(range(1, 11))


def test_recursive_distinct_terminates_on_cycle(spark):
    # graph with a cycle: 1→2→3→1; UNION (distinct) semantics must terminate
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    base = spark.createDataFrame([(1,)], "node int")
    out = recursive_cte(
        base,
        lambda d: d.join(edges, d.node == edges.src).select(
            F.col("dst").alias("node")
        ),
        distinct=True,
        max_iterations=10,
    )
    assert sorted(r["node"] for r in out.collect()) == [1, 2, 3]


def test_recursive_hits_iteration_cap(spark):
    base = spark.range(1, 2).select(F.col("id").alias("n"))
    with pytest.raises(RuntimeError, match="fixpoint"):
        recursive_cte(base, lambda d: d.select((F.col("n") + 1).alias("n")), max_iterations=5)


def test_multimodal_pipeline(tables):
    media = synthesize_media_table(tables["documents"].limit(20))
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["features"]) == 8 for r in rows)


def test_multimodal_strict_raises(tables):
    media = synthesize_media_table(tables["documents"].limit(2))
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(media, strict=True).collect()


def test_multimodal_resize(tables):
    from etl_lealone_spark.operators.multimodal import resize

    media = synthesize_media_table(tables["documents"].limit(10))
    out = resize(media, width=64, height=64)
    rows = out.collect()
    assert len(rows) == 10
    target = 64 * 64 // 64
    assert all(len(r["payload"]) == target for r in rows)
    assert all(
        r["meta"]["width"] == 64 and r["meta"]["height"] == 64 for r in rows
    )
    # schema is unchanged → resize composes with extract_features
    feats = extract_features(resize(media, width=64, height=64))
    assert feats.count() == 10


def test_frame_sample(tables):
    media = synthesize_media_table(tables["documents"].limit(5))
    frames = frame_sample(media)
    assert frames.count() == 5  # null duration → 1 frame each


def test_engine_session_shell(spark):
    es = EngineSession(spark)
    es.set_setting("MAX_MEMORY_ROWS", 10000)
    assert es.get_setting("max_memory_rows") == 10000

    es.set_variable("@x", 42)
    assert es.get_variable("x") == 42

    seq = es.create_sequence("s1", start=10, increment=2)
    assert seq.next_value() == 10 and seq.next_value() == 12
    first, inc = seq.next_block(100)
    assert first == 14 and inc == 2
    assert seq.next_value() == 14 + 200

    es.prepare("q1", "SELECT 1 AS one")
    assert es.execute_prepared("q1").collect()[0]["one"] == 1
