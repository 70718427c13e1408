"""Pins for the streaming-oracle harness (workloads/analytics_q.py):
the pieces whose failure modes the oracle gate would surface only as
an opaque hash mismatch — sentinel shape, feed determinism, and the
_drain_stream conf contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _events(spark, n=40):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(hours=i * 7), i % 5, "click", float(i), None)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )


def test_flush_sentinel_shape(spark):
    from etl_lealone_spark.workloads.analytics_q import _flush_sentinel

    ev = _events(spark)
    s = _flush_sentinel(ev).collect()
    assert len(s) == 1
    row = s[0]
    assert row["event_id"] == -1 and row["user_id"] == -1
    assert row["event_type"] == "__flush__"
    # 30 days past the max event time — beyond any real window
    mx = ev.agg(F.max("ts")).collect()[0][0]
    assert (row["ts"] - mx).days == 30
    # same column set as the feed (schema-by-name parquet contract)
    assert set(_flush_sentinel(ev).columns) == set(ev.columns)


def test_stream_bucket_files_order_and_tail(spark, tmp_path):
    """Buckets land oldest-first with strictly increasing pinned
    mtimes; the tail sentinel is written TWICE (two micro-batches —
    the emission-trails-watermark contract) and always LAST."""
    from etl_lealone_spark.workloads.analytics_q import (
        _flush_sentinel,
        _stream_bucket_files,
    )

    ev = _events(spark)
    d = str(tmp_path / "feed")
    _stream_bucket_files(ev, [(d, None)], n_buckets=3, tail=_flush_sentinel(ev))
    parts = sorted(
        (os.path.getmtime(os.path.join(d, f)), os.path.join(d, f))
        for f in os.listdir(d)
        if f.startswith("part-")
    )
    assert len(parts) == 5  # 3 buckets + 2 sentinel batches
    mtimes = [m for m, _ in parts]
    assert mtimes == sorted(set(mtimes)), "mtimes must be strictly increasing"
    # tail files are the two newest and contain exactly the sentinel
    for _, p in parts[-2:]:
        rows = spark.read.parquet(p).collect()
        assert len(rows) == 1 and rows[0]["event_type"] == "__flush__"
    # bucket files partition the input in time order
    n_real = sum(spark.read.parquet(p).count() for _, p in parts[:-2])
    assert n_real == 40
    maxes = [
        spark.read.parquet(p).agg(F.max("ts")).collect()[0][0]
        for _, p in parts[:-2]
    ]
    assert maxes == sorted(maxes)


def test_drain_stream_restores_conf_and_drains(spark, tmp_path):
    from etl_lealone_spark.workloads.analytics_q import _drain_stream

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ev = _events(spark, n=10)
    d = str(tmp_path / "in")
    ev.coalesce(1).write.parquet(d)
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .select("event_id", "user_id")
    )
    out = _drain_stream(spark, sdf, str(tmp_path), "drain_test", state_partitions=4)
    assert out.count() == 10
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # the memory-sink temp view is gone
    assert not any(t.name == "drain_test" for t in spark.catalog.listTables())
