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
    mtimes; the sentinel appears TWICE (emission-trails-watermark
    contract): once riding in the last bucket file (advances the
    watermark with that batch), once as the trailing file (the
    deterministic emission batch)."""
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
    assert len(parts) == 4  # 3 buckets (sentinel rides the last) + 1 tail
    mtimes = [m for m, _ in parts]
    assert mtimes == sorted(set(mtimes)), "mtimes must be strictly increasing"
    # trailing file is exactly the sentinel
    rows = spark.read.parquet(parts[-1][1]).collect()
    assert len(rows) == 1 and rows[0]["event_type"] == "__flush__"
    # last bucket file carries its real rows plus ONE sentinel row
    last_bucket = spark.read.parquet(parts[-2][1])
    assert last_bucket.filter(F.col("event_type") == "__flush__").count() == 1
    # bucket files partition the real input in time order
    real = [
        spark.read.parquet(p).filter(F.col("event_type") != "__flush__")
        for _, p in parts[:-1]
    ]
    assert sum(r.count() for r in real) == 40
    maxes = [r.agg(F.max("ts")).collect()[0][0] for r in real]
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


def test_drain_state_partitions_not_a_correctness_knob(spark, tmp_path):
    """streaming.ingest.drain_to_batch (the public knob surface): the
    emitted row set is IDENTICAL at two state_partitions settings — the
    knob sizes stateful-stage task count, never results."""
    from etl_lealone_spark.streaming.ingest import (
        drain_to_batch,
        stream_from_parquet_dir,
        streaming_tumbling_agg,
    )
    from etl_lealone_spark.workloads.analytics_q import (
        _flush_sentinel,
        _stream_bucket_files,
    )

    ev = _events(spark)
    d = str(tmp_path / "feed")
    _stream_bucket_files(ev, [(d, None)], n_buckets=3, tail=_flush_sentinel(ev))
    outs = []
    for i, sp in enumerate((2, 8)):
        sdf = stream_from_parquet_dir(spark, d)
        agg = streaming_tumbling_agg(sdf, window="1 hour", watermark="2 hours")
        out = drain_to_batch(
            spark, agg, str(tmp_path / f"ck{i}"), f"dsp_{i}", state_partitions=sp
        )
        outs.append(
            sorted(
                (r["window_start"], r["event_type"], r["n"], r["total_value"])
                for r in out.collect()
            )
        )
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_outer_join_emits_unmatched_and_no_sentinels(spark):
    """The left-outer workload's two contracts the oracle hash can't
    localize: unmatched left rows DO emit (with NULL right columns —
    the watermark-eviction proof worked), and neither side's sentinel
    ever reaches the output."""
    from etl_lealone_spark.workloads.analytics_q import (
        stream_interval_join_left,
    )

    out = stream_interval_join_left(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    unmatched = [r for r in rows if r["r_event_id"] is None]
    matched = [r for r in rows if r["r_event_id"] is not None]
    assert len(unmatched) > 0, "no unmatched lefts emitted — eviction broke"
    assert len(matched) > 0
    assert all(r["l_event_id"] >= 0 and r["user_id"] >= 0 for r in rows), (
        "a flush sentinel leaked into the outer-join output"
    )


def test_per_dir_tails_land_per_side(spark, tmp_path):
    """tail=[l_sentinel, r_sentinel]: each dir gets ITS side's sentinel
    (different negative uids) in the last bucket and as trailing file."""
    from etl_lealone_spark.workloads.analytics_q import (
        _flush_sentinel,
        _stream_bucket_files,
    )

    ev = _events(spark)
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    _stream_bucket_files(
        ev,
        [(dl, None), (dr, None)],
        n_buckets=3,
        tail=[_flush_sentinel(ev, uid=-1), _flush_sentinel(ev, uid=-2)],
    )
    for d, uid in ((dl, -1), (dr, -2)):
        sents = (
            spark.read.parquet(d)
            .filter(F.col("event_type") == "__flush__")
            .collect()
        )
        assert len(sents) == 2
        assert all(r["user_id"] == uid for r in sents)


def test_late_data_drop_exercises_both_paths(spark):
    """stream_late_data_drop is only meaningful if the fixture actually
    DROPS some late rows and MERGES others: the emitted totals must sit
    strictly between 'in-order only' and 'everything' row counts."""
    from etl_lealone_spark.workloads.analytics_q import stream_late_data_drop
    from etl_lealone_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = stream_late_data_drop(spark, sf)
    emitted = out.agg(F.sum("n")).collect()[0][0]
    ev = load_tables(spark, sf)["events"]
    n_all = ev.count()
    n_inorder = ev.filter(F.col("event_id") % 17 != 0).count()
    assert n_inorder < emitted < n_all, (
        f"late path vacuous: inorder={n_inorder} emitted={emitted} all={n_all}"
    )
