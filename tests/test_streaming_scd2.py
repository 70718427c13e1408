"""Streaming SCD2 applier (streaming/scd2.py) — pinned against the
batch scd2_dim_update workload and against interval-chaining invariants
under multi-batch delivery and checkpoint replay."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_lealone_spark.streaming.scd2 import Scd2Applier
from etl_lealone_spark.tables import load_tables
from etl_lealone_spark.workloads.dml_q import scd2_dim_update

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "custkey", "n_orders", "valid_from", "valid_to", "is_current"
        ).collect()
    )


def test_scd2_stream_matches_batch_workload(spark, tmp_path):
    """Change batches chunked by key (each key in exactly one batch)
    replayed through the applier produce the IDENTICAL history the
    one-shot batch workload builds."""
    t = load_tables(spark, SF)
    base = t["customer"].select(
        F.col("c_custkey").alias("custkey"),
        F.lit(0).cast("bigint").alias("n_orders"),
    )
    changes = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("eff_date"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    app = Scd2Applier(
        spark, str(tmp_path / "scd2"), "custkey", ["n_orders"],
        base=base, base_from="1995-01-01", n_buckets=8,
    )
    # three chunks, disjoint by key — any chunking must compose
    for i, chunk in enumerate(
        [
            changes.filter(F.col("custkey") % 3 == j) for j in range(3)
        ]
    ):
        app.process_batch(chunk, batch_id=i, query_key="t1")
    got = _rows(app.read_history())
    want = _rows(scd2_dim_update(spark, SF))
    assert got == want


def test_scd2_multi_version_chaining_and_replay(spark, tmp_path):
    """Two sequential changes to one key produce a 3-row chain with
    contiguous validity intervals; a replayed batch_id is a no-op."""
    base = spark.createDataFrame(
        [(1, 10), (2, 20)], "custkey int, n_orders bigint"
    )
    app = Scd2Applier(
        spark, str(tmp_path / "scd2b"), "custkey", ["n_orders"],
        base=base, base_from="2020-01-01", n_buckets=4,
    )
    b1 = spark.createDataFrame(
        [(1, datetime.date(2021, 6, 1), 11)],
        "custkey int, eff_date date, n_orders bigint",
    )
    b2 = spark.createDataFrame(
        [(1, datetime.date(2022, 3, 1), 12)],
        "custkey int, eff_date date, n_orders bigint",
    )
    v1 = app.process_batch(b1, batch_id=0, query_key="t2")
    v2 = app.process_batch(b2, batch_id=1, query_key="t2")
    assert v2 > v1
    hist = sorted(
        (tuple(r) for r in app.read_history().filter(
            F.col("custkey") == 1
        ).collect()),
        key=lambda r: r[2],
    )
    assert len(hist) == 3
    # chain: each valid_to equals the next valid_from; last is open+current
    assert hist[0][3] == hist[1][2] and hist[1][3] == hist[2][2]
    assert hist[2][3] is None and hist[2][4] is True
    assert [h[1] for h in hist] == [10, 11, 12]
    # untouched key stays a single current row
    assert app.current().filter(F.col("custkey") == 2).count() == 1
    # replay of batch 1 is a no-op (marker) — version unchanged
    v3 = app.process_batch(b2, batch_id=1, query_key="t2")
    assert v3 == v2
    assert app.read_history().filter(F.col("custkey") == 1).count() == 3
    # a DIFFERENT query identity is not fooled by the marker
    assert app._marker.last_committed("other") == -1


def test_scd2_net_effect_within_batch(spark, tmp_path):
    """Two changes for one key in the SAME batch: only the latest
    eff_date lands (CDC net-effect compaction)."""
    base = spark.createDataFrame([(7, 0)], "custkey int, n_orders bigint")
    app = Scd2Applier(
        spark, str(tmp_path / "scd2c"), "custkey", ["n_orders"],
        base=base, base_from="2020-01-01", n_buckets=2,
    )
    b = spark.createDataFrame(
        [
            (7, datetime.date(2021, 1, 1), 5),
            (7, datetime.date(2021, 9, 9), 9),
        ],
        "custkey int, eff_date date, n_orders bigint",
    )
    app.process_batch(b, batch_id=0, query_key="t3")
    hist = app.read_history().filter(F.col("custkey") == 7)
    assert hist.count() == 2  # base row closed + ONE new version
    cur = hist.filter("is_current").collect()[0]
    assert cur["n_orders"] == 9
    assert cur["valid_from"] == datetime.date(2021, 9, 9)


def test_scd2_crash_replay_is_idempotent(spark, tmp_path):
    """The marker contract's hard half: a crash BETWEEN the snapshot
    flip and the marker commit re-delivers the batch against
    already-applied state — re-applying must be a no-op (no zero-length
    rows, no duplicate currents)."""
    base = spark.createDataFrame([(1, 10)], "custkey int, n_orders bigint")
    app = Scd2Applier(
        spark, str(tmp_path / "scd2d"), "custkey", ["n_orders"],
        base=base, base_from="2020-01-01", n_buckets=4,
    )
    b = spark.createDataFrame(
        [(1, datetime.date(2021, 5, 5), 11)],
        "custkey int, eff_date date, n_orders bigint",
    )
    # first application, but simulate dying before the marker commit:
    # apply WITHOUT a batch_id (marker untouched)
    app.process_batch(b, batch_id=None)
    before = _rows(app.read_history())
    # restart + foreachBatch replay of the same batch, now with its id
    app2 = Scd2Applier(
        spark, str(tmp_path / "scd2d"), "custkey", ["n_orders"],
        n_buckets=4,
    )
    app2.process_batch(b, batch_id=0, query_key="t4")
    after = _rows(app2.read_history())
    assert after == before  # re-apply changed NOTHING
    cur = app2.current().filter(F.col("custkey") == 1).collect()
    assert len(cur) == 1 and cur[0]["n_orders"] == 11
    # and no zero-length interval appeared
    assert not any(r[2] == r[3] for r in after)


def test_scd2_bucket_layout_is_pinned(spark, tmp_path):
    """Reopening the history with a different n_buckets must fail loudly
    — a silent rehash would leave old current rows unclosed."""
    import pytest

    base = spark.createDataFrame([(1, 0)], "custkey int, n_orders bigint")
    Scd2Applier(
        spark, str(tmp_path / "scd2e"), "custkey", ["n_orders"],
        base=base, n_buckets=8,
    )
    with pytest.raises(ValueError, match="n_buckets=8"):
        Scd2Applier(
            spark, str(tmp_path / "scd2e"), "custkey", ["n_orders"],
            n_buckets=4,
        )


def test_scd2_empty_first_batch_does_not_wedge(spark, tmp_path):
    """Batch 0 of a stream is commonly empty: it must NOT create the
    history (an empty partitioned parquet cannot round-trip its schema
    — the table would exist() but never read again). The marker still
    commits, and the next non-empty batch bootstraps normally."""
    app = Scd2Applier(
        spark, str(tmp_path / "scd2g"), "custkey", ["n_orders"], n_buckets=4
    )
    empty = spark.createDataFrame(
        [], "custkey int, eff_date date, n_orders bigint"
    )
    v0 = app.process_batch(empty, batch_id=0, query_key="t6")
    assert v0 == -1 and not app.history.exists()
    assert app._marker.last_committed("t6") == 0  # exactly-once intact
    b = spark.createDataFrame(
        [(5, datetime.date(2023, 1, 1), 3)],
        "custkey int, eff_date date, n_orders bigint",
    )
    app.process_batch(b, batch_id=1, query_key="t6")
    rows = app.read_history().collect()
    assert len(rows) == 1 and rows[0]["is_current"] is True
    # and a replay of the empty batch against live history is a no-op too
    v = app.process_batch(empty, batch_id=2, query_key="t6")
    assert v == app.history.version and app.read_history().count() == 1


def test_scd2_out_of_order_change_raises(spark, tmp_path):
    """A change whose eff_date precedes the key's current valid_from
    would open a duplicate is_current row — it must raise BEFORE any
    mutation, leaving the history untouched."""
    import pytest

    base = spark.createDataFrame([(1, 10)], "custkey int, n_orders bigint")
    app = Scd2Applier(
        spark, str(tmp_path / "scd2h"), "custkey", ["n_orders"],
        base=base, base_from="2020-01-01", n_buckets=4,
    )
    b1 = spark.createDataFrame(
        [(1, datetime.date(2022, 6, 1), 11)],
        "custkey int, eff_date date, n_orders bigint",
    )
    app.process_batch(b1, batch_id=0, query_key="t7")
    before = _rows(app.read_history())
    late = spark.createDataFrame(
        [(1, datetime.date(2021, 1, 1), 99)],
        "custkey int, eff_date date, n_orders bigint",
    )
    with pytest.raises(ValueError, match="out-of-order"):
        app.process_batch(late, batch_id=1, query_key="t7")
    assert _rows(app.read_history()) == before  # nothing written
    # and only ONE current row for the key survives
    assert app.current().filter(F.col("custkey") == 1).count() == 1


def test_scd2_same_date_conflict_is_surfaced(spark, tmp_path):
    """Two same-day changes to one key across batches: the second is
    dropped by the replay-idempotency rule, but now COUNTED (default)
    or rejected (strict_same_date=True); exact replays count as
    replayed, not dropped."""
    import pytest

    base = spark.createDataFrame([(1, 10)], "custkey int, n_orders bigint")
    app = Scd2Applier(
        spark, str(tmp_path / "scd2i"), "custkey", ["n_orders"],
        base=base, base_from="2020-01-01", n_buckets=4,
    )
    day = datetime.date(2021, 5, 5)
    b1 = spark.createDataFrame(
        [(1, day, 11)], "custkey int, eff_date date, n_orders bigint"
    )
    app.process_batch(b1, batch_id=0, query_key="t8")
    assert app.last_metrics == {"same_date_dropped": 0, "replayed": 0}
    # exact replay (same day, same attrs) — counted as replayed, applied
    # as a no-op
    app.process_batch(b1, batch_id=1, query_key="t8")
    assert app.last_metrics == {"same_date_dropped": 0, "replayed": 1}
    # genuine same-day CONFLICT (attrs differ) — counted, history keeps
    # the first version (documented drop semantics)
    b2 = spark.createDataFrame(
        [(1, day, 99)], "custkey int, eff_date date, n_orders bigint"
    )
    app.process_batch(b2, batch_id=2, query_key="t8")
    assert app.last_metrics["same_date_dropped"] == 1
    cur = app.current().filter(F.col("custkey") == 1).collect()
    assert len(cur) == 1 and cur[0]["n_orders"] == 11
    # strict mode: the same conflict raises before any write
    strict = Scd2Applier(
        spark, str(tmp_path / "scd2i"), "custkey", ["n_orders"],
        n_buckets=4, strict_same_date=True,
    )
    with pytest.raises(ValueError, match="same-date conflict"):
        strict.process_batch(b2, batch_id=3, query_key="t8b")


def test_scd2_compaction_row_identical(spark, tmp_path):
    """Repeated batches accrete one file per touched bucket per batch;
    compact() rewrites hot buckets to one file each and the history is
    row-identical before/after."""
    base = spark.createDataFrame(
        [(i, 0) for i in range(8)], "custkey int, n_orders bigint"
    )
    app = Scd2Applier(
        spark, str(tmp_path / "scd2j"), "custkey", ["n_orders"],
        base=base, base_from="2020-01-01", n_buckets=2,
    )
    for i in range(1, 6):
        b = spark.createDataFrame(
            [(kk, datetime.date(2020, 1 + i, 1), i) for kk in range(8)],
            "custkey int, eff_date date, n_orders bigint",
        )
        app.process_batch(b, batch_id=i, query_key="t9")
    counts = app.history.file_counts()
    assert max(counts.values()) > 2  # files accreted
    before = _rows(app.read_history())
    v = app.compact(max_files=2)
    assert v == app.history.version
    after_counts = app.history.file_counts()
    assert all(n == 1 for n in after_counts.values())
    assert _rows(app.read_history()) == before
    # below-threshold compact is a version-free no-op
    assert app.compact(max_files=64) == v


def test_scd2_pure_cdc_bootstrap(spark, tmp_path):
    """No base snapshot: the first batch bootstraps an empty history
    with the stream's own types and inserts new keys as open versions."""
    app = Scd2Applier(
        spark, str(tmp_path / "scd2f"), "custkey", ["n_orders"], n_buckets=4
    )
    b = spark.createDataFrame(
        [(5, datetime.date(2023, 1, 1), 3)],
        "custkey int, eff_date date, n_orders bigint",
    )
    app.process_batch(b, batch_id=0, query_key="t5")
    rows = app.read_history().collect()
    assert len(rows) == 1
    assert rows[0]["is_current"] is True
    assert rows[0]["valid_from"] == datetime.date(2023, 1, 1)


def test_scd2_redelivered_old_batch_is_noop(spark, tmp_path):
    """An at-least-once source redelivers a batch whose change is no
    longer the key's LATEST version: it already exists identically in
    the history, so it must stay a free no-op (not an out-of-order
    raise), and a batch with NO effective change must not mint a new
    snapshot version."""
    base = spark.createDataFrame([(1, 10)], "custkey int, n_orders bigint")
    app = Scd2Applier(
        spark, str(tmp_path / "scd2k"), "custkey", ["n_orders"],
        base=base, base_from="2020-01-01", n_buckets=4,
    )
    b1 = spark.createDataFrame(
        [(1, datetime.date(2021, 6, 1), 11)],
        "custkey int, eff_date date, n_orders bigint",
    )
    b2 = spark.createDataFrame(
        [(1, datetime.date(2022, 3, 1), 12)],
        "custkey int, eff_date date, n_orders bigint",
    )
    app.process_batch(b1, batch_id=0, query_key="t10")
    app.process_batch(b2, batch_id=1, query_key="t10")
    before = _rows(app.read_history())
    v = app.history.version
    # redelivery of the OLD b1 under a fresh marker identity (simulates
    # marker state lost/restored from backup)
    out = app.process_batch(b1, batch_id=0, query_key="t10-replayed")
    assert out == v  # no new snapshot minted (rewrite skipped)
    assert app.last_metrics["replayed"] == 1
    assert _rows(app.read_history()) == before
    # a genuinely conflicting old change still raises
    import pytest

    bad = spark.createDataFrame(
        [(1, datetime.date(2021, 1, 1), 99)],
        "custkey int, eff_date date, n_orders bigint",
    )
    with pytest.raises(ValueError, match="out-of-order"):
        app.process_batch(bad, batch_id=1, query_key="t10-replayed")
