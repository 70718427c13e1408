"""Z-order layout: skipping effectiveness, determinism, OPTIMIZE e2e.

The workload oracle (zorder_curve_keys) proves the key arithmetic is
cross-engine exact; these tests prove the layout DOES what it is for —
parquet footer stats prune on BOTH clustered dimensions — and that the
SQL-shell OPTIMIZE statement preserves table content.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lealone_spark.operators.layout import (
    cluster_by_zorder,
    file_prune_fraction,
    zorder_key,
)
from etl_lealone_spark.session import EngineSession


def test_zorder_key_deterministic_vs_partitioning(spark, tables):
    ev = tables["events"].limit(2000)
    a = ev.select("event_id", zorder_key(ev, ["user_id", "value"], bits=8).alias("z"))
    ev13 = ev.repartition(13)
    b = ev13.select("event_id", zorder_key(ev13, ["user_id", "value"], bits=8).alias("z"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_zorder_prunes_both_dimensions(spark, tables, tmp_path):
    """The point of the operator: after Z-clustering on (user_id, value),
    a selective range on EITHER column prunes most row-groups from
    footer stats alone. A 1-D sort on user_id gives ~zero pruning on
    value — Z-order must beat it decisively on the second dimension."""
    ev = tables["events"].select("event_id", "user_id", "value")
    lin = str(tmp_path / "linear")
    zod = str(tmp_path / "zorder")
    # 1-D layout: range-partition + sort on user_id only.
    (ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
       .write.parquet(lin))
    cluster_by_zorder(ev, ["user_id", "value"], num_partitions=8).write.parquet(zod)

    stats = ev.agg(
        F.min("value").alias("mnv"), F.max("value").alias("mxv"),
        F.min("user_id").alias("mnu"), F.max("user_id").alias("mxu"),
    ).collect()[0]
    # A ~10%-wide band on each dimension.
    v_lo = stats.mnv + 0.45 * (stats.mxv - stats.mnv)
    v_hi = stats.mnv + 0.55 * (stats.mxv - stats.mnv)
    u_lo = stats.mnu + 0.45 * (stats.mxu - stats.mnu)
    u_hi = stats.mnu + 0.55 * (stats.mxu - stats.mnu)

    # Primary dimension: both layouts prune well.
    assert file_prune_fraction(lin, "user_id", u_lo, u_hi) >= 0.5
    assert file_prune_fraction(zod, "user_id", u_lo, u_hi) >= 0.25
    # Secondary dimension: only the Z-order layout prunes.
    lin_v = file_prune_fraction(lin, "value", v_lo, v_hi)
    zod_v = file_prune_fraction(zod, "value", v_lo, v_hi)
    assert lin_v == 0.0, f"1-D layout unexpectedly pruned value: {lin_v}"
    assert zod_v >= 0.25, f"z-order pruned only {zod_v} on the 2nd dim"


def test_zorder_single_shuffle(spark, tables):
    from etl_lealone_spark.plans import count_exchanges

    ev = tables["events"].select("event_id", "user_id", "value")
    df = cluster_by_zorder(ev, ["user_id", "value"], num_partitions=8)
    assert count_exchanges(df) == 1


@pytest.fixture()
def es(spark, tmp_path):
    s = EngineSession(spark, warehouse=str(tmp_path))
    s.sql("CREATE TABLE zt (id int PRIMARY KEY, x int, y double)")
    vals = ",".join(f"({i},{i % 97},{(i * 37) % 100}.5)" for i in range(500))
    s.sql(f"INSERT INTO zt VALUES {vals}")
    return s


def test_optimize_zorder_statement(es):
    before = sorted(r.id for r in es.sql("SELECT id FROM zt").collect())
    es.sql("OPTIMIZE zt ZORDER BY (x, y)")
    after = sorted(r.id for r in es.sql("SELECT id FROM zt").collect())
    assert before == after  # layout changed, content identical
    assert len(after) == 500


def test_optimize_compaction_statement(es):
    es.sql("OPTIMIZE zt")
    rows = es.sql("SELECT count(*) AS n FROM zt").collect()
    assert rows[0].n == 500


def test_optimize_compact_statement(es):
    """OPTIMIZE t COMPACT [MAX FILES n]: threshold compaction through
    the DDL surface — content identical, repeated inserts' file
    accretion collapsed, below-threshold call is a version no-op."""
    # accrete snapshot files
    for i in range(500, 506):
        es.sql(f"INSERT INTO zt VALUES ({i},{i % 97},{(i * 37) % 100}.5)")
    st = es.catalog.table("zt")
    assert st.file_counts()[()] > 4
    before = sorted(r.id for r in es.sql("SELECT id FROM zt").collect())
    es.sql("OPTIMIZE zt COMPACT MAX FILES 4")
    assert st.file_counts()[()] == 1
    after = sorted(r.id for r in es.sql("SELECT id FROM zt").collect())
    assert after == before and len(after) == 506
    v = st.version
    es.sql("OPTIMIZE zt COMPACT MAX FILES 4")  # under threshold: no-op
    assert st.version == v


def test_optimize_compact_zorder_combination_rejected(es):
    with pytest.raises(ValueError, match="separate layout"):
        es.sql("OPTIMIZE zt COMPACT ZORDER BY (x, y)")
