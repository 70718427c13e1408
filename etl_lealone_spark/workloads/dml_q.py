"""DML workloads (SURVEY.md §2.9) — the oracle-checkable transformation
semantics of UPDATE/DELETE/MERGE. The snapshot write path (SnapshotTable)
is exercised in tests/test_dml.py; these workloads verify the pure
relational core of each mutation against DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dml import (
    apply_delete,
    apply_update,
    apply_update_limit,
    merge_ansi,
    merge_by_key,
)
from ..tables import load_tables
from . import workload
from .helpers import dsum, o_dsum


# ---------------------------------------------------------------------------
# UPDATE ... SET ... WHERE (Update.java:125-200)
# ---------------------------------------------------------------------------
@workload(
    "update_projection",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    """,
    doc="UPDATE as projection: pending orders get +10% price (Update.java:125).",
)
def update_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    updated = apply_update(
        o,
        F.col("o_orderstatus") == "P",
        {"o_totalprice": F.col("o_totalprice") * 1.1},
    )
    return updated.select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# UPDATE ... LIMIT n (Update.java:44,139-150) — first n matching by PK
# ---------------------------------------------------------------------------
@workload(
    "update_with_limit",
    """
    WITH picked AS (
      SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_orderkey LIMIT 100
    )
    SELECT o.o_orderkey,
           CASE WHEN o.o_orderkey IN (SELECT o_orderkey FROM picked)
                THEN o.o_totalprice + 1000.0 ELSE o.o_totalprice END AS o_totalprice
    FROM orders o
    """,
    doc="UPDATE LIMIT 100: first 100 matching rows in PK order "
    "(reference scan-order semantics pinned to PK; Update.java:139-150).",
)
def update_with_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    updated = apply_update_limit(
        o,
        F.col("o_orderstatus") == "O",
        {"o_totalprice": F.col("o_totalprice") + 1000.0},
        limit=100,
        order_by=["o_orderkey"],
    )
    return updated.select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# DELETE WHERE (Delete.java:84-130) — NULL conditions keep the row
# ---------------------------------------------------------------------------
@workload(
    "delete_filter",
    f"""
    SELECT count(*) AS n_remaining, {o_dsum('o_totalprice')} AS total_remaining
    FROM orders
    WHERE NOT coalesce(o_totalprice > 150000.0, false)
    """,
    doc="DELETE as inverted filter w/ 3-valued logic (Delete.java:84).",
)
def delete_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    remaining = apply_delete(o, F.col("o_totalprice") > 150000.0)
    return remaining.agg(
        F.count(F.lit(1)).alias("n_remaining"),
        dsum(F.col("o_totalprice")).alias("total_remaining"),
    )


# ---------------------------------------------------------------------------
# MERGE INTO ... KEY(...) (Merge.java:35,146-230) — upsert by key
# ---------------------------------------------------------------------------
@workload(
    "merge_upsert",
    """
    WITH target AS (
      SELECT c_custkey AS k, c_acctbal AS acctbal FROM customer
    ),
    source AS (
      SELECT c_custkey AS k, c_acctbal + 100.0 AS acctbal
      FROM customer WHERE c_custkey <= 50
      UNION ALL SELECT 999991, 42.0
      UNION ALL SELECT 999992, 43.0
      UNION ALL SELECT 60, CAST(NULL AS DOUBLE)
    )
    SELECT coalesce(t.k, s.k) AS k,
           CASE WHEN s.k IS NOT NULL THEN s.acctbal ELSE t.acctbal END AS acctbal
    FROM target t FULL OUTER JOIN source s ON t.k = s.k
    """,
    doc="MERGE-by-KEY upsert: a matched source row replaces the target row "
    "wholesale — including NULL values (Merge.java:200-215 assigns "
    "ValueNull); unmatched source rows insert.",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    target = c.select(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("acctbal"))
    source = (
        c.filter(F.col("c_custkey") <= 50)
        .select(F.col("c_custkey").alias("k"), (F.col("c_acctbal") + 100.0).alias("acctbal"))
        .union(
            spark.createDataFrame(
                [(999991, 42.0), (999992, 43.0), (60, None)],
                schema="k long, acctbal double",
            )
        )
    )
    return merge_by_key(target, source, keys=["k"])


# ---------------------------------------------------------------------------
# ANSI MERGE USING (extension; Delta-style MERGE without Delta) — one
# full-outer join, branches from match flags (operators/dml.merge_ansi)
# ---------------------------------------------------------------------------
@workload(
    "merge_ansi",
    f"""
    WITH t AS (
      SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg FROM customer
    ),
    s AS (
      SELECT o_custkey AS k, {o_dsum('o_totalprice')} AS total
      FROM orders WHERE o_custkey <= 500 GROUP BY o_custkey
      UNION ALL
      SELECT o_custkey + 1000000 AS k, {o_dsum('o_totalprice')} AS total
      FROM orders WHERE o_custkey <= 20 GROUP BY o_custkey
    )
    SELECT coalesce(t.k, s.k) AS k,
           CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL AND s.total > 200000.0
                THEN s.total
                WHEN t.k IS NOT NULL THEN t.bal
                ELSE s.total END AS bal,
           CASE WHEN t.k IS NOT NULL THEN t.seg ELSE 'NEW' END AS seg
    FROM t FULL OUTER JOIN s ON t.k = s.k
    """,
    doc="ANSI MERGE: WHEN MATCHED AND guard THEN UPDATE, WHEN NOT MATCHED "
    "THEN INSERT — single full-outer-join kernel, guard-failing matches "
    "pass through, source-only rows insert.",
)
def merge_ansi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    tabs = load_tables(spark, sf_dir)
    c, o = tabs["customer"], tabs["orders"]
    target = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    base = (
        o.filter(F.col("o_custkey") <= 500)
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("total"))
        .select(F.col("o_custkey").alias("k"), "total")
    )
    extra = (
        o.filter(F.col("o_custkey") <= 20)
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("total"))
        .select((F.col("o_custkey") + 1000000).alias("k"), "total")
    )
    source = base.union(extra)
    return merge_ansi(
        target,
        source,
        on=F.expr("k = __s_k"),
        update_set={"bal": F.col("__s_total")},
        matched_guard=F.col("__s_total") > 200000.0,
        insert_values={
            "k": F.col("__s_k"),
            "bal": F.col("__s_total"),
            "seg": F.lit("NEW"),
        },
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history (extension — the standard warehouse
# dimension-maintenance pattern a 100 TB pipeline runs nightly: close
# the current row, open a new version, keep untouched rows current).
# The change batch is derived deterministically from orders (latest
# order date per customer = effective date; order count = the tracked
# attribute), so both engines rebuild the identical history. At scale
# this is one aggregation + one broadcast-or-shuffle join + a union —
# no iteration, no window over SinglePartition.
# ---------------------------------------------------------------------------
def _scd2_oracle(base_from: str) -> str:
    """One SQL for both SCD2 workloads, parameterized on the base
    snapshot date (3rd-pass review: duplicating the 20-line oracle
    invited one-sided edits; and the STREAMING twin needs a base date
    that PREDATES the whole o_orderdate range — its precondition audit
    rejects changes older than the base rows, so a base inside the
    range would make equivalence data-dependent and break at larger
    SFs where some customer's latest order lands before it)."""
    return f"""
    WITH upd AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS eff_date,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey AS custkey, CAST(0 AS BIGINT) AS n_orders,
           DATE '{base_from}' AS valid_from,
           CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
    FROM customer c LEFT JOIN upd u ON c.c_custkey = u.custkey
    WHERE u.custkey IS NULL
    UNION ALL
    SELECT c.c_custkey, CAST(0 AS BIGINT),
           DATE '{base_from}', u.eff_date, FALSE
    FROM customer c JOIN upd u ON c.c_custkey = u.custkey
    UNION ALL
    SELECT c.c_custkey, u.n_orders, u.eff_date,
           CAST(NULL AS DATE), TRUE
    FROM customer c JOIN upd u ON c.c_custkey = u.custkey
    """



def _scd2_stream_root(sf_dir: str) -> str:
    """Persisted SCD2-workload state root keyed by data + builder spec
    (helpers.persisted_state_root discipline, r7 verdict task 5): a warm
    root lets the workload return a LIVE lazy plan over the persisted
    history instead of a driver-collected local relation."""
    import inspect

    from ..operators import dml as dml_mod
    from ..streaming import scd2 as scd2_mod
    from .helpers import persisted_state_root

    spec = (
        inspect.getsource(scd2_mod)
        + inspect.getsource(dml_mod.SnapshotTable)
        + inspect.getsource(scd2_stream_compacted)
    )
    return persisted_state_root(
        sf_dir, ("customer", "orders"), spec, "etl_lealone_scd2wl"
    )


@workload(
    "scd2_stream_compacted",
    _scd2_oracle("1991-12-31"),
    doc="The streaming SCD2 applier (micro-batched CDC chunks through "
    "Scd2Applier: bucketed history, pruned rewrites, precondition audit, "
    "exactly-once marker) followed by small-file COMPACTION of the "
    "accreted history — hash-matched against the one-shot batch SQL, so "
    "the driver pins stream==batch equivalence AND compaction "
    "row-identity in one oracle.",
)
def scd2_stream_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..operators.dml import SnapshotTable
    from ..streaming.scd2 import Scd2Applier

    root = _scd2_stream_root(sf_dir)
    if not os.path.exists(os.path.join(root, "_wl_done")):
        t = load_tables(spark, sf_dir)
        base = t["customer"].select(
            F.col("c_custkey").alias("custkey"),
            F.lit(0).cast("bigint").alias("n_orders"),
        )
        changes = t["orders"].groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max("o_orderdate").alias("eff_date"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        build = f"{root}.build.{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        app = Scd2Applier(
            spark, build, "custkey", ["n_orders"],
            base=base, base_from="1991-12-31", n_buckets=8,
        )
        # three disjoint-key CDC chunks -> 3 pruned rewrites accreting
        # files per bucket; compact(0) then forces a full-bucket rewrite
        for i in range(3):
            app.process_batch(
                changes.filter(F.col("custkey") % 3 == i),
                batch_id=i,
                query_key="scd2_wl",
            )
        app.compact(max_files=0)
        with open(os.path.join(build, "_wl_done"), "w") as f:
            f.write("ok")
        os.makedirs(os.path.dirname(root), exist_ok=True)
        try:
            os.rename(build, root)
        except OSError:
            # lost a concurrent-build race: keep the winner's root
            shutil.rmtree(build, ignore_errors=True)
            if not os.path.exists(os.path.join(root, "_wl_done")):
                raise
    # a LIVE lazy plan over the persisted compacted history — the
    # partition-pruned parquet scan, not a collected local relation
    hist = SnapshotTable(spark, root, "dim_history", partition_by=["kb"])
    return hist.read().select(
        "custkey", "n_orders", "valid_from", "valid_to", "is_current"
    )


@workload(
    "scd2_dim_update",
    _scd2_oracle("1995-01-01"),
    doc="SCD2 dimension maintenance: close changed rows at the change-batch "
    "effective date, open new current versions, keep untouched rows — the "
    "full history union, hash-matched cross-engine.",
)
def scd2_dim_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    upd = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("eff_date"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    base_from = F.to_date(F.lit("1995-01-01"))
    joined = c.join(upd, c.c_custkey == upd.custkey, "left")
    untouched = joined.filter(F.col("custkey").isNull()).select(
        F.col("c_custkey").alias("custkey"),
        F.lit(0).cast("bigint").alias("n_orders"),
        base_from.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changed = joined.filter(F.col("custkey").isNotNull())
    closed = changed.select(
        F.col("c_custkey").alias("custkey"),
        F.lit(0).cast("bigint").alias("n_orders"),
        base_from.alias("valid_from"),
        F.col("eff_date").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed.select(
        F.col("c_custkey").alias("custkey"),
        F.col("n_orders"),
        F.col("eff_date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return untouched.unionAll(closed).unionAll(opened)


# ---------------------------------------------------------------------------
# snapshot time travel (AS-OF reads over the versioned mutation history)
# ---------------------------------------------------------------------------
def _tt_state_root(sf_dir: str) -> str:
    """Persisted time-travel-workload state root (shared
    helpers.persisted_state_root discipline): regenerated testdata or a
    code change to SnapshotTable/this workload can never silently reuse
    stale version history."""
    import inspect

    from ..operators import dml as dml_mod
    from .helpers import persisted_state_root

    spec = inspect.getsource(dml_mod.SnapshotTable) + inspect.getsource(
        snapshot_time_travel
    )
    return persisted_state_root(
        sf_dir, ("orders",), spec, "etl_lealone_ttwl"
    )


_TT_ORACLE = """
    WITH dim AS (
      SELECT o_custkey AS custkey, o_custkey % 8 AS pk,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS spend
      FROM orders GROUP BY o_custkey
    ),
    v2 AS (
      SELECT custkey, pk,
             CASE WHEN pk = 3 THEN n_orders + 100 ELSE n_orders END AS n_orders,
             spend
      FROM dim
    ),
    v3 AS (SELECT * FROM v2 WHERE custkey % 7 <> 0)
    SELECT 1 AS version, pk, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_orders) AS BIGINT) AS sum_orders,
           CAST(sum(spend) AS DOUBLE) AS sum_spend
    FROM dim GROUP BY pk
    UNION ALL
    SELECT 2, pk, CAST(count(*) AS BIGINT), CAST(sum(n_orders) AS BIGINT),
           CAST(sum(spend) AS DOUBLE)
    FROM v2 GROUP BY pk
    UNION ALL
    SELECT 3, pk, CAST(count(*) AS BIGINT), CAST(sum(n_orders) AS BIGINT),
           CAST(sum(spend) AS DOUBLE)
    FROM v3 GROUP BY pk
"""


@workload(
    "snapshot_time_travel",
    _TT_ORACLE,
    doc="AS-OF reads over the versioned snapshot history: create a "
    "partitioned per-customer dim (v1), a partition-PRUNED update that "
    "rewrites only the pk=3 partition and links the rest (v2), a "
    "delete (v3) — then read ALL THREE versions back and aggregate "
    "each. The oracle re-derives every version's state from the base "
    "parquet, so the driver pins that time travel returns exactly the "
    "pre-mutation states (the reference's MVCC snapshot-read contract, "
    "MVCCTransactionEngine.java, re-expressed as immutable snapshot "
    "dirs + a version pointer).",
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..operators.dml import SnapshotTable

    root = _tt_state_root(sf_dir)
    if not os.path.exists(os.path.join(root, "_wl_done")):
        o = load_tables(spark, sf_dir)["orders"]
        dim = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("spend"),
        ).withColumn("pk", F.col("custkey") % 8)
        build = f"{root}.build.{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        t = SnapshotTable(spark, build, "dim_tt", partition_by=["pk"])
        t.create(dim)                                          # v1
        t.update(                                              # v2 (pruned)
            F.col("pk") == 3,
            {"n_orders": F.col("n_orders") + 100},
            partition_filter=F.col("pk") == 3,
        )
        t.delete(F.col("custkey") % 7 == 0)                    # v3
        with open(os.path.join(build, "_wl_done"), "w") as f:
            f.write("ok")
        os.makedirs(os.path.dirname(root), exist_ok=True)
        try:
            os.rename(build, root)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
            if not os.path.exists(os.path.join(root, "_wl_done")):
                raise
    t = SnapshotTable(spark, root, "dim_tt", partition_by=["pk"])

    def agg_of(version: int) -> DataFrame:
        # snapshot versions are 0-based (create -> v0); the workload
        # labels them 1..3 to match the oracle's state numbering
        return (
            t.read(version=version - 1)
            .groupBy(F.col("pk").cast("long").alias("pk"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_orders").cast("long").alias("sum_orders"),
                F.sum("spend").cast("double").alias("sum_spend"),
            )
            .select(F.lit(version).cast("int").alias("version"), "*")
        )

    return agg_of(1).unionByName(agg_of(2)).unionByName(agg_of(3))


# ---------------------------------------------------------------------------
# snapshot lineage: CLONE -> mutate -> RESTORE -> DESCRIBE HISTORY
# ---------------------------------------------------------------------------
def _lineage_state_root(sf_dir: str) -> str:
    import inspect

    from ..operators import dml as dml_mod
    from .helpers import persisted_state_root

    spec = inspect.getsource(dml_mod.SnapshotTable) + inspect.getsource(
        _ensure_lineage_root
    )
    return persisted_state_root(sf_dir, ("orders",), spec, "etl_lealone_clonewl")


def _ensure_lineage_root(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, persisted) the clone/restore lineage state both
    snapshot_clone_restore and snapshot_diff_cdc read: src = per-customer
    dim (v0 create, v1 insert, v2 update custkey%3, v3 restore-to-v1);
    cp = shallow clone of src@v1 with divergent UPDATE+DELETE. The full
    SQL surface runs HERE — a history drift fails the build, not just
    the hash compare."""
    import os
    import shutil

    from ..session import EngineSession

    root = _lineage_state_root(sf_dir)
    if os.path.exists(os.path.join(root, "_wl_done")):
        return root
    o = load_tables(spark, sf_dir)["orders"]
    o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    ).createOrReplaceTempView("snapcr_dim_src")
    build = f"{root}.build.{os.getpid()}"
    shutil.rmtree(build, ignore_errors=True)
    es = EngineSession(spark, warehouse=build)
    es.sql("CREATE TABLE snapcr_src (custkey BIGINT PRIMARY KEY, n_orders BIGINT)")
    es.sql("INSERT INTO snapcr_src SELECT custkey, n_orders FROM snapcr_dim_src")
    es.sql("CREATE TABLE snapcr_cp CLONE snapcr_src")
    es.sql("UPDATE snapcr_cp SET n_orders = n_orders + 1000 WHERE custkey % 5 = 0")
    es.sql("DELETE FROM snapcr_cp WHERE custkey % 11 = 0")
    es.sql("UPDATE snapcr_src SET n_orders = 0 WHERE custkey % 3 = 0")
    es.sql("RESTORE TABLE snapcr_src TO VERSION AS OF 1")
    hist = {
        n: [(r["version"], r["is_current"])
            for r in es.sql(f"DESCRIBE HISTORY {n}").collect()]
        for n in ("snapcr_src", "snapcr_cp")
    }
    assert hist["snapcr_src"] == [(0, False), (1, False), (2, False), (3, True)]
    assert hist["snapcr_cp"] == [(0, False), (1, False), (2, True)]
    spark.catalog.dropTempView("snapcr_dim_src")
    with open(os.path.join(build, "_wl_done"), "w") as f:
        f.write("ok")
    os.makedirs(os.path.dirname(root), exist_ok=True)
    try:
        os.rename(build, root)
    except OSError:
        shutil.rmtree(build, ignore_errors=True)
        if not os.path.exists(os.path.join(root, "_wl_done")):
            raise
    # the EngineSession registered temp views over the BUILD paths,
    # which the rename just invalidated — drop them so an accidental
    # later reference fails loudly instead of reading a dead dir
    for v in ("snapcr_src", "snapcr_cp"):
        spark.catalog.dropTempView(v)
    return root


_LINEAGE_ORACLE = """
    WITH dim AS (
      SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    cp AS (
      SELECT custkey,
             CASE WHEN custkey % 5 = 0 THEN n_orders + 1000
                  ELSE n_orders END AS n_orders
      FROM dim WHERE custkey % 11 <> 0
    ),
    pre AS (
      SELECT custkey,
             CASE WHEN custkey % 3 = 0 THEN 0 ELSE n_orders END AS n_orders
      FROM dim
    )
    SELECT 'src_restored' AS state, CAST(custkey % 4 AS BIGINT) AS grp,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_orders) AS BIGINT) AS sum_orders
    FROM dim GROUP BY grp
    UNION ALL
    SELECT 'clone', CAST(custkey % 4 AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(n_orders) AS BIGINT)
    FROM cp GROUP BY CAST(custkey % 4 AS BIGINT)
    UNION ALL
    SELECT 'src_pre_restore', CAST(custkey % 4 AS BIGINT),
           CAST(count(*) AS BIGINT), CAST(sum(n_orders) AS BIGINT)
    FROM pre GROUP BY CAST(custkey % 4 AS BIGINT)
    UNION ALL
    SELECT 'hist_src', CAST(v AS BIGINT), CAST(cur AS BIGINT),
           CAST(0 AS BIGINT)
    FROM (VALUES (0, 0), (1, 0), (2, 0), (3, 1)) t(v, cur)
    UNION ALL
    SELECT 'hist_clone', CAST(v AS BIGINT), CAST(cur AS BIGINT),
           CAST(0 AS BIGINT)
    FROM (VALUES (0, 0), (1, 0), (2, 1)) t(v, cur)
"""


@workload(
    "snapshot_clone_restore",
    _LINEAGE_ORACLE,
    doc="The full snapshot-lineage surface through SQL (r8 verdict task "
    "3): CREATE TABLE (v0) -> INSERT a per-customer dim (v1) -> CREATE "
    "TABLE ... CLONE (zero-copy, own version chain) -> UPDATE + DELETE "
    "the CLONE (copy-on-write divergence, v1/v2) -> UPDATE the SOURCE "
    "(v2) -> RESTORE the source TO VERSION AS OF 1 (a new v3 that "
    "link-clones v1) -> DESCRIBE HISTORY both. The oracle re-derives "
    "every state from the base parquet plus literal expected version "
    "chains, so the driver pins that (a) restore returns exactly the "
    "pre-clone content, (b) the clone kept its divergent mutations, "
    "(c) the PRE-restore source state stays readable (lineage "
    "preserved), and (d) both history chains carry the right current "
    "pointer. The reference's MVCC version metadata "
    "(MVCCTransactionEngine.java) re-expressed as snapshot dirs.",
)
def snapshot_clone_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dml import SnapshotTable

    root = _ensure_lineage_root(spark, sf_dir)
    # lazy plans over the persisted chains (relative links survive the
    # build->root rename; pinned by test_snapshot_tree_is_relocatable)
    src = SnapshotTable(spark, root, "snapcr_src")
    cp = SnapshotTable(spark, root, "snapcr_cp")

    def agg_of(df: DataFrame, state: str) -> DataFrame:
        return (
            df.groupBy((F.col("custkey") % 4).cast("long").alias("grp"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_orders").cast("long").alias("sum_orders"),
            )
            .select(F.lit(state).alias("state"), "grp", "n_rows", "sum_orders")
        )

    def hist_of(t: SnapshotTable, state: str) -> DataFrame:
        rows = [(state, v, int(v == t.version), 0) for v in t.versions()]
        return spark.createDataFrame(
            rows, "state string, grp long, n_rows long, sum_orders long"
        )

    return (
        agg_of(src.read(), "src_restored")
        .unionByName(agg_of(cp.read(), "clone"))
        .unionByName(agg_of(src.read(version=2), "src_pre_restore"))
        .unionByName(hist_of(src, "hist_src"))
        .unionByName(hist_of(cp, "hist_clone"))
    )


@workload(
    "snapshot_diff_cdc",
    """
    WITH dim AS (
      SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    chg AS (SELECT custkey, n_orders FROM dim WHERE custkey % 3 = 0)
    SELECT 'v1_v2' AS step, custkey, CAST(0 AS BIGINT) AS n_orders,
           'update' AS change_type
    FROM chg
    UNION ALL
    SELECT 'v2_v3', custkey, n_orders, 'update' FROM chg
    """,
    doc="CDC read between retained snapshot versions "
    "(operators.dml.snapshot_diff — the SQL shell's DIFF(t, v1, v2)): "
    "diff v1->v2 of the lineage table captures exactly the UPDATE's "
    "touched rows (new-side image, n_orders=0), and v2->v3 captures the "
    "RESTORE undoing them (back to the original counts) — 'the snapshot "
    "IS the log'. One full-outer join on the key + two map-side row "
    "hashes per diff; unchanged rows never leave the scan. The oracle "
    "re-derives both change sets from the base parquet.",
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dml import SnapshotTable, snapshot_diff

    root = _ensure_lineage_root(spark, sf_dir)
    src = SnapshotTable(spark, root, "snapcr_src")

    def step(label: str, v_old: int, v_new: int) -> DataFrame:
        return snapshot_diff(
            src.read(version=v_old), src.read(version=v_new), ["custkey"]
        ).select(
            F.lit(label).alias("step"), "custkey", "n_orders", "change_type"
        )

    return step("v1_v2", 1, 2).unionByName(step("v2_v3", 2, 3))
