"""Range-join workload: point-in-interval matching via bucketized
equi-join (operators/joins.py:range_join_bucketed).

The oracle expresses the SAME semantics as the naive BETWEEN theta
join — proving the bucketed rewrite finds every candidate exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import range_join_bucketed
from ..tables import load_tables
from . import workload
from .helpers import o_dsum


@workload(
    "range_join_events",
    f"""
    SELECT o_orderkey,
           count(*) AS n_pts,
           {o_dsum('l_quantity')} AS sum_qty
    FROM (SELECT o_orderkey, o_orderdate,
                 o_orderdate + INTERVAL 7 DAY AS end_ts
          FROM orders WHERE o_totalprice > 450000) i
    JOIN (SELECT l_shipdate, l_quantity
          FROM lineitem WHERE l_quantity > 45) p
      ON p.l_shipdate >= i.o_orderdate AND p.l_shipdate <= i.end_ts
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
    doc="Range join (point-in-interval): bucketized equi-join plan vs "
    "the oracle's naive BETWEEN theta join — identical matches, "
    "O(n+m) instead of O(n·m).",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    intervals = (
        t["orders"]
        .filter(F.col("o_totalprice") > 450000)
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("end_ts"),
        )
    )
    points = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 45)
        .select("l_shipdate", "l_quantity")
    )
    joined = range_join_bucketed(
        points, intervals, "l_shipdate", "o_orderdate", "end_ts", bucket_days=7
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
                "sum_qty"
            ),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# interval-overlap join: promo windows x order-fulfillment windows
# ---------------------------------------------------------------------------
@workload(
    "interval_overlap_orders",
    """
    WITH promo AS (
      SELECT o_orderkey AS promo_id,
             cast(o_orderdate as date) AS ps,
             cast(o_orderdate as date) + INTERVAL 21 DAY AS pe
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    win AS (
      SELECT o_orderkey,
             cast(o_orderdate as date) AS ws,
             cast(o_orderdate as date)
               + to_days(cast(o_orderkey % 14 + 2 as int)) AS we
      FROM orders WHERE o_totalprice > 300000
    )
    SELECT promo_id, count(*) AS n_overlaps,
           min(o_orderkey) AS first_order
    FROM promo JOIN win
      ON promo.ps <= win.we AND win.ws <= promo.pe
    GROUP BY promo_id
    """,
    doc="Interval-overlap join (both sides are date ranges): bucketized "
    "equi-join with exact-once reference-point ownership (no dedup "
    "stage) vs the oracle's naive theta join — identical matches, one "
    "shuffle instead of O(n*m).",
)
def interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import interval_overlap_join

    o = load_tables(spark, sf_dir)["orders"]
    promo = o.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("promo_id"),
        F.col("o_orderdate").cast("date").alias("ps"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 21 DAY")).alias(
            "pe"
        ),
    )
    win = o.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("ws"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 14 + 2).cast("int"),
        ).alias("we"),
    )
    joined = interval_overlap_join(promo, win, "ps", "pe", "ws", "we", bucket_days=7)
    return joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.min("o_orderkey").alias("first_order"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning
# ---------------------------------------------------------------------------
_BLOOM_M = 16384
_BLOOM_K = 3
_BLOOM_TAG = "wl"


def _bloom_prune_sql() -> str:
    """Oracle twin of operators/joins.bloom_bitmap + bloom_pass_flag:
    recomputes the k bit positions per key from the shared xhash family
    and counts pass / member / false-positive probe rows per group."""
    from ..operators.xhash import hconsts, md5_hash60_sql, mix60_sql

    lanes = [
        f"({mix60_sql('h', *hconsts(f'bloom:{_BLOOM_TAG}', i))}) % {_BLOOM_M}"
        for i in range(_BLOOM_K)
    ]
    build_positions = "\n      UNION ALL\n      ".join(
        f"SELECT {lane} AS pos FROM bh" for lane in lanes
    )
    probe_pos_cols = ", ".join(f"{lane} AS p{i}" for i, lane in enumerate(lanes))
    pass_pred = " AND ".join(
        f"(p{i} IN (SELECT pos FROM bits))" for i in range(_BLOOM_K)
    )
    return f"""
    WITH bk AS (
      SELECT DISTINCT o_orderkey AS okey
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    ),
    bh AS (
      SELECT {md5_hash60_sql("CAST(okey AS VARCHAR)")} AS h FROM bk
    ),
    bits AS (
      SELECT DISTINCT pos FROM (
      {build_positions}
      )
    ),
    pp AS (
      SELECT l_returnflag, l_orderkey, {probe_pos_cols}
      FROM (SELECT l_returnflag, l_orderkey,
                   {md5_hash60_sql("CAST(l_orderkey AS VARCHAR)")} AS h
            FROM lineitem)
    ),
    fl AS (
      SELECT l_returnflag,
             ({pass_pred}) AS pass,
             l_orderkey IN (SELECT okey FROM bk) AS member
      FROM pp
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
           CAST(sum(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos,
           CAST((SELECT count(*) FROM bits) AS BIGINT) AS bloom_bits_set
    FROM fl GROUP BY l_returnflag
    """


@workload(
    "bloom_join_prune",
    _bloom_prune_sql(),
    doc="Bloom-filter semi-join reduction (explicit runtime-filter form): "
    "a 16384-bit / 3-lane bitmap over the filtered orders keys is "
    "broadcast as ONE row and applied as a map-side predicate on the "
    "lineitem scan — the 100 TB join-pruning pattern where the probe "
    "side never shuffles to discover non-matches. The oracle recomputes "
    "bitmap and membership bit-for-bit from the shared xhash family and "
    "pins pass/member/false-positive counts per return flag, plus bitmap "
    "saturation (bloom_bits_set).",
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import bloom_bitmap, bloom_pass_flag

    t = load_tables(spark, sf_dir)
    o, li = t["orders"], t["lineitem"]
    build = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    bitmap = bloom_bitmap(build, "o_orderkey", _BLOOM_M, _BLOOM_K, _BLOOM_TAG)
    members = (
        build.select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
        .withColumn("is_member", F.lit(True))
    )
    flagged = (
        li.select("l_orderkey", "l_returnflag")
        .crossJoin(F.broadcast(bitmap))
        .withColumn(
            "pass", bloom_pass_flag(F.col("l_orderkey"), _BLOOM_M, _BLOOM_K, _BLOOM_TAG)
        )
        # plain join (AQE decides): the exact-member key set is
        # build-side-sized — unbounded in general, unlike the bitmap
        .join(members, "l_orderkey", "left")
        .withColumn("member", F.coalesce(F.col("is_member"), F.lit(False)))
    )
    return flagged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("pass").cast("long")).cast("long").alias("n_pass"),
        F.sum(F.col("member").cast("long")).cast("long").alias("n_member"),
        F.sum((F.col("pass") & ~F.col("member")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.max("bloom_bits_set").cast("long").alias("bloom_bits_set"),
    )


@workload(
    "salted_join_skewed",
    f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           {o_dsum('l_quantity')} AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Salted equi-join (operators/joins.salted_join): the pathological-"
    "skew fix — left side salted into 16 sub-keys, right side replicated "
    "16x, join on (key, salt) so one hot key's shuffle load spreads over "
    "16 reducers. Salting is PHYSICAL only: the oracle is the plain "
    "join + aggregate, pinning that the rewrite never changes semantics "
    "(the contract that lets a 100 TB job switch strategies freely).",
)
def salted_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    t = load_tables(spark, sf_dir)
    left = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    right = t["orders"].select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    return (
        salted_join(left, right, "okey", salt=16)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# bucketed co-located join
# ---------------------------------------------------------------------------
def _bucketed_root(sf_dir: str) -> tuple[str, str]:
    """(persisted root, content key) for the bucketed twin layout —
    shared helpers.persisted_state_root discipline."""
    import inspect
    import os

    from ..operators import joins as joins_mod
    from .helpers import persisted_state_root

    spec = inspect.getsource(joins_mod.write_bucketed) + inspect.getsource(
        bucketed_colocated_join
    )
    root = persisted_state_root(
        sf_dir, ("orders", "lineitem"), spec, "etl_lealone_bucketwl"
    )
    return root, os.path.basename(root)[:12]


@workload(
    "bucketed_colocated_join",
    f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           {o_dsum('l_quantity')} AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Co-located join over bucketed layout (operators/joins."
    "write_bucketed + colocated_join): both sides persisted hash-"
    "bucketed-and-sorted on the join key, so the join runs with ZERO "
    "exchanges — the recurring-fact-join layout that removes the "
    "two-sided 100 TB shuffle (plan pinned by test_plans::"
    "test_bucketed_join_no_exchange). Oracle is the plain SQL join: "
    "the layout is physical only, semantics identical.",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..operators.joins import colocated_join, write_bucketed

    root, key = _bucketed_root(sf_dir)
    specs = (
        ("orders", "okey BIGINT, o_orderpriority STRING"),
        ("lineitem", "okey BIGINT, l_quantity DOUBLE"),
    )
    if not os.path.exists(os.path.join(root, "_wl_done")):
        t = load_tables(spark, sf_dir)
        frames = {
            "orders": t["orders"].select(
                F.col("o_orderkey").alias("okey"), "o_orderpriority"
            ),
            "lineitem": t["lineitem"].select(
                F.col("l_orderkey").alias("okey"), "l_quantity"
            ),
        }
        build = f"{root}.build.{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        for sub, _schema in specs:
            stg = f"wlbstg_{key}_{sub}_{os.getpid()}"
            spark.sql(f"DROP TABLE IF EXISTS {stg}")
            write_bucketed(
                frames[sub], stg, "okey", num_buckets=16,
                path=os.path.join(build, sub),
            )
            # drop only the session metadata — the EXTERNAL files stay
            spark.sql(f"DROP TABLE IF EXISTS {stg}")
        with open(os.path.join(build, "_wl_done"), "w") as f:
            f.write("ok")
        os.makedirs(os.path.dirname(root), exist_ok=True)
        try:
            os.rename(build, root)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
            if not os.path.exists(os.path.join(root, "_wl_done")):
                raise
    # re-attach the persisted bucketed layout in THIS session's catalog:
    # same bucket spec as the writer, so the scan reports bucketing and
    # the join plans with zero exchanges
    names = {}
    for sub, schema in specs:
        tbl = f"wlb_{key}_{sub}"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {tbl} ({schema}) USING PARQUET "
            f"CLUSTERED BY (okey) SORTED BY (okey) INTO 16 BUCKETS "
            f"LOCATION '{os.path.join(root, sub)}'"
        )
        names[sub] = tbl
    joined = colocated_join(spark, names["orders"], names["lineitem"], "okey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("okey").cast("long").alias("n_orders"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )
