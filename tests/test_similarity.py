"""Similarity operator tests: brute-force correctness, LSH recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lealone_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)


def _queries(tables):
    return tables["embeddings"].filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_bruteforce_self_is_top1(tables):
    out = brute_force_topk(tables["embeddings"], _queries(tables), k=5)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter("rnk = 1").collect()}
    # a vector's nearest neighbour is itself (cosine 1.0)
    assert top1 == {0: 0, 1: 1, 2: 2}
    sims = {r["query_id"]: r["cosine_sim"] for r in out.filter("rnk = 1").collect()}
    assert all(abs(s - 1.0) < 1e-6 for s in sims.values())


def test_bruteforce_k_rows_per_query(tables):
    out = brute_force_topk(tables["embeddings"], _queries(tables), k=7)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 7 for r in counts)


def test_lsh_recall_vs_bruteforce(tables):
    exact = brute_force_topk(tables["embeddings"], _queries(tables), k=10)
    approx = lsh_topk(tables["embeddings"], _queries(tables), k=10, dim=64)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # self-match must always be found (it shares the exact bucket)
    assert all((q, q) in a for q in (0, 1, 2))
    recall = len(e & a) / len(e)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_embedding_near_dup_self_join_shape(tables):
    out = embedding_near_dup_pairs(tables["embeddings"], threshold=0.99, dim=64)
    for r in out.collect():
        assert r["id_a"] < r["id_b"]
        assert r["cosine_sim"] >= 0.99


def test_ivf_self_found_and_recall(tables):
    from etl_lealone_spark.operators.similarity import ivf_topk

    exact = brute_force_topk(tables["embeddings"], _queries(tables), k=10)
    approx = ivf_topk(tables["embeddings"], k=10, n_probe=4, n_queries=3)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # a query's own cluster is always probed first → self-match guaranteed
    assert all((q, q) in a for q in (0, 1, 2))
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # exactly k rows per query, ranks contiguous
    counts = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 10 for r in counts)


def test_brute_force_int_matches_fold(tables, spark):
    """The Arrow/numpy int64 scorer must be bit-identical to the
    interpreted JVM integer fold (same quantization, same division)."""
    from etl_lealone_spark.operators.similarity import (
        brute_force_topk_int,
        int_dot,
        quantize,
    )
    from pyspark.sql.window import Window

    e = tables["embeddings"]
    fast = brute_force_topk_int(e, k=10, n_queries=3)
    cq = e.select(F.col("vec_id"), quantize(F.col("embedding")).alias("cvec"))
    q = cq.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("cvec").alias("qvec")
    )
    scored = cq.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            int_dot(F.col("cvec"), F.col("qvec")).cast("double")
            / (
                F.sqrt(int_dot(F.col("cvec"), F.col("cvec")).cast("double"))
                * F.sqrt(int_dot(F.col("qvec"), F.col("qvec")).cast("double"))
            )
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    slow = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "vec_id", "cosine_sim", "rnk")
    )
    fa = sorted(map(tuple, fast.collect()))
    sl = sorted(map(tuple, slow.collect()))
    assert fa == sl  # exact equality, including the float sims


def test_ivf_index_build_probe_matches_inline(tables, spark, tmp_path):
    """Persisted build/probe must reproduce the inline ivf_topk result,
    survive re-open, and partition-prune the probe scan."""
    from etl_lealone_spark.operators.similarity import IvfIndex, ivf_topk, quantize

    e = tables["embeddings"]
    inline = sorted(map(tuple, ivf_topk(e, k=10, n_probe=4, n_queries=3).collect()))
    root = str(tmp_path / "ivfidx")
    idx = IvfIndex(spark, root)
    idx.build(e)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("qvec")
    )
    out = idx.topk(q, k=10, n_probe=4)
    assert sorted(map(tuple, out.collect())) == inline
    # re-open from disk (no rebuild) gives the same answer
    idx2 = IvfIndex(spark, root)
    assert idx2.exists()
    out2 = idx2.topk(q, k=10, n_probe=4)
    assert sorted(map(tuple, out2.collect())) == inline
    # the probe is partition-pruned at the parquet source
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cid" in plan


def test_ivf_topk_batch_matches_per_query_path(tables, spark, tmp_path):
    """topk_batch (executor-side probe assignment + cogrouped batch
    scoring, no driver query collect) is row-identical to topk —
    including the float sims — and still partition-prunes the assign
    scan."""
    from etl_lealone_spark.operators.similarity import IvfIndex, quantize

    e = tables["embeddings"]
    root = str(tmp_path / "ivfb")
    idx = IvfIndex(spark, root)
    idx.build(e)
    q = e.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("qvec")
    )
    per_query = sorted(map(tuple, idx.topk(q, k=10, n_probe=4).collect()))
    batch = idx.topk_batch(q, k=10, n_probe=4)
    assert sorted(map(tuple, batch.collect())) == per_query
    # repartitioned input (different Arrow batching) must not change it
    batch2 = idx.topk_batch(q.repartition(5), k=10, n_probe=4)
    assert sorted(map(tuple, batch2.collect())) == per_query
    # probe stays partition-pruned at the parquet source
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cid" in plan


def test_ivf_compact_preserves_probe_results(tables, spark, tmp_path):
    """append() accretes one file per touched cid per batch; compact()
    collapses hot partitions to one file each with probe results and
    index rows identical, and under-threshold partitions untouched."""
    import os

    from etl_lealone_spark.operators.similarity import IvfIndex, quantize

    e = tables["embeddings"]
    lo = e.filter(F.col("vec_id") < 40)
    root = str(tmp_path / "ivfc")
    idx = IvfIndex(spark, root)
    idx.build(lo)
    # several small appends -> file accretion in the touched cids
    hi = e.filter(F.col("vec_id") >= 40)
    ids = [r["vec_id"] for r in hi.select("vec_id").collect()]
    for i in range(0, len(ids), max(1, len(ids) // 4)):
        chunk = ids[i : i + max(1, len(ids) // 4)]
        idx.append(hi.filter(F.col("vec_id").isin(chunk)))
    assign_root = os.path.join(root, "assign")

    def counts():
        out = {}
        for entry in os.listdir(assign_root):
            d = os.path.join(assign_root, entry)
            if entry.startswith("cid=") and os.path.isdir(d):
                out[entry] = sum(
                    1 for f in os.listdir(d) if not f.startswith(("_", "."))
                )
        return out

    before_counts = counts()
    assert max(before_counts.values()) > 2
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("qvec")
    )
    before_topk = sorted(map(tuple, idx.topk(q, k=10, n_probe=4).collect()))
    before_rows = sorted(
        map(tuple, spark.read.parquet(assign_root).select("vec_id", "cid").collect())
    )
    n = idx.compact(max_files=2)
    assert n >= 1
    after_counts = counts()
    for entry, c in after_counts.items():
        if before_counts[entry] > 2:
            assert c == 1  # hot partition collapsed
        else:
            assert c == before_counts[entry]  # cold partition untouched
    assert sorted(
        map(tuple, spark.read.parquet(assign_root).select("vec_id", "cid").collect())
    ) == before_rows
    assert sorted(map(tuple, idx.topk(q, k=10, n_probe=4).collect())) == before_topk
    # idempotent: nothing left over threshold
    assert idx.compact(max_files=2) == 0


def test_ivf_compact_crash_recovery(tables, spark, tmp_path):
    """A crash between compact()'s two renames leaves the cid partition
    only in the _compact_old_ backup; the next index construction (or
    compact) must restore it before any probe can miss the cluster."""
    import os
    import shutil

    from etl_lealone_spark.operators.similarity import IvfIndex, quantize

    e = tables["embeddings"]
    root = str(tmp_path / "ivfr")
    idx = IvfIndex(spark, root)
    idx.build(e)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("qvec")
    )
    want = sorted(map(tuple, idx.topk(q, k=10, n_probe=4).collect()))
    assign_root = os.path.join(root, "assign")
    victim = sorted(
        d for d in os.listdir(assign_root) if d.startswith("cid=")
    )[0]
    # simulate the crash window: live dir moved to backup, staging lost
    os.rename(
        os.path.join(assign_root, victim),
        os.path.join(root, f"_compact_old_{victim}"),
    )
    os.makedirs(os.path.join(root, "_compact_staging"), exist_ok=True)
    idx2 = IvfIndex(spark, root)  # __init__ self-heals
    assert os.path.isdir(os.path.join(assign_root, victim))
    assert not os.path.isdir(os.path.join(root, "_compact_staging"))
    assert sorted(map(tuple, idx2.topk(q, k=10, n_probe=4).collect())) == want
    # the swap-finished-cleanup-lost polarity: backup beside a live dir
    shutil.copytree(
        os.path.join(assign_root, victim),
        os.path.join(root, f"_compact_old_{victim}"),
    )
    idx3 = IvfIndex(spark, root)
    assert not os.path.isdir(os.path.join(root, f"_compact_old_{victim}"))
    assert sorted(map(tuple, idx3.topk(q, k=10, n_probe=4).collect())) == want


def test_ivf_topk_query_cap_enforced(tables, spark, tmp_path):
    """The interactive topk path collects queries driver-side; the
    small-query-set contract is enforced (r7 verdict residual #3): a
    set past max_queries raises a typed error naming topk_batch, and
    the collect itself is LIMIT-bounded so the driver never holds more
    than max_queries + 1 rows either way."""
    import pytest

    from etl_lealone_spark.operators.similarity import IvfIndex, quantize

    e = tables["embeddings"]
    root = str(tmp_path / "ivfcap")
    idx = IvfIndex(spark, root)
    idx.build(e)
    q = e.select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("qvec")
    )
    with pytest.raises(ValueError, match="topk_batch"):
        idx.topk(q, k=5, n_probe=2, max_queries=10)
    # at or under the cap the path still works
    out = idx.topk(q.limit(10), k=5, n_probe=2, max_queries=10)
    assert out.select("query_id").distinct().count() == 10


def test_ivf_compact_lock_excludes_recovery_and_compact(tables, spark, tmp_path):
    """While one process holds the compaction lock (simulated with a
    foreign flock fd), a concurrent construct's _recover_compaction
    must NOT touch the staging dir or backups, and a concurrent
    compact() must skip (return 0) instead of interleaving with the
    in-flight swap (r7 advisor finding). After release, recovery heals
    normally."""
    import fcntl
    import os

    from etl_lealone_spark.operators.similarity import IvfIndex, quantize

    e = tables["embeddings"]
    root = str(tmp_path / "ivflock")
    idx = IvfIndex(spark, root)
    idx.build(e)
    assign_root = os.path.join(root, "assign")
    victim = sorted(d for d in os.listdir(assign_root) if d.startswith("cid="))[0]
    # an in-flight compact: live dir moved to backup, staging present
    os.rename(
        os.path.join(assign_root, victim),
        os.path.join(root, f"_compact_old_{victim}"),
    )
    os.makedirs(os.path.join(root, "_compact_staging"), exist_ok=True)
    fd = os.open(os.path.join(root, "_compact.lock"), os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        idx2 = IvfIndex(spark, root)  # construct while "compacting"
        # recovery skipped: staging intact, backup untouched, live still gone
        assert os.path.isdir(os.path.join(root, "_compact_staging"))
        assert os.path.isdir(os.path.join(root, f"_compact_old_{victim}"))
        assert not os.path.isdir(os.path.join(assign_root, victim))
        assert idx2.compact(max_files=0) == 0  # concurrent compact skips
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    # lock released (as after a crash): the next construct heals
    idx3 = IvfIndex(spark, root)
    assert os.path.isdir(os.path.join(assign_root, victim))
    assert not os.path.isdir(os.path.join(root, "_compact_staging"))
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("qvec")
    )
    assert idx3.topk(q, k=5, n_probe=2).count() == 15


def test_hard_negatives_excludes_same_label_and_matches_reference(spark):
    import numpy as np

    from etl_lealone_spark.operators.similarity import hard_negatives_int

    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)], int(i % 3))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives_int(df, k=4, n_queries=6).collect()
    labels = {i: i % 3 for i in range(60)}
    # no same-label candidate, no self-match, exactly k per query
    by_q = {}
    for r in got:
        assert labels[r["vec_id"]] != labels[r["query_id"]]
        assert r["neg_label"] == labels[r["vec_id"]]
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(6))
    assert all(len(v) == 4 for v in by_q.values())
    # reference: exact int-quantized cosine in numpy, same tie-break
    q = {r[0]: np.floor(np.array([float(np.float32(x)) for x in r[1]]) * 1e6 + 0.5).astype(np.int64)
         for r in rows if r[0] < 6}
    c = {r[0]: np.floor(np.array([float(np.float32(x)) for x in r[1]]) * 1e6 + 0.5).astype(np.int64)
         for r in rows}
    for qid, qv in q.items():
        sims = []
        for cid, cv in c.items():
            if labels[cid] == labels[qid]:
                continue
            s = float(cv @ qv) / (np.sqrt(float(cv @ cv)) * np.sqrt(float(qv @ qv)))
            sims.append((-s, cid))
        expect = [cid for _, cid in sorted(sims)[:4]]
        assert [r["vec_id"] for r in sorted(by_q[qid], key=lambda r: r["rnk"])] == expect


def test_hard_negatives_query_cap(spark):
    import pytest as _pytest

    from etl_lealone_spark.operators.similarity import hard_negatives_int

    df = spark.createDataFrame(
        [(0, [1.0, 2.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    with _pytest.raises(ValueError, match="n_queries"):
        hard_negatives_int(df, n_queries=513)


def test_hard_negatives_batch_matches_brute(spark, tmp_path):
    """hard_negatives_int_batch (IvfIndex.topk_batch + label carry +
    in-kernel different-label filter, full probe) is row-identical to
    the brute hard_negatives_int — including float sims — and invariant
    to query repartitioning (different Arrow batching)."""
    import numpy as np

    from etl_lealone_spark.operators.similarity import (
        IvfIndex,
        hard_negatives_int,
        hard_negatives_int_batch,
    )

    rng = np.random.RandomState(11)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)], int(i % 3))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    brute = sorted(map(tuple, hard_negatives_int(df, k=4, n_queries=6).collect()))
    idx = IvfIndex(spark, str(tmp_path / "hnidx"))
    batch = hard_negatives_int_batch(df, idx, k=4, n_queries=6)
    assert sorted(map(tuple, batch.collect())) == brute
    batch2 = hard_negatives_int_batch(
        df.repartition(7), idx, k=4, n_queries=6
    )
    assert sorted(map(tuple, batch2.collect())) == brute
    # reduced probe: still never a same-label or self row, <= k per query
    approx = hard_negatives_int_batch(df, idx, k=4, n_queries=6, n_probe=1).collect()
    labels = {i: i % 3 for i in range(80)}
    for r in approx:
        assert labels[r["vec_id"]] != labels[r["query_id"]]
        assert r["neg_label"] == labels[r["vec_id"]]


def test_hard_negatives_query_cap_routes_to_batch(spark, tmp_path):
    """Past 512 queries: raises a typed error naming the batch path
    when no index is given, ROUTES there (no collect of the query set)
    when one is."""
    import pytest as _pytest

    from etl_lealone_spark.operators.similarity import (
        IvfIndex,
        hard_negatives_int,
    )

    rows = [(int(i), [float(i % 7) + 1.0, float(i % 5) + 1.0], int(i % 2))
            for i in range(600)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with _pytest.raises(ValueError, match="hard_negatives_int_batch"):
        hard_negatives_int(df, n_queries=513)
    idx = IvfIndex(spark, str(tmp_path / "hnroute"))
    out = hard_negatives_int(df, k=2, n_queries=513, index=idx)
    got = out.collect()
    assert len(got) == 513 * 2
    for r in got:
        assert (r["vec_id"] % 2) != (r["query_id"] % 2)


def test_topk_batch_carry_hook_validation(spark, tmp_path):
    """The carry/label hook parameter contract: label cols must come in
    pairs, cand_label_col needs a carry frame, carry needs non-key
    columns; a plain carry (no label filter) appends columns verbatim."""
    import numpy as np
    import pytest as _pytest

    from etl_lealone_spark.operators.similarity import IvfIndex, quantize

    rng = np.random.RandomState(3)
    rows = [(int(i), [float(x) for x in rng.randn(6)]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = IvfIndex(spark, str(tmp_path / "carryidx"))
    idx.build(e)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), quantize(F.col("embedding")).alias("qvec")
    )
    carry = e.select("vec_id", (F.col("vec_id") * 10).alias("tag"))
    with _pytest.raises(ValueError, match="must be set together"):
        idx.topk_batch(q, query_label_col="x")
    with _pytest.raises(ValueError, match="requires a carry frame"):
        idx.topk_batch(q, query_label_col="x", cand_label_col="y")
    with _pytest.raises(ValueError, match="non-key"):
        idx.topk_batch(q, carry=e.select("vec_id"))
    plain = sorted(map(tuple, idx.topk_batch(q, k=5, n_probe=4).collect()))
    carried = idx.topk_batch(q, k=5, n_probe=4, carry=carry).collect()
    assert sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rnk"]) for r in carried
    ) == plain
    assert all(r["tag"] == r["vec_id"] * 10 for r in carried)
