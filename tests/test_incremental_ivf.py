"""Streaming IVF maintenance: a stream-maintained index must be
bit-identical to a batch-maintained one (same trained centroids, same
vectors), appends must be exactly-once under replay, and probes must see
appended vectors.

Reference note: the reference engine has no ANN surface; this pins the
extension's FAISS-style train-once/add-many contract (IvfIndex.append +
streaming.ann_maintenance.StreamingIvfMaintainer).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lealone_spark.operators.similarity import IvfIndex, quantize
from etl_lealone_spark.streaming.ann_maintenance import StreamingIvfMaintainer


@pytest.fixture()
def emb(spark, sf_dir):
    from etl_lealone_spark.tables import load_tables

    return load_tables(spark, sf_dir)["embeddings"]


def _assign_map(spark, root):
    import os

    return {
        r["vec_id"]: r["cid"]
        for r in spark.read.parquet(os.path.join(root, "assign"))
        .select("vec_id", "cid")
        .collect()
    }


def test_stream_built_index_equals_batch_built(spark, emb, tmp_path):
    base = emb.filter(F.col("vec_id") < 300)
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    b2 = emb.filter(F.col("vec_id") >= 400)

    # stream path: two micro-batches through the maintainer
    idx_s = IvfIndex(spark, str(tmp_path / "ivf_stream"))
    idx_s.build(base)
    m = StreamingIvfMaintainer(idx_s)
    n1 = m.process_batch(b1, batch_id=0, query_key="ck")
    n2 = m.process_batch(b2, batch_id=1, query_key="ck")
    assert n1 > 0 and n2 > 0

    # batch path: same trained centroids, one bulk add
    idx_b = IvfIndex(spark, str(tmp_path / "ivf_batch"))
    idx_b.build(base)
    idx_b.append(b1.unionByName(b2))

    # identical inverted lists...
    am_s = _assign_map(spark, idx_s.root)
    am_b = _assign_map(spark, idx_b.root)
    assert am_s == am_b
    assert len(am_s) == emb.count()

    # ...and identical probe results
    q = (
        emb.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("query_id"),
            quantize(F.col("embedding")).alias("qvec"),
        )
    )
    rs = [tuple(r) for r in idx_s.topk(q, k=5, n_probe=4).orderBy("query_id", "rnk").collect()]
    rb = [tuple(r) for r in idx_b.topk(q, k=5, n_probe=4).orderBy("query_id", "rnk").collect()]
    assert rs == rb
    # appended vectors are actually probe-visible: at least one result
    # beyond the base build's id range
    assert any(r[1] >= 300 for r in rs)


def test_append_replay_is_exactly_once(spark, emb, tmp_path):
    base = emb.filter(F.col("vec_id") < 300)
    b1 = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))

    idx = IvfIndex(spark, str(tmp_path / "ivf_replay"))
    idx.build(base)
    m = StreamingIvfMaintainer(idx)
    n1 = m.process_batch(b1, batch_id=0, query_key="ckA")
    before = _assign_map(spark, idx.root)

    # full-batch replay (same id, same checkpoint) → marker skips
    assert m.process_batch(b1, batch_id=0, query_key="ckA") == 0
    # fresh checkpoint (ids restart at 0) → not a replay, but the
    # vec_id anti-join makes the re-append converge to zero new rows
    assert m.process_batch(b1, batch_id=0, query_key="ckB") == 0
    assert _assign_map(spark, idx.root) == before
    assert n1 == 50


def test_append_requires_built_index(spark, emb, tmp_path):
    idx = IvfIndex(spark, str(tmp_path / "ivf_none"))
    with pytest.raises(ValueError, match="build"):
        idx.append(emb.limit(5))


def test_force_rebuild_replaces_existing_index(spark, emb, tmp_path):
    # force=True onto an EXISTING index must publish the new build —
    # os.rename onto a non-empty dir raises, and the old code swallowed
    # that as a "lost race" and silently kept the stale index
    root = str(tmp_path / "ivf_force")
    idx = IvfIndex(spark, root)
    idx.build(emb.filter(F.col("vec_id") < 200))
    n_before = len(_assign_map(spark, root))
    assert n_before == 200
    idx.build(emb.filter(F.col("vec_id") < 500), force=True)
    assert len(_assign_map(spark, root)) == 500


def test_append_skips_index_scan_for_fresh_ids(spark, emb, tmp_path):
    # monotone ids above the high-water mark must not read assign/ at
    # all; replayed ids below it still anti-join away
    import json
    import os

    root = str(tmp_path / "ivf_hwm")
    idx = IvfIndex(spark, root)
    idx.build(emb.filter(F.col("vec_id") < 300))
    meta = json.load(open(os.path.join(root, "_meta.json")))
    assert meta["max_id"] == 299
    batch = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350))
    assert idx.append(batch) == 50
    meta = json.load(open(os.path.join(root, "_meta.json")))
    assert meta["max_id"] == 349 and meta["n"] == 350
    # replay the same batch (all ids <= max_id now): zero added
    assert idx.append(batch) == 0
    # mixed batch: one replayed id + fresh ids, within-batch duplicate
    mixed = emb.filter(
        (F.col("vec_id") == 320) | ((F.col("vec_id") >= 350) & (F.col("vec_id") < 360))
    )
    assert idx.append(mixed.union(mixed)) == 10
    assert len(_assign_map(spark, root)) == 360
