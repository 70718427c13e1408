"""BatchCommitMarker: the exactly-once primitive both incremental
builders share."""

from __future__ import annotations

from etl_lealone_spark.streaming._marker import BatchCommitMarker


def test_marker_lifecycle(tmp_path):
    m = BatchCommitMarker(str(tmp_path / "s"))
    assert m.last_committed() == -1          # fresh state
    m.commit(0)
    assert m.last_committed() == 0
    m.commit(5)
    assert m.last_committed() == 5
    # a second marker over the same root sees the committed id (restart)
    assert BatchCommitMarker(str(tmp_path / "s")).last_committed() == 5


def test_marker_query_identity(tmp_path):
    """Batch ids are scoped to a checkpoint: a marker committed under one
    query identity must report 'nothing committed' to a different one —
    otherwise a stream restarted with a fresh checkpoint dir (ids restart
    at 0) silently drops every batch as a 'replay'."""
    m = BatchCommitMarker(str(tmp_path / "s3"))
    m.commit(7, query_key="/ckpt/run1")
    assert m.last_committed("/ckpt/run1") == 7
    # fresh checkpoint → different identity → not a replay
    assert m.last_committed("/ckpt/run2") == -1
    assert m.last_committed() == -1
    # the new run takes over the marker under its own identity
    m.commit(0, query_key="/ckpt/run2")
    assert m.last_committed("/ckpt/run2") == 0
    assert m.last_committed("/ckpt/run1") == -1


def test_marker_tolerates_corruption(tmp_path):
    import os

    root = str(tmp_path / "s2")
    m = BatchCommitMarker(root)
    m.commit(3)
    with open(os.path.join(root, "_last_batch"), "w") as f:
        f.write("not-a-number")
    # corrupted marker degrades to 'nothing committed' (replays are
    # idempotent anyway), never to a crash
    assert m.last_committed() == -1
