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


def test_marker_key_with_newline_roundtrips(tmp_path):
    """Keys are caller-supplied paths and may contain newlines; the
    marker stores a digest so the line-oriented format cannot be
    corrupted (r4 advisor: a raw embedded key broke the format and the
    silent mismatch re-processed every batch on every restart)."""
    m = BatchCommitMarker(str(tmp_path / "s4"))
    weird = "/ckpt/line1\nline2"
    m.commit(9, query_key=weird)
    assert m.last_committed(weird) == 9
    assert m.last_committed("/ckpt/line1") == -1


def test_marker_reads_legacy_raw_key(tmp_path):
    """Markers written before the digest change stored the raw key; they
    must still be honored after an upgrade (no full reprocessing)."""
    import os

    root = str(tmp_path / "s5")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "_last_batch"), "w") as f:
        f.write("/ckpt/old\n4")
    assert BatchCommitMarker(root).last_committed("/ckpt/old") == 4
    assert BatchCommitMarker(root).last_committed("/ckpt/new") == -1


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
