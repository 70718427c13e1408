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
