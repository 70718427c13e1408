"""Shared committed-batch-id marker for foreachBatch exactly-once.

foreachBatch re-delivers the in-flight batch after a restart. The
marker records the last fully-committed batch id with an atomic file
flip; a replayed id is recognized and skipped. State appends BETWEEN
the last marker and a crash must themselves be idempotent (anti-join
on the state's key before inserting) so that a replay CONVERGES no
matter where the previous attempt died — the marker alone only
prevents double-commits of fully-applied batches.
"""

from __future__ import annotations

import os


class BatchCommitMarker:
    def __init__(self, state_root: str):
        self.state_root = state_root
        self._path = os.path.join(state_root, "_last_batch")

    def last_committed(self) -> int:
        try:
            with open(self._path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def commit(self, batch_id: int) -> None:
        os.makedirs(self.state_root, exist_ok=True)
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, self._path)  # atomic flip
