"""Shared committed-batch-id marker for foreachBatch exactly-once.

foreachBatch re-delivers the in-flight batch after a restart. The
marker records the last fully-committed batch id with an atomic file
flip; a replayed id is recognized and skipped. State appends BETWEEN
the last marker and a crash must themselves be idempotent (anti-join
on the state's key before inserting) so that a replay CONVERGES no
matter where the previous attempt died — the marker alone only
prevents double-commits of fully-applied batches.

The marker is keyed by BOTH the batch id and a query identity (the
checkpoint location), mirroring the Delta Lake txn-version pattern
(appId + version). Batch ids are scoped to a checkpoint: a stream
restarted with a FRESH checkpoint dir over the same state_root restarts
ids at 0, and a batch-id-only marker would classify every new batch as
a replay (batch_id <= last_committed) and silently drop it — data loss,
not duplication. With the identity stored alongside, a different
query/checkpoint never matches and processing proceeds.
"""

from __future__ import annotations

import hashlib
import os


def _key_digest(query_key: str) -> str:
    """Fixed-width identity token for the marker file. Keys are
    caller-supplied checkpoint paths and may contain newlines; embedding
    them verbatim would corrupt the line-oriented marker format, and the
    resulting silent key mismatch would re-process every batch on every
    restart. Hashing makes the stored token newline-free by
    construction."""
    return hashlib.md5(query_key.encode("utf-8")).hexdigest()


class BatchCommitMarker:
    def __init__(self, state_root: str):
        self.state_root = state_root
        self._path = os.path.join(state_root, "_last_batch")

    def last_committed(self, query_key: str = "") -> int:
        """Last committed batch id for this query identity, -1 if none.

        ``query_key`` identifies the stream (use the checkpoint
        location). A marker written by a DIFFERENT query identity
        reports -1: its batch-id sequence is unrelated to ours.
        """
        try:
            with open(self._path) as f:
                lines = f.read().splitlines()
            if len(lines) == 1:  # legacy single-line marker: no identity
                stored_key, stored_id = _key_digest(""), lines[0]
            else:
                stored_key, stored_id = lines[0], lines[1]
            # Accept the raw key too, for markers written pre-digest.
            if stored_key not in (_key_digest(query_key), query_key):
                return -1
            return int(stored_id)
        except (OSError, ValueError, IndexError):
            return -1

    def commit(self, batch_id: int, query_key: str = "") -> None:
        os.makedirs(self.state_root, exist_ok=True)
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{_key_digest(query_key)}\n{batch_id}")
        os.replace(tmp, self._path)  # atomic flip
