"""Streaming ANN index maintenance: incremental IVF appends.

New vectors arriving on a stream are assigned to the index's trained
centroids and appended to the partition-pruned inverted lists
(``IvfIndex.append``) — the FAISS train-once/add-many contract as a
``foreachBatch`` sink. A stream-maintained index is bit-identical to one
batch-built from the same trained centroids over the same vectors
(pinned by tests/test_incremental_ivf.py), so probes never see a
stream/batch semantic difference.

Exactly-once: same two-layer story as the incremental dedup/corpus
builders (streaming/_marker.py) —
- the commit marker (keyed by query identity + batch id) skips batches
  that were FULLY applied before a restart;
- the append itself is idempotent by vec_id (anti-join against the
  inverted lists), so a replay of a PARTIALLY applied batch converges
  instead of double-inserting.

Scale shape: each micro-batch costs O(|batch| x sqrt(n_train)) exact
int64 dot products (one Arrow matmul per partition) plus an append into
only the touched cid partition directories; existing lists are never
rewritten. Re-train (build force=True) when centroid drift warrants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.similarity import IvfIndex
from ._marker import BatchCommitMarker


class StreamingIvfMaintainer:
    def __init__(self, index: IvfIndex):
        self.index = index
        self._marker = BatchCommitMarker(index.root)

    def process_batch(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        query_key: str = "",
    ) -> int:
        """Append one micro-batch of vectors; returns rows added (0 for
        a recognized replay)."""
        if batch_id is not None and batch_id <= self._marker.last_committed(
            query_key
        ):
            return 0
        n = self.index.append(batch)
        if batch_id is not None:
            self._marker.commit(batch_id, query_key)
        return n

    def attach(self, stream: DataFrame, checkpoint_dir: str):
        """Attach to a streaming DataFrame via foreachBatch; returns the
        StreamingQuery. The checkpoint dir is the marker's query
        identity (batch ids are scoped to a checkpoint)."""
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(
                    df, bid, query_key=checkpoint_dir
                )
                and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
