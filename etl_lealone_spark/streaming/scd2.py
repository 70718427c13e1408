"""Streaming SCD Type-2 dimension maintenance — the micro-batch twin of
the batch history build (workloads/dml_q.py scd2_dim_update).

A change batch carries (key, eff_date, tracked attrs). Applying it:
close the key's CURRENT row at eff_date (valid_to = eff_date,
is_current = false) and open a new current version. This is the
standard nightly/continuous dimension-maintenance pattern a CDC feed
drives (reference analogue: MERGE-driven upsert, dml/Merge.java — but
versioned instead of in-place).

Scale design — the history table is partitioned by a key bucket
(``kb = pmod(xxhash64(key), n_buckets)``), so each batch rewrites ONLY
the buckets containing changed keys via SnapshotTable._pruned_rewrite:
untouched partitions are linked into the new snapshot (metadata-only),
and the rewrite cost is O(touched buckets), not O(dimension). At
100 TB, n_buckets scales with the dimension so a typical CDC batch
touches a small fraction of partitions.

Exactly-once: foreachBatch re-delivers the in-flight batch after a
restart; the shared BatchCommitMarker recognizes fully-applied replays
(same contract as IncrementalCorpusBuilder — marker flips only after
the snapshot pointer).

Equivalence contract (pinned by tests/test_streaming_scd2.py): if each
key's changes arrive in ascending eff_date order (any chunking across
batches), the final history equals applying all changes at once; for
the one-change-per-key case it is row-identical to the batch
scd2_dim_update workload's output. Within one batch, the LATEST change
per key wins (max by (eff_date, attrs) — deterministic), matching the
"net effect" rule CDC compaction uses.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dml import SnapshotTable
from ._marker import BatchCommitMarker


class Scd2Applier:
    """Stateful micro-batch SCD2 applier over a bucketed history table."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        key_col: str,
        attr_cols: Sequence[str],
        eff_col: str = "eff_date",
        base: Optional[DataFrame] = None,
        base_from: str = "1995-01-01",
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.key_col = key_col
        self.attr_cols = list(attr_cols)
        self.eff_col = eff_col
        self.n_buckets = n_buckets
        self._marker = BatchCommitMarker(state_root)
        self.history = SnapshotTable(
            spark, state_root, "dim_history", partition_by=["kb"]
        )
        if base is not None and not self.history.exists():
            init = base.select(
                F.col(key_col),
                *[F.col(c) for c in self.attr_cols],
                F.to_date(F.lit(base_from)).alias("valid_from"),
                F.lit(None).cast("date").alias("valid_to"),
                F.lit(True).alias("is_current"),
                self._kb(F.col(key_col)).alias("kb"),
            )
            self.history.create(init)

    def _kb(self, key):
        return F.pmod(F.xxhash64(key.cast("string")), self.n_buckets)

    def process_batch(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        query_key: str = "",
    ) -> int:
        """Apply one change batch; returns the new snapshot version.

        Replays (batch_id at or below the committed marker) are no-ops
        returning the current version untouched."""
        if batch_id is not None and batch_id <= self._marker.last_committed(
            query_key
        ):
            return self.history._version
        k, eff = self.key_col, self.eff_col
        # net effect per key within the batch: latest eff_date wins,
        # deterministic tie-break through the attr tuple
        net = (
            batch.groupBy(k)
            .agg(
                F.max(F.struct(F.col(eff), *[F.col(c) for c in self.attr_cols]))
                .alias("__s")
            )
            .select(
                F.col(k),
                F.col(f"__s.{eff}").alias(eff),
                *[F.col(f"__s.{c}").alias(c) for c in self.attr_cols],
            )
            .withColumn("kb", self._kb(F.col(k)))
            .localCheckpoint(eager=True)  # consumed by filter + transform
        )
        buckets = [r["kb"] for r in net.select("kb").distinct().collect()]
        if not buckets:
            if batch_id is not None:
                self._marker.commit(batch_id, query_key)
            return self.history._version
        probe = net.select(
            F.col(k).alias("__k"),
            F.col(eff).alias("__eff"),
            *[F.col(c).alias(f"__new_{c}") for c in self.attr_cols],
        )

        def transform(subset: DataFrame) -> DataFrame:
            j = subset.join(
                F.broadcast(probe), subset[k] == probe["__k"], "left"
            )
            hit = F.col("__k").isNotNull() & F.col("is_current")
            closed_or_kept = j.select(
                F.col(k),
                *[F.col(c) for c in self.attr_cols],
                F.col("valid_from"),
                F.when(hit, F.col("__eff")).otherwise(F.col("valid_to")).alias(
                    "valid_to"
                ),
                F.when(hit, F.lit(False)).otherwise(F.col("is_current")).alias(
                    "is_current"
                ),
                F.col("kb"),
            )
            opened = net.select(
                F.col(k),
                *[F.col(c) for c in self.attr_cols],
                F.col(eff).alias("valid_from"),
                F.lit(None).cast("date").alias("valid_to"),
                F.lit(True).alias("is_current"),
                F.col("kb"),
            )
            return closed_or_kept.unionByName(opened)

        version = self.history._pruned_rewrite(
            transform, F.col("kb").isin(buckets)
        )
        if batch_id is not None:
            self._marker.commit(batch_id, query_key)
        return version

    def current(self) -> DataFrame:
        """The dimension's current rows (the SCD1 view of the history)."""
        return self.history.read().filter(F.col("is_current")).drop("kb")

    def read_history(self) -> DataFrame:
        return self.history.read().drop("kb")
