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
restart. The shared BatchCommitMarker recognizes fully-applied replays,
and — the marker contract's second half — the rewrite itself is
IDEMPOTENT for the crash window between the snapshot flip and the
marker commit: closes only touch current rows that predate the change
(a replay sees the row it opened and leaves it), and opens anti-join
away versions already present at (key, valid_from). Re-applying an
applied batch is a no-op (pinned by test).

Equivalence contract (pinned by tests/test_streaming_scd2.py): if each
key's changes arrive in ascending eff_date order (any chunking across
batches), the final history equals applying all changes at once; for
the one-change-per-key case it is row-identical to the batch
scd2_dim_update workload's output. Within one batch, the LATEST change
per key wins (max by (eff_date, attrs) — deterministic), matching the
"net effect" rule CDC compaction uses.

Precondition violations are SURFACED, not silent (r6 verdict/advice):
each batch is pre-checked against the touched buckets' history in one
aggregate job — a genuinely out-of-order change (eff_date BEFORE the
key's current valid_from, with no identical version already at that
date) raises before any mutation (it would open a second is_current
row); a same-date CONFLICT (eff_date equals the current valid_from but
the attrs differ — the replay-idempotency rule would silently drop it)
is counted in ``last_metrics`` and logged, or raises under
``strict_same_date=True``. Exact replays (same date, same attrs — of
the LATEST change or of any OLDER batch an at-least-once source
redelivers) stay free no-ops, and a batch with no effective change
skips the rewrite entirely — that is the crash-replay contract.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dml import SnapshotTable
from ._marker import BatchCommitMarker

logger = logging.getLogger(__name__)


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
        strict_same_date: bool = False,
    ):
        self.spark = spark
        self.key_col = key_col
        self.attr_cols = list(attr_cols)
        self.eff_col = eff_col
        self.strict_same_date = strict_same_date
        # per-batch precondition counters, refreshed by process_batch
        self.last_metrics: dict[str, int] = {
            "same_date_dropped": 0,
            "replayed": 0,
        }
        self._marker = BatchCommitMarker(state_root)
        self.history = SnapshotTable(
            spark, state_root, "dim_history", partition_by=["kb"]
        )
        # the bucket count is part of the PERSISTED layout: a restart
        # with a different value would hash changed keys into different
        # buckets than their stored rows, leaving old current rows
        # unclosed while opening duplicates — pin it beside the table
        # and fail loudly on drift (r6 review finding)
        meta = os.path.join(state_root, "dim_history", "_n_buckets")
        if os.path.exists(meta):
            with open(meta) as f:
                stored = int(f.read().strip())
            if stored != n_buckets:
                raise ValueError(
                    f"dim_history was built with n_buckets={stored}; "
                    f"got {n_buckets} — bucket layout cannot change"
                )
        self.n_buckets = n_buckets
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
        if not os.path.exists(meta):
            os.makedirs(os.path.dirname(meta), exist_ok=True)
            with open(meta, "w") as f:
                f.write(str(n_buckets))

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
            # Empty batch (batch 0 of a stream commonly is). Checked
            # BEFORE the bootstrap branch: create() on an empty
            # partitioned DataFrame writes a _SUCCESS-only snapshot that
            # exists() but cannot round-trip its schema, wedging every
            # later read — so an empty batch never creates the table.
            if batch_id is not None:
                self._marker.commit(batch_id, query_key)
            return self.history._version
        if not self.history.exists():
            # pure-CDC bootstrap (no base snapshot): the first batch's
            # net changes become the initial history — every key opens
            # as a current version (an empty partitioned parquet cannot
            # round-trip its schema, so there is no "empty snapshot")
            version = self.history.create(
                net.select(
                    F.col(k),
                    *[F.col(c) for c in self.attr_cols],
                    F.col(eff).alias("valid_from"),
                    F.lit(None).cast("date").alias("valid_to"),
                    F.lit(True).alias("is_current"),
                    F.col("kb"),
                )
            )
            if batch_id is not None:
                self._marker.commit(batch_id, query_key)
            return version
        effective = self._check_preconditions(net, buckets)
        if effective == 0:
            # nothing can take effect (all exact replays / dropped
            # same-date conflicts): skip the rewrite — a new snapshot
            # would be bit-identical, pure write amplification plus one
            # more small file per touched bucket
            if batch_id is not None:
                self._marker.commit(batch_id, query_key)
            return self.history._version
        probe = net.select(F.col(k).alias("__k"), F.col(eff).alias("__eff"))

        def transform(subset: DataFrame) -> DataFrame:
            # IDEMPOTENT by construction (the BatchCommitMarker contract:
            # a crash between the snapshot flip and the marker commit
            # re-delivers the batch, so re-applying to already-applied
            # state must be a no-op):
            # - close only current rows that PREDATE the change
            #   (valid_from < eff) — a replayed batch sees the row it
            #   opened (valid_from == eff) and leaves it current;
            # - open only versions not already present at (key,
            #   valid_from) — the replay's insert anti-joins away.
            # Side effect: a change whose eff_date equals an existing
            # version's valid_from is treated as already applied —
            # _check_preconditions counts/raises when that drops a
            # GENUINE conflicting change (attrs differ), so the rule
            # only ever eats exact replays silently.
            j = subset.join(
                F.broadcast(probe), subset[k] == probe["__k"], "left"
            )
            hit = (
                F.col("__k").isNotNull()
                & F.col("is_current")
                & (F.col("valid_from") < F.col("__eff"))
            )
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
            ).join(
                subset.select(F.col(k), F.col("valid_from")),
                [k, "valid_from"],
                "left_anti",
            )
            return closed_or_kept.unionByName(opened)

        version = self.history._pruned_rewrite(
            transform, F.col("kb").isin(buckets)
        )
        if batch_id is not None:
            self._marker.commit(batch_id, query_key)
        return version

    def _check_preconditions(self, net: DataFrame, buckets: list) -> int:
        """Pre-mutation batch audit against the touched buckets' history
        — ONE aggregate job, cost O(touched buckets) like the rewrite
        itself. Raises on genuinely out-of-order changes (eff_date
        precedes the key's current valid_from AND no identical version
        exists at that date — applying would open a duplicate
        is_current row); a redelivered batch whose change already sits
        in the history IDENTICALLY (any version, not just the current
        one — an at-least-once source can redeliver an old batch) stays
        the free no-op the crash-replay contract promises, counted as
        replayed. Same-date conflicts the replay-idempotency rule is
        about to drop are counted (raise under strict_same_date).
        Returns the number of changes that will actually take effect,
        so the caller can skip the rewrite when none will."""
        k, eff = self.key_col, self.eff_col

        # Attr equality via ONE hash column instead of shipping every
        # attr: the broadcast is 3 narrow columns regardless of attr
        # width (r7 advisor finding — broadcasting the whole net batch
        # undermined the O(touched-buckets) design for wide dims).
        # Injective null-aware encoding: per-column fixed-width token
        # ('N'+zeros for NULL, 'V'+md5(cast-to-string) otherwise), so
        # neither separator injection nor null/value ambiguity can
        # collide; matches eqNullSafe semantics (NULL equals NULL).
        def attr_hash():
            toks = [
                F.when(F.col(c).isNull(), F.lit("N" + "0" * 32)).otherwise(
                    F.concat(F.lit("V"), F.md5(F.col(c).cast("string")))
                )
                for c in self.attr_cols
            ]
            return F.md5(F.concat(*toks))

        hist = (
            self.history.read()
            .filter(F.col("kb").isin(buckets))
            .select(
                F.col(k),
                F.col("valid_from"),
                F.col("is_current"),
                attr_hash().alias("__h_ah"),
            )
        )
        net_slim = net.select(F.col(k), F.col(eff), attr_hash().alias("__ah"))
        same_attrs = F.col("__ah") == F.col("__h_ah")
        same_day = F.col("valid_from") == F.col(eff)
        # net is one change per key, so per-key == per-change flags; a
        # change matches several history versions — reduce with max()
        per_key = (
            hist.join(F.broadcast(net_slim), k, "inner")
            .groupBy(k)
            .agg(
                F.max(
                    F.when(
                        F.col("is_current") & (F.col("valid_from") > F.col(eff)), 1
                    ).otherwise(0)
                ).alias("cur_after"),
                F.max(
                    F.when(
                        F.col("is_current") & same_day & ~same_attrs, 1
                    ).otherwise(0)
                ).alias("cur_conflict"),
                F.max(F.when(same_day & same_attrs, 1).otherwise(0)).alias(
                    "identical"
                ),
            )
        )
        row = per_key.agg(
            F.count(
                F.when((F.col("cur_after") == 1) & (F.col("identical") == 0), 1)
            ).alias("ooo"),
            F.count(F.when(F.col("cur_conflict") == 1, 1)).alias("dropped"),
            F.count(F.when(F.col("identical") == 1, 1)).alias("replayed"),
        ).first()
        self.last_metrics = {
            "same_date_dropped": int(row["dropped"]),
            "replayed": int(row["replayed"]),
        }
        if row["ooo"]:
            raise ValueError(
                f"{row['ooo']} out-of-order change(s): eff_date precedes the "
                f"key's current valid_from and no identical version exists at "
                f"that date — applying would open a duplicate is_current row. "
                f"Changes must arrive in ascending eff_date order per key; "
                f"nothing was written."
            )
        if row["dropped"]:
            if self.strict_same_date:
                raise ValueError(
                    f"{row['dropped']} same-date conflict(s): eff_date equals "
                    f"an existing version's valid_from with DIFFERENT attrs — "
                    f"the replay-idempotency rule would silently drop them "
                    f"(strict_same_date=True); nothing was written."
                )
            logger.warning(
                "scd2 %s: dropping %d same-date conflicting change(s) "
                "(eff_date == current valid_from, attrs differ) — see "
                "last_metrics['same_date_dropped']",
                self.key_col,
                row["dropped"],
            )
        # effective = every change except the no-ops: exact replays and
        # dropped same-date conflicts (new keys never match history and
        # always take effect; net is eagerly checkpointed, count cheap)
        return net.count() - int(row["replayed"]) - int(row["dropped"])

    def compact(self, max_files: int = 8) -> int:
        """Small-file maintenance: each CDC batch accretes one file per
        touched bucket (SnapshotTable._pruned_rewrite appends beside the
        linked survivors), so a year of daily batches means ~365 files
        per hot bucket. Delegates to SnapshotTable.compact — rewrites
        only buckets over ``max_files`` to a single file each, links the
        rest; row-identical (pinned by test)."""
        return self.history.compact(max_files)

    def current(self) -> DataFrame:
        """The dimension's current rows (the SCD1 view of the history)."""
        return self.history.read().filter(F.col("is_current")).drop("kb")

    def read_history(self) -> DataFrame:
        return self.history.read().drop("kb")
