"""Mutating DML re-expressed as snapshot rewrites (SURVEY.md §2.9).

The reference mutates BTree rows in place under MVCC
(Update.java:125-200, Delete.java:84-130, Merge.java:146-230). On
immutable columnar storage the equivalent is: read snapshot → transform
→ write new snapshot. The *transformations* are pure DataFrame ops
(this module), so they are oracle-checkable and scale-neutral; the
snapshot write path is :class:`SnapshotTable`.

Scale design:
- UPDATE/DELETE are projections/filters — no shuffle at all; the rewrite
  is a parquet scan + write, partition-parallel end to end.
- Updates with LIMIT require a global row ranking; we pin deterministic
  PK order (the reference's scan-order semantics are nondeterministic —
  documented divergence, SURVEY.md §7).
- MERGE shuffles both sides by key once (or broadcasts a small source).
  With partition-aligned keys a real deployment rewrites only affected
  partitions; full-snapshot rewrite is the fallback.
"""

from __future__ import annotations

import os
import shutil
from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_update(
    df: DataFrame,
    condition: Column,
    assignments: Mapping[str, Column],
) -> DataFrame:
    """UPDATE ... SET ... WHERE cond as a projection.

    Rows matching ``condition`` get the assigned expressions; all other
    rows pass through unchanged. NULL conditions do not match (SQL
    three-valued logic), same as the reference (Update.java:139).
    """
    cond = condition.isNotNull() & condition
    return df.select(
        *[
            F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in df.columns
        ]
    )


def apply_update_limit(
    df: DataFrame,
    condition: Column,
    assignments: Mapping[str, Column],
    limit: int,
    order_by: Sequence[str],
) -> DataFrame:
    """UPDATE ... WHERE cond LIMIT n (Update.java:44,139-150).

    The reference updates the first n rows in scan order; scan order is
    not reproducible on a distributed engine, so we pin ascending
    ``order_by`` — which must be a UNIQUE key (the PK) — a documented
    semantic refinement (SURVEY.md §7 "what's hard").

    Scale: only MATCHING rows are globally ranked (filter → top-k via
    TakeOrderedAndProject, no full-table window), then a broadcast-able
    semi-join marks the rows to rewrite.
    """
    cond = condition.isNotNull() & condition
    keys = [F.col(c) for c in order_by]
    picked = df.filter(cond).select(*order_by).orderBy(*keys).limit(limit)
    marked = df.join(
        F.broadcast(picked.withColumn("__upd_hit", F.lit(True))),
        on=list(order_by),
        how="left",
    )
    eff = F.coalesce(F.col("__upd_hit"), F.lit(False))
    return marked.select(
        *[
            F.when(eff, assignments[c]).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in df.columns
        ]
    )


def apply_delete(df: DataFrame, condition: Column) -> DataFrame:
    """DELETE WHERE cond: keep rows where cond is FALSE or NULL
    (Delete.java:84-130)."""
    return df.filter(~F.coalesce(condition, F.lit(False)))


def merge_by_key(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    broadcast_source: Optional[bool] = None,
) -> DataFrame:
    """MERGE INTO target KEY(k...) — upsert (Merge.java:35,146-230).

    Semantics: source row with matching key replaces the target row's
    non-key columns; unmatched source rows are inserted; unmatched target
    rows survive. Implemented as a single full-outer join on the key +
    coalesce projection — one shuffle, or zero when the source broadcasts.

    ``source`` must have the same schema as ``target`` (the reference
    requires the KEY columns plus assignable columns; we take full rows).
    """
    if broadcast_source is None:
        broadcast_source = False
    src = F.broadcast(source) if broadcast_source else source
    s = src.select([F.col(c).alias(f"__s_{c}") for c in source.columns])
    join_cond = None
    for k in keys:
        c = target[k] == s[f"__s_{k}"]
        join_cond = c if join_cond is None else (join_cond & c)
    joined = target.join(s, join_cond, "full_outer")
    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.coalesce(target[c], s[f"__s_{c}"]).alias(c))
        else:
            # source wins when the key matched or the row is source-only
            out_cols.append(F.coalesce(s[f"__s_{c}"], target[c]).alias(c))
    return joined.select(*out_cols)


class SnapshotTable:
    """A mutable table on immutable storage: versioned parquet snapshots.

    Each mutation writes a NEW snapshot directory and flips a pointer —
    the Spark-native replacement for the reference's in-place MVCC BTree
    (MVCCTransactionEngine.java). Readers of the old snapshot are never
    disturbed (snapshot isolation); there is no redo log because the
    snapshot write *is* the commit.
    """

    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.root = root
        self.name = name
        self._version = self._latest_version()

    # -- snapshot bookkeeping -----------------------------------------
    def _dir(self, version: int) -> str:
        return os.path.join(self.root, self.name, f"v{version:06d}")

    def _latest_version(self) -> int:
        base = os.path.join(self.root, self.name)
        if not os.path.isdir(base):
            return -1
        versions = [
            int(d[1:]) for d in os.listdir(base) if d.startswith("v") and d[1:].isdigit()
        ]
        return max(versions, default=-1)

    @property
    def version(self) -> int:
        return self._version

    def exists(self) -> bool:
        return self._version >= 0

    # -- read / write ---------------------------------------------------
    def read(self) -> DataFrame:
        if not self.exists():
            raise FileNotFoundError(f"table {self.name} has no snapshot")
        return self.spark.read.parquet(self._dir(self._version))

    def write(self, df: DataFrame, mode: str = "overwrite") -> int:
        new_version = self._version + 1
        df.write.mode("overwrite").parquet(self._dir(new_version))
        self._version = new_version
        return new_version

    def create(self, df: DataFrame) -> int:
        return self.write(df)

    def insert(self, rows: DataFrame) -> int:
        """INSERT: append-only — new files only, no rewrite of existing data."""
        if not self.exists():
            return self.write(rows)
        # Append into the CURRENT snapshot dir: no read, no shuffle.
        rows.write.mode("append").parquet(self._dir(self._version))
        return self._version

    def update(self, condition: Column, assignments: Mapping[str, Column]) -> int:
        return self.write(apply_update(self.read(), condition, assignments))

    def delete(self, condition: Column) -> int:
        return self.write(apply_delete(self.read(), condition))

    def merge(self, source: DataFrame, keys: Sequence[str]) -> int:
        return self.write(merge_by_key(self.read(), source, keys))

    def truncate(self) -> int:
        """TRUNCATE TABLE (TruncateTable.java): empty snapshot, schema kept."""
        empty = self.read().limit(0)
        return self.write(empty)

    def drop(self) -> None:
        shutil.rmtree(os.path.join(self.root, self.name), ignore_errors=True)
        self._version = -1

    def vacuum(self, keep_last: int = 1) -> None:
        """Remove snapshots older than the newest ``keep_last``."""
        for v in range(0, self._version - keep_last + 1):
            shutil.rmtree(self._dir(v), ignore_errors=True)
