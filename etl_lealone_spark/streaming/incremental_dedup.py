"""Incremental near-duplicate dedup over a document stream.

The batch MinHash-LSH operator (operators/dedup.py) deduplicates a static
corpus; this is its incremental twin for continuous ingestion: each
micro-batch is checked against the accumulated LSH band state of every
previously ACCEPTED document, near-dups are dropped, survivors append
both their rows and their band signatures to state.

Plan per micro-batch (foreachBatch):
1. signature+bands for the batch (explode-agg, partition-parallel),
2. band-join against the state table (shuffle on 8-byte band keys; the
   state side is bucketable at scale),
3. exact-Jaccard verification of band collisions (batch side only
   recomputes shingles for collision candidates),
4. intra-batch dedup (smaller-id survives), then append survivors.

State is two snapshot tables (accepted docs + their bands) — at cluster
scale these live on the shared filesystem and the band table should be
written bucketed by band_hash so step 2 is shuffle-free on the state
side. Exactly-once: foreachBatch + the committed-batch-id marker — a
checkpoint-replayed batch is recognized and its state append skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_signatures,
    word_shingles,
)
from ..operators.dml import SnapshotTable
from ..operators.xhash import P61, hconsts, mix60
from ._marker import BatchCommitMarker


def _bands_of(sig: DataFrame, num_hashes: int = 32, bands: int = 8) -> DataFrame:
    # same cross-engine band combine as the batch pipeline (xhash mix60):
    # persisted band state stays valid across engine versions and reruns —
    # an incremental dedup's state table outlives any single job
    rows_per_band = num_hashes // bands

    def _band_hash(b: int):
        acc = F.lit(0).cast("long")
        for r in range(rows_per_band):
            lane = b * rows_per_band + r
            acc = (
                acc + mix60(F.col(f"mh{lane}"), *hconsts("band-mix", lane))
            ) % P61
        return acc

    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_hash(b).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.band_hash")


class IncrementalDeduper:
    """Stateful near-dup filter for document micro-batches."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.7,
        num_hashes: int = 32,
        bands: int = 8,
    ):
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.state_root = state_root
        self._marker = BatchCommitMarker(state_root)
        self.docs = SnapshotTable(spark, state_root, "accepted_docs")
        self.band_state = SnapshotTable(spark, state_root, "accepted_bands")

    # -- core: process one micro-batch ----------------------------------
    def process_batch(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        query_key: str = "",
    ) -> DataFrame:
        """Dedup a batch against state + itself; returns accepted rows
        (and appends them to state). With a ``batch_id`` (the streaming
        carrier supplies one) commits are exactly-once: a replayed id is
        recognized and the state append skipped."""
        if batch_id is not None and batch_id <= self._marker.last_committed(
            query_key
        ):
            return self.docs.read().limit(0)
        batch = batch.localCheckpoint(eager=True)  # pin: used many times
        sig = minhash_signatures(
            batch, self.text_col, self.id_col, self.num_hashes
        )
        bands = _bands_of(sig, self.num_hashes, self.bands).localCheckpoint(
            eager=True
        )

        # candidates vs historical state
        drop_vs_state = None
        if self.band_state.exists() and not self.band_state.read().isEmpty():
            state = self.band_state.read()
            coll = (
                bands.alias("n")
                .join(
                    state.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.band_hash") == F.col("o.band_hash")),
                )
                .select(
                    F.col("n.id").alias("new_id"), F.col("o.id").alias("old_id")
                )
                .distinct()
            )
            verified = self._verify(
                coll, batch, self.docs.read(), "new_id", "old_id"
            )
            drop_vs_state = verified.select(F.col("new_id").alias("drop_id")).distinct()

        # intra-batch near-dups: keep the smaller id
        l, r = bands.alias("l"), bands.alias("r")
        intra = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.band_hash") == F.col("r.band_hash"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(F.col("l.id").alias("keep"), F.col("r.id").alias("cand"))
            .distinct()
        )
        intra_verified = self._verify(intra, batch, batch, "keep", "cand")
        drop_intra = intra_verified.select(F.col("cand").alias("drop_id")).distinct()

        drops = drop_intra if drop_vs_state is None else drop_intra.union(
            drop_vs_state
        ).distinct()
        accepted = batch.join(
            drops, batch[self.id_col] == drops.drop_id, "left_anti"
        ).localCheckpoint(eager=True)

        # append survivors + their bands to state
        acc_bands = bands.join(
            accepted.select(F.col(self.id_col).alias("aid")),
            bands.id == F.col("aid"),
            "left_semi",
        )
        # crash-convergent idempotent appends (see _marker docstring):
        # a replay of a partially-committed batch re-derives the same
        # accepted set, and the anti-joins skip whatever already landed
        if self.docs.exists():
            self.docs.insert(
                accepted.join(
                    self.docs.read().select(self.id_col), self.id_col, "left_anti"
                )
            )
            self.band_state.insert(
                acc_bands.join(
                    self.band_state.read().select(F.col("id")), "id", "left_anti"
                )
            )
        else:
            self.docs.create(accepted)
            self.band_state.create(acc_bands)
        if batch_id is not None:
            self._marker.commit(batch_id, query_key)
        return accepted

    def _verify(
        self,
        pairs: DataFrame,
        side_a: DataFrame,
        side_b: DataFrame,
        a_key: str,
        b_key: str,
    ) -> DataFrame:
        """Exact-Jaccard check of candidate pairs above the threshold."""
        sh_a = side_a.select(
            F.col(self.id_col).alias("__a_id"),
            word_shingles(F.col(self.text_col)).alias("__a_sh"),
        )
        sh_b = side_b.select(
            F.col(self.id_col).alias("__b_id"),
            word_shingles(F.col(self.text_col)).alias("__b_sh"),
        )
        joined = (
            pairs.join(sh_a, F.col(a_key) == F.col("__a_id"))
            .join(sh_b, F.col(b_key) == F.col("__b_id"))
        )
        inter = F.size(F.array_intersect("__a_sh", "__b_sh")).cast("double")
        union = (F.size("__a_sh") + F.size("__b_sh")).cast("double") - inter
        return joined.filter((inter / union) >= self.threshold).select(a_key, b_key)

    # -- streaming carrier ----------------------------------------------
    def attach(self, stream: DataFrame, checkpoint_dir: str):
        """Attach to a streaming DataFrame via foreachBatch; returns the
        StreamingQuery. The checkpoint dir doubles as the marker's query
        identity: batch ids are scoped to a checkpoint, so a restart
        with a FRESH checkpoint (ids restart at 0) must not be mistaken
        for a replay of the old sequence."""
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
