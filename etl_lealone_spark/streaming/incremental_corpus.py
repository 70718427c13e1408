"""Incremental pretraining-corpus construction over a document stream.

The batch capstone (operators/pipeline.pretrain_corpus_build) builds the
corpus in one pass; this is its micro-batch twin for continuous ingest:
each batch runs the SAME per-document stages (quality gate, exact dedup,
5-gram decontamination, mixture sampling, shard assignment), with the
cross-document stage — exact dedup — made stateful:

1. quality gate: map-only predicate over the batch,
2. intra-batch dedup: keep-min on the normalized content hash,
3. cross-batch dedup: anti-join of batch hashes against the accumulated
   content-hash state (16 bytes/doc of state; at cluster scale bucket
   the state table by hash so the anti-join is shuffle-free on the
   state side),
4. decontamination: anti-join of the batch's word 5-grams against the
   STATIC eval-slice gram set (computed once at construction, kept as a
   checkpointed compact table; broadcast per batch),
5. sampling + sharding: deterministic md5-bucket rules — identical to
   the batch build for every document regardless of which batch carried
   it.

Equivalence contract (pinned by test): if the stream delivers documents
in ascending doc_id order (any chunking), the accepted corpus is
IDENTICAL to the batch pipeline's output — per-document stages are
deterministic, and first-seen-wins across batches equals keep-min under
ordered delivery. Out-of-order delivery keeps the first-seen copy of
each duplicate family instead.

Exactly-once: foreachBatch re-delivers the in-flight batch after a
restart. A committed-batch-id marker (atomic file flip beside the
state tables) recognizes fully-applied replays, and the state appends
themselves are idempotent (anti-joined on their keys) in a
crash-convergent order — a batch that died between the two state
appends re-applies cleanly on replay with no loss and no duplication.

State grows with ACCEPTED documents (16-byte hash each), not stream
length. No stage is quadratic; nothing driver-side but the pointer flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import normalized_text
from ..operators.dml import SnapshotTable
from ..operators.pipeline import _word_ngrams, ws_tokens
from ..operators.textops import hash_sample, quality_filter
from ._marker import BatchCommitMarker


class IncrementalCorpusBuilder:
    """Stateful micro-batch twin of ``pretrain_corpus_build``."""

    def __init__(
        self,
        spark: SparkSession,
        state_root: str,
        eval_docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        rates: dict | None = None,
        default_rate: float = 0.9,
        n_shards: int = 64,
        shard_seed: str = "epoch0",
        ngram: int = 5,
    ):
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self.rates = rates if rates is not None else {"en": 0.5}
        self.default_rate = default_rate
        self.n_shards = n_shards
        self.shard_seed = shard_seed
        self.ngram = ngram
        self.state_root = state_root
        self._marker = BatchCommitMarker(state_root)
        self.corpus = SnapshotTable(spark, state_root, "corpus")
        self.hash_state = SnapshotTable(spark, state_root, "content_hashes")
        # the eval gram set is fixed for the life of the builder — compute
        # once, keep compact and materialized; per batch it is broadcast
        # into the anti-join (an eval slice is a benchmark suite: small)
        self.eval_grams = (
            self._grams(eval_docs).select("g").distinct().localCheckpoint(eager=True)
        )

    def _grams(self, df: DataFrame) -> DataFrame:
        # project the token array FIRST; the n-gram lambda must reference
        # a materialized column, not the split expression (re-evaluated
        # per element access otherwise — see operators.pipeline
        # contamination_hits)
        return df.select(
            F.col(self.id_col), ws_tokens(F.col(self.text_col)).alias("__ws")
        ).select(
            F.col(self.id_col),
            F.explode(
                F.array_distinct(_word_ngrams(F.col("__ws"), self.ngram))
            ).alias("g"),
        )

    def process_batch(
        self,
        batch: DataFrame,
        batch_id: int | None = None,
        query_key: str = "",
    ) -> DataFrame:
        """Run the pipeline on one batch against state; returns the
        accepted (doc_id, lang, source, n_tokens, shard_id) rows and
        appends them (plus their content hashes) to state.

        Exactly-once: when the streaming carrier supplies a ``batch_id``
        (foreachBatch does), an id at or below the committed marker is a
        checkpoint replay — state is untouched and an empty frame comes
        back. Ad-hoc calls without an id skip the marker (batch mode)."""
        if batch_id is not None and batch_id <= self._marker.last_committed(
            query_key
        ):
            return self.corpus.read().limit(0)
        base = quality_filter(batch, self.text_col).withColumn(
            "ch", F.md5(normalized_text(F.col(self.text_col)))
        )
        # intra-batch keep-min on content hash
        keep = (
            base.groupBy("ch")
            .agg(F.min(self.id_col).alias(self.id_col))
            .select(self.id_col)
        )
        surv = base.join(keep, self.id_col, "left_semi")
        # cross-batch: drop anything whose content was already accepted
        if self.hash_state.exists():
            surv = surv.join(self.hash_state.read(), "ch", "left_anti")
        surv = surv.localCheckpoint(eager=True)  # consumed 3x below
        # decontamination against the static eval gram set
        hits = (
            self._grams(surv)
            .join(F.broadcast(self.eval_grams), "g", "left_semi")
            .select(self.id_col)
            .distinct()
        )
        clean = surv.join(hits, self.id_col, "left_anti")
        sampled = hash_sample(
            clean,
            rates=self.rates,
            default_rate=self.default_rate,
            key_col=self.id_col,
            stratum_col="lang",
        )
        shard = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{self.shard_seed}:shard:"),
                            F.col(self.id_col).cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % self.n_shards
        ).cast("int")
        out = sampled.select(
            self.id_col,
            "lang",
            "source",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            shard.alias("shard_id"),
        ).localCheckpoint(eager=True)
        # state append — crash-convergent ordering and idempotence:
        # corpus rows first (anti-joined on doc_id so a replay of a
        # partially-committed batch never duplicates), THEN the content
        # hashes (anti-joined on ch). Whatever point a previous attempt
        # died at, the replay re-derives the same deterministic rows and
        # the anti-joins make every append a no-op for data already
        # committed; a crash after the hashes but before the marker
        # leaves the replayed batch fully dropped by the hash anti-join
        # with its corpus rows ALREADY present from the first attempt.
        new_hashes = surv.select("ch")
        if self.corpus.exists():
            self.corpus.insert(
                out.join(
                    self.corpus.read().select(self.id_col), self.id_col, "left_anti"
                )
            )
        else:
            self.corpus.create(out)
        if self.hash_state.exists():
            self.hash_state.insert(
                new_hashes.join(self.hash_state.read(), "ch", "left_anti")
            )
        else:
            self.hash_state.create(new_hashes)
        if batch_id is not None:
            self._marker.commit(batch_id, query_key)
        return out

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
