"""IncrementalCorpusBuilder: the micro-batch twin of
pretrain_corpus_build. The headline property is EQUIVALENCE — streaming
the corpus in ordered chunks yields exactly the batch pipeline's
output — plus cross-batch dedup statefulness."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lealone_spark.operators.pipeline import pretrain_corpus_build
from etl_lealone_spark.streaming.incremental_corpus import (
    IncrementalCorpusBuilder,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_batch_build(spark, tables, tmp_path):
    d = tables["documents"]
    ev = d.filter(F.col("source") == "src0")
    raw = d.filter(F.col("source") != "src0")
    builder = IncrementalCorpusBuilder(spark, str(tmp_path / "state"), ev)
    # ascending-id chunks (the ordered-delivery contract)
    cuts = [0, 150, 320, 10**9]
    for lo, hi in zip(cuts, cuts[1:]):
        builder.process_batch(
            raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
    got = _sorted_rows(builder.corpus.read())
    want = _sorted_rows(pretrain_corpus_build(d))
    assert got == want
    assert len(got) > 0


def test_cross_batch_duplicate_dropped(spark, tmp_path):
    base_text = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps for a long while in the sun"
    )
    rows1 = [(1, base_text, "en", "s1"), (2, base_text + " extra tail words", "en", "s1")]
    rows2 = [(10, base_text, "en", "s1")]  # exact dup of doc 1, later batch
    schema = "doc_id long, text string, lang string, source string"
    ev = spark.createDataFrame([], schema)
    b = IncrementalCorpusBuilder(
        spark, str(tmp_path / "s2"), ev, rates={}, default_rate=1.0
    )
    a1 = b.process_batch(spark.createDataFrame(rows1, schema))
    assert sorted(r["doc_id"] for r in a1.collect()) == [1, 2]
    a2 = b.process_batch(spark.createDataFrame(rows2, schema))
    assert a2.count() == 0  # content already accepted in batch 1
    assert b.corpus.read().count() == 2


def test_decontamination_uses_static_eval_grams(spark, tmp_path):
    schema = "doc_id long, text string, lang string, source string"
    ev_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ev = spark.createDataFrame([(99, ev_text, "en", "src0")], schema)
    contaminated = (
        "intro words first then alpha beta gamma delta epsilon and the "
        "rest of the document keeps going with more filler words"
    )
    clean_text = (
        "totally unrelated content about the weather and the seasons "
        "with enough words for the quality gate to keep it around"
    )
    b = IncrementalCorpusBuilder(
        spark, str(tmp_path / "s3"), ev, rates={}, default_rate=1.0
    )
    acc = b.process_batch(
        spark.createDataFrame(
            [(1, contaminated, "en", "s1"), (2, clean_text, "en", "s1")], schema
        )
    )
    assert [r["doc_id"] for r in acc.collect()] == [2]


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch re-delivers the in-flight batch after restart; the
    committed-batch-id marker must make the replay a no-op."""
    schema = "doc_id long, text string, lang string, source string"
    text = (
        "plenty of ordinary words here so the quality gate keeps this "
        "document in the corpus for the replay test today"
    )
    ev = spark.createDataFrame([], schema)
    b = IncrementalCorpusBuilder(
        spark, str(tmp_path / "xo"), ev, rates={}, default_rate=1.0
    )
    first = b.process_batch(
        spark.createDataFrame([(1, text, "en", "s1")], schema), batch_id=0
    )
    assert first.count() == 1
    v_corpus = b.corpus.version
    # replay of the same batch id: no output rows, no new state version
    replay = b.process_batch(
        spark.createDataFrame([(1, text, "en", "s1")], schema), batch_id=0
    )
    assert replay.count() == 0
    assert b.corpus.version == v_corpus
    # the next batch id commits normally
    nxt = b.process_batch(
        spark.createDataFrame([(2, text + " two", "en", "s1")], schema),
        batch_id=1,
    )
    assert nxt.count() == 1 and b.corpus.read().count() == 2
