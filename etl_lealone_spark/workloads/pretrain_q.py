"""Pretraining-corpus construction workloads.

Three capstone pipelines over the documents table:

- ``pretrain_pipeline_e2e`` — the WHOLE corpus build as one dataflow:
  quality gate -> exact dedup -> benchmark decontamination -> mixture
  sampling -> training shards. Every stage is the already-oracle-checked
  operator; this workload proves they COMPOSE (the property a real 100 TB
  corpus build needs) and the DuckDB oracle recomputes the full pipeline
  end-to-end.
- ``dsir_importance_weights`` — Data Selection via Importance Resampling
  (Xie et al. 2023): hashed-unigram likelihood-ratio scoring of raw
  documents against a target slice, in exact fixed-point arithmetic.
- ``split_train_val_test`` — deterministic md5-bucket train/val/test
  hold-out with per-(split, source) doc/token accounting.

Reference parity: the reference engine has no corpus surface; these are
BASELINE.json extension operators (see COVERAGE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline import dsir_log_weights, hash_split
from ..operators.textops import EN_STOPWORDS, token_count
from ..tables import load_tables
from . import workload
from .text_q import _o_substr_count

_WS = "[ \\t\\n]+"

# quality-gate CTE fragment shared by the e2e oracle (identical rules to
# text_quality_filter's oracle — same rounded features, same bounds)
_N_TOKENS = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    f"ELSE cast(len(string_split_regex(trim(text), '{_WS}')) as int) END"
)


def _quality_kept_cte() -> str:
    padded = "(' ' || lower(text) || ' ')"
    stop_hits = " + ".join(_o_substr_count(padded, f" {w} ") for w in EN_STOPWORDS)
    return f"""
    raw AS (
      SELECT doc_id, lang, source, text,
             {_N_TOKENS} AS n_tokens,
             length(regexp_replace(text, '[ \\t\\n]', '', 'g')) AS n_nonspace,
             ({stop_hits}) AS stop_hits,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
             length(text) AS n_chars_m
      FROM documents WHERE source <> 'src0'
    ),
    feats AS (
      SELECT doc_id, lang, source, text, n_tokens,
             round(cast(n_nonspace as double) / greatest(n_tokens, 1), 6) AS mean_word_len,
             round(cast(stop_hits as double) / greatest(n_tokens, 1), 6) AS stopword_ratio,
             round(cast(n_digits as double) / greatest(n_chars_m, 1), 6) AS digit_ratio
      FROM raw
    ),
    kept AS (
      SELECT doc_id, lang, source, text, n_tokens FROM feats
      WHERE n_tokens BETWEEN 10 AND 100000
        AND mean_word_len BETWEEN 3 AND 12
        AND stopword_ratio > 0
        AND digit_ratio <= 0.2
    )"""


_GRAMS5 = (
    "list_distinct([array_to_string(ws[i+1:i+5], ' ') "
    "for i in range(greatest(len(ws) - 4, 0))])"
)

_E2E_SQL = f"""
    WITH {_quality_kept_cte()},
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS ch
            FROM kept)
      GROUP BY ch
    ),
    surv AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id)),
    evg AS (
      SELECT DISTINCT unnest(gs) AS g FROM (
        SELECT {_GRAMS5} AS gs
        FROM (SELECT string_split_regex(trim(text), '{_WS}') AS ws
              FROM documents WHERE source = 'src0')
      )
    ),
    cont AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest(gs) AS g FROM (
          SELECT doc_id, {_GRAMS5} AS gs
          FROM (SELECT doc_id, string_split_regex(trim(text), '{_WS}') AS ws
                FROM surv)
        )
      ) t JOIN evg USING (g)
    ),
    clean AS (
      SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM cont)
    )
    SELECT doc_id, lang, source, cast(n_tokens as int) AS n_tokens,
           cast(('0x' || substr(md5('epoch0:shard:' || cast(doc_id as varchar)), 1, 15))::BIGINT
                % 64 as int) AS shard_id
    FROM clean
    WHERE ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::BIGINT % 10000
          < CASE WHEN lang = 'en' THEN 5000 ELSE 9000 END
    """


@workload(
    "pretrain_pipeline_e2e",
    _E2E_SQL,
    doc="End-to-end pretraining corpus build: C4/Gopher quality gate -> "
    "exact dedup (normalized content hash, keep-min) -> GPT-3-style 5-gram "
    "decontamination vs the src0 eval slice -> per-language mixture "
    "sampling -> 64-way training shards. One composed dataflow; the "
    "oracle replays every stage.",
)
def pretrain_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus build as one lazy Spark plan — see
    operators.pipeline.pretrain_corpus_build for the per-stage scale
    shape."""
    from ..operators.pipeline import pretrain_corpus_build

    d = load_tables(spark, sf_dir)["documents"]
    return pretrain_corpus_build(d)


@workload(
    "streaming_corpus_build",
    _E2E_SQL,
    doc="Batch twin of the STREAMING corpus surface: the same corpus "
    "as pretrain_pipeline_e2e, built by IncrementalCorpusBuilder's "
    "micro-batch path (streaming/incremental_corpus.py) over three "
    "ascending-id chunks with real batch ids + the exactly-once commit "
    "marker — so the stateful cross-batch dedup, decontamination, and "
    "marker replay-protection code is driver-oracle-checked, not just "
    "pytest-pinned (r4 verdict task 8). Oracle = the full e2e replay.",
)
def streaming_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.incremental_corpus import IncrementalCorpusBuilder

    import shutil

    d = load_tables(spark, sf_dir)["documents"]
    ev = d.filter(F.col("source") == "src0")
    raw = d.filter(F.col("source") != "src0")
    state_root = tempfile.mkdtemp(prefix="stream_corpus_state_")
    try:
        builder = IncrementalCorpusBuilder(spark, state_root, ev)
        # three ascending-doc_id chunks: the ordered-delivery contract
        # under which streaming output is pinned identical to the batch
        # build
        max_id = raw.agg(F.max("doc_id")).collect()[0][0] or 0
        cuts = [0, max_id // 3 + 1, 2 * max_id // 3 + 1, max_id + 1]
        for i, (lo, hi) in enumerate(zip(cuts, cuts[1:])):
            batch = raw.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            builder.process_batch(batch, batch_id=i, query_key=state_root)
            # replay the same id: the marker must make it a no-op (the
            # foreachBatch restart path), or the corpus would double
            builder.process_batch(batch, batch_id=i, query_key=state_root)
        # materialize the (small) accepted corpus driver-side so the
        # state directory can be removed before returning — mkdtemp
        # state otherwise accumulates across every gate run
        final = builder.corpus.read()
        return spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(state_root, ignore_errors=True)


_DSIR_SQL = """
    WITH w AS (
      SELECT doc_id, source,
             list_filter(
               string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
               x -> x <> '') AS ws
      FROM documents
    ),
    tok AS (
      SELECT doc_id, source = 'src0' AS is_t,
             ('0x' || substr(md5(wd), 1, 15))::BIGINT % 1024 AS b
      FROM (SELECT doc_id, source, unnest(ws) AS wd FROM w)
    ),
    counts AS (
      SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_t,
             sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS c_r
      FROM tok GROUP BY b
    ),
    tot AS (SELECT cast(sum(c_t) as bigint) AS n_t, cast(sum(c_r) as bigint) AS n_r
            FROM counts),
    lr AS (
      SELECT b,
             cast(floor(ln(cast((c_t + 1) * (n_r + 1024) as double)
                           / cast((c_r + 1) * (n_t + 1024) as double))
                        * 1000000 + 0.5) as bigint) AS lr
      FROM counts, tot
    )
    SELECT doc_id, count(*) AS n_scored_tokens,
           cast(sum(lr) as bigint) AS log_weight_x1e6
    FROM tok JOIN lr USING (b)
    WHERE NOT is_t
    GROUP BY doc_id
    """


@workload(
    "dsir_importance_weights",
    _DSIR_SQL,
    doc="DSIR hashed-unigram importance weights (Xie et al. 2023): "
    "per-bucket Laplace-smoothed log-likelihood ratio of the src0 target "
    "slice vs the raw corpus, summed per document in exact fixed-point "
    "bigint arithmetic. Bucket table is 1024 rows -> broadcast; one "
    "shuffle for bucket counts, one for the per-doc sum.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return dsir_log_weights(
        d, F.col("source") == "src0", buckets=1024
    ).select(
        F.col("id").alias("doc_id"), "n_scored_tokens", "log_weight_x1e6"
    )


_SPLIT_SQL = f"""
    WITH s AS (
      SELECT source,
             CASE WHEN ('0x' || substr(md5('split0:' || cast(doc_id as varchar)), 1, 8))::BIGINT
                       % 10000 < 9600 THEN 'train'
                  WHEN ('0x' || substr(md5('split0:' || cast(doc_id as varchar)), 1, 8))::BIGINT
                       % 10000 < 9800 THEN 'val'
                  ELSE 'test' END AS split,
             {_N_TOKENS} AS n_tokens
      FROM documents
    )
    SELECT split, source, count(*) AS n_docs,
           cast(sum(n_tokens) as bigint) AS sum_tokens
    FROM s GROUP BY split, source
    """


@workload(
    "split_train_val_test",
    _SPLIT_SQL,
    doc="Deterministic 96/2/2 train/val/test hold-out by seeded md5 "
    "bucket of the doc id (documents never migrate between splits as the "
    "corpus grows) + per-(split, source) doc/token accounting. Map-only "
    "split, one aggregation on a tiny key.",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir)["documents"]
    return (
        hash_split(d, fractions=(0.96, 0.02), seed="split0")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text")).cast("long")).alias("sum_tokens"),
        )
    )
