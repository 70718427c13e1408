"""Interleaved A/B for the r12 batch-1 restructurings (guide §1).

The host is contention-sensitive (BENCHLOG r12: CPU-bound kernels
inflate 2-4x under competing load, and separate-session measurements an
hour apart drift ±50%), so old-vs-new per-query timings are only
meaningful INTERLEAVED in one session: A,B,A,B,... x reps, min per
variant (the bench's own dual-run methodology). The OLD variants are
reconstructed inline here from the pre-r12-batch-1 source; results are
asserted row-identical to the new package implementations before timing.

    python scripts/opt_ab_r12.py [sf_dir] [reps] [name ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402
from etl_lealone_spark.tables import load_tables  # noqa: E402


# --------------------------------------------------------------------------
# OLD implementations (pre-batch-1), verbatim shapes
# --------------------------------------------------------------------------
def old_unigram_logprob(df, buckets=4096, scale=1_000_000):
    from etl_lealone_spark.operators.dedup import words

    n = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        df.repartition(n, F.col("doc_id"))
        .select(F.col("doc_id").alias("id"),
                F.explode(words(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .select(
            "id",
            (F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10)
             .cast("long") % buckets).alias("b"),
        )
    )
    counts = tok.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(F.sum("c").alias("n"))
    lp_tbl = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.floor(F.log((F.col("c") + 1).cast("double")
                      / (F.col("n") + buckets).cast("double"))
                * scale + F.lit(0.5)).cast("long").alias("lp"),
    )
    return (tok.join(F.broadcast(lp_tbl), "b").groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_tokens_lm"),
                 F.sum("lp").alias("logprob_x1e6")))


def old_source_overlap(df):
    from etl_lealone_spark.operators.dedup import minhash_band_keys

    banded = minhash_band_keys(df).localCheckpoint(eager=True)
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(right,
                  (F.col("l.band") == F.col("r.band"))
                  & (F.col("l.band_hash") == F.col("r.band_hash"))
                  & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    src = df.select(F.col("doc_id").alias("id"), F.col("source").alias("src"))
    a, b = src.alias("sa"), src.alias("sb")
    labeled = (
        cand.join(a, F.col("id_a") == F.col("sa.id"))
        .join(b, F.col("id_b") == F.col("sb.id"))
        .select(F.least(F.col("sa.src"), F.col("sb.src")).alias("source_a"),
                F.greatest(F.col("sa.src"), F.col("sb.src")).alias("source_b"))
    )
    return labeled.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"))


def old_pretrain(d):
    from etl_lealone_spark.operators.dedup import normalized_text
    from etl_lealone_spark.operators.pipeline import decontaminate
    from etl_lealone_spark.operators.textops import hash_sample, quality_filter

    ev = d.filter(F.col("source") == "src0")
    base = (
        quality_filter(d.filter(F.col("source") != "src0"))
        .select("doc_id", "lang", "source", "text", "n_tokens",
                F.md5(normalized_text(F.col("text"))).alias("ch"))
        .localCheckpoint(eager=True)
    )
    keepers = base.groupBy("ch").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    surv = base.join(keepers, "doc_id", "left_semi")
    clean = decontaminate(surv, ev, ngram=5)
    sampled = hash_sample(clean, rates={"en": 0.5}, default_rate=0.9,
                          stratum_col="lang")
    shard = (F.conv(F.substring(F.md5(F.concat(F.lit("epoch0:shard:"),
             F.col("doc_id").cast("string"))), 1, 15), 16, 10)
             .cast("bigint") % 64).cast("int")
    return sampled.select("doc_id", "lang", "source",
                          F.col("n_tokens").cast("int").alias("n_tokens"),
                          shard.alias("shard_id"))


def old_ccnet(d):
    lp = old_unigram_logprob(d).select(
        F.col("id").alias("doc_id"), "n_tokens_lm", "logprob_x1e6")
    joined = lp.join(d.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy(
        (F.col("logprob_x1e6").cast("double")
         / F.col("n_tokens_lm").cast("double")).desc(), F.col("doc_id"))
    return (joined.withColumn("bucket", F.ntile(3).over(w))
            .groupBy("source",
                     F.when(F.col("bucket") == 1, "head")
                     .when(F.col("bucket") == 2, "middle")
                     .otherwise("tail").alias("stratum"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens_lm").cast("bigint").alias("sum_tokens")))


# --------------------------------------------------------------------------
def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    rest = args[1:] if args and "/" in args[0] else args
    reps = int(rest[0]) if rest and rest[0].isdigit() else 4
    names = rest[1:] if rest and rest[0].isdigit() else rest

    spark = build_spark(app_name="opt_ab_r12", cores=default_parallelism())
    t = load_tables(spark, sf_dir)
    d = t["documents"]

    from etl_lealone_spark.operators.dedup import minhash_source_overlap
    from etl_lealone_spark.operators.pipeline import pretrain_corpus_build
    from etl_lealone_spark.workloads import all_workloads

    wl = all_workloads()

    cases = {
        "text_unigram_logprob": (
            lambda: old_unigram_logprob(d),
            lambda: wl["text_unigram_logprob"].build(spark, sf_dir),
        ),
        "ccnet_fluency_buckets": (
            lambda: old_ccnet(d),
            lambda: wl["ccnet_fluency_buckets"].build(spark, sf_dir),
        ),
        "source_overlap_matrix": (
            lambda: old_source_overlap(d),
            lambda: minhash_source_overlap(d),
        ),
        "pretrain_pipeline_e2e": (
            lambda: old_pretrain(d),
            lambda: pretrain_corpus_build(d),
        ),
    }
    if names:
        cases = {k: v for k, v in cases.items() if k in names}

    out = {}
    for name, (old_fn, new_fn) in cases.items():
        # equality gate first (sorted-row compare), then interleaved timing
        a = sorted(map(tuple, old_fn().collect()))
        b = sorted(map(tuple, new_fn().collect()))
        assert a == b, f"{name}: old/new results differ"
        for fn in (old_fn, new_fn):  # warm both plans
            fn().write.format("noop").mode("overwrite").save()
        olds, news = [], []
        for _ in range(reps):
            t0 = time.time()
            old_fn().write.format("noop").mode("overwrite").save()
            olds.append(time.time() - t0)
            t0 = time.time()
            new_fn().write.format("noop").mode("overwrite").save()
            news.append(time.time() - t0)
        out[name] = {"old_min": round(min(olds), 3),
                     "new_min": round(min(news), 3),
                     "old": [round(x, 3) for x in olds],
                     "new": [round(x, 3) for x in news]}
        print(f"{name}: old={min(olds):.3f} new={min(news):.3f} "
              f"({[round(x,2) for x in olds]} vs {[round(x,2) for x in news]})",
              flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))


if __name__ == "__main__":
    main()
