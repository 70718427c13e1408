"""Scaling probe: run the flagship pipeline operators at K× the sf0.1
corpus and print the wall-clock scaling curve.

The correctness gates run at fixed SFs; this script is the evidence for
the scaling CLAIM — near-linear wall growth for the bucketed/banded
pipelines (MinHash-LSH, exact dedup, BM25, brute-force ANN) as data
grows 10×, i.e. no hidden quadratic term waiting at 100 TB.

Corpus scaling: documents are replicated K× with distinct doc_ids and a
per-copy token salt appended, so near-dup structure is preserved (each
copy family keeps its within-family similarity) while content hashes
stay distinct across copies — the workload does MORE work, not
deduplicated-away work. Embeddings are replicated with vec_id offsets.

Usage: python scripts/scale_probe.py [K ...]   (default: 1 3 10)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_lealone_spark.operators import dedup, similarity  # noqa: E402
from etl_lealone_spark.operators.pipeline import (  # noqa: E402
    dsir_log_weights,
    pretrain_corpus_build,
)
from etl_lealone_spark.operators.ranking import bm25_scores  # noqa: E402
from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402
from etl_lealone_spark.tables import load_tables  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def scaled_docs(t, k: int):
    d = t["documents"]
    if k == 1:
        return d
    copies = [
        d.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copysalt{i}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    return out.repartition(32)


def scaled_embeddings(t, k: int):
    e = t["embeddings"]
    if k == 1:
        return e
    copies = [
        e.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    return out.repartition(32)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    spark = build_spark(app_name="scale_probe", cores=default_parallelism())
    t = load_tables(spark, SF_DIR)
    rows = []
    for k in ks:
        docs = scaled_docs(t, k).localCheckpoint()  # materialize the corpus
        n_docs = docs.count()
        emb = scaled_embeddings(t, k).localCheckpoint()
        n_emb = emb.count()
        timings = {}

        t0 = time.time()
        dedup.exact_dedup(docs).write.format("noop").mode("overwrite").save()
        timings["dedup_exact"] = time.time() - t0

        t0 = time.time()
        dedup.minhash_lsh_pairs(docs).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["minhash_pairs"] = time.time() - t0

        t0 = time.time()
        bm25_scores(docs, ["widget", "gear", "ring"]).orderBy(
            F.desc("bm25"), "doc_id"
        ).limit(50).write.format("noop").mode("overwrite").save()
        timings["bm25_topk"] = time.time() - t0

        t0 = time.time()
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        similarity.brute_force_topk(emb, queries, k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        timings["ann_bruteforce"] = time.time() - t0

        t0 = time.time()
        pretrain_corpus_build(docs).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["pretrain_e2e"] = time.time() - t0

        t0 = time.time()
        dsir_log_weights(docs, F.col("source") == "src0").write.format(
            "noop"
        ).mode("overwrite").save()
        timings["dsir_weights"] = time.time() - t0

        rows.append((k, n_docs, n_emb, timings))
        parts = " ".join(f"{q}={s:.2f}s" for q, s in timings.items())
        print(f"K={k} docs={n_docs} emb={n_emb} {parts}", flush=True)

    base = rows[0]
    print("\nscaling vs K=1 (wall ratio / data ratio — 1.0 = perfectly linear):")
    for k, n_docs, _, timings in rows[1:]:
        for q, s in timings.items():
            lin = (s / base[3][q]) / (n_docs / base[1])
            print(f"  K={k} {q}: {s / base[3][q]:.2f}x wall for "
                  f"{n_docs / base[1]:.0f}x data → linearity {lin:.2f}")


if __name__ == "__main__":
    main()
