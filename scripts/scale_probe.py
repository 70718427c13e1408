"""Scaling probe: run the flagship pipeline operators at K× the sf0.1
corpus and print the wall-clock scaling curve.

The correctness gates run at fixed SFs; this script is the evidence for
the scaling CLAIM — near-linear wall growth for the bucketed/banded
pipelines (MinHash-LSH, exact dedup, BM25, brute-force ANN) as data
grows 10×, i.e. no hidden quadratic term waiting at 100 TB.

Corpus scaling: documents are replicated K× with distinct doc_ids and
every WORD prefixed with a per-copy tag, so each copy keeps the
original's within-copy near-dup structure (the same transformation hits
every doc) while copies of the same doc share NO shingles — duplicate
DENSITY stays constant as the corpus grows. This matters: an
append-a-trailing-salt replication (the first version of this probe)
leaves copies ~98% shingle-identical, so the true near-dup pair count
grows K² and the probe measures output size, not the algorithm —
minhash shuffle bytes measured 103x for 30x data that way, vs linear
with per-word tags. Embeddings are replicated with vec_id offsets and
a per-copy deterministic component nudge for the same reason.

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
            # per-word copy tag: every shingle differs across copies
            # (constant duplicate density), within-copy structure intact
            F.regexp_replace(
                F.col("text"), r"(^|\s)(\S)", rf"$1c{i}q$2"
            ).alias("text"),
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
            F.transform(
                "embedding", lambda x: (x + F.lit(i) * F.lit(0.003)).cast("float")
            ).alias("embedding"),
            "label",
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    return out.repartition(32)


def _shuffle_bytes(spark) -> int:
    """Total shuffle-WRITE bytes across all completed stages so far,
    via the Spark UI REST API (public monitoring interface). Diffing
    around an operator gives its shuffle volume — the number that
    decides whether a plan survives a 100x scale-up."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = _json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    # UI on: the probe reads per-stage shuffleWriteBytes from the
    # monitoring REST API (the UI server hosts it; normally off for bench
    # hygiene)
    spark = build_spark(
        app_name="scale_probe",
        cores=default_parallelism(),
        extra_conf={"spark.ui.enabled": "true"},
    )
    t = load_tables(spark, SF_DIR)
    rows = []
    shuffles_all: dict[int, dict[str, float]] = {}
    for k in ks:
        docs = scaled_docs(t, k).localCheckpoint()  # materialize the corpus
        n_docs = docs.count()
        emb = scaled_embeddings(t, k).localCheckpoint()
        n_emb = emb.count()
        timings = {}
        shuffles: dict[str, float] = {}
        shuffles_all[k] = shuffles

        def timed(name, fn):
            s0 = _shuffle_bytes(spark)
            t0 = time.time()
            fn()
            timings[name] = time.time() - t0
            s1 = _shuffle_bytes(spark)
            shuffles[name] = round((s1 - s0) / 1e6, 1) if s0 >= 0 and s1 >= 0 else -1

        timed(
            "dedup_exact",
            lambda: dedup.exact_dedup(docs)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        timed(
            "minhash_pairs",
            lambda: dedup.minhash_lsh_pairs(docs)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        timed(
            "dedup_clusters",
            lambda: dedup.connected_components(dedup.minhash_lsh_pairs(docs))
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        timed(
            "bm25_topk",
            lambda: bm25_scores(docs, ["widget", "gear", "ring"])
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(50)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        timed(
            "ann_bruteforce",
            lambda: similarity.brute_force_topk(emb, queries, k=10)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

        def ivf_build_and_probe():
            import shutil
            import tempfile

            root = tempfile.mkdtemp(prefix="probe_ivf_") + "/idx"
            idx = similarity.IvfIndex(spark, root)
            idx.build(emb)
            q = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"),
                similarity.quantize(F.col("embedding")).alias("qvec"),
            )
            idx.topk(q, k=10, n_probe=4).write.format("noop").mode(
                "overwrite"
            ).save()
            shutil.rmtree(root, ignore_errors=True)

        timed("ann_ivf_build_probe", ivf_build_and_probe)
        timed(
            "pretrain_e2e",
            lambda: pretrain_corpus_build(docs)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        timed(
            "dsir_weights",
            lambda: dsir_log_weights(docs, F.col("source") == "src0")
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

        rows.append((k, n_docs, n_emb, timings))
        parts = " ".join(f"{q}={s:.2f}s" for q, s in timings.items())
        print(f"K={k} docs={n_docs} emb={n_emb} {parts}", flush=True)
        sh = " ".join(f"{q}={mb}MB" for q, mb in shuffles.items())
        print(f"K={k} shuffle-write: {sh}", flush=True)

    import math

    base = rows[0]
    print(
        "\nscaling vs K=1 — wall ratio / data ratio (1.0 = perfectly "
        "linear) and the fitted exponent e in wall ~ data^e:"
    )
    for k, n_docs, _, timings in rows[1:]:
        for q, s in timings.items():
            dr = n_docs / base[1]
            wr = s / base[3][q]
            expo = math.log(wr) / math.log(dr) if wr > 0 and dr > 1 else float("nan")
            sh_k, sh_1 = shuffles_all[k].get(q, -1), shuffles_all[base[0]].get(q, -1)
            sh_txt = (
                f" shuffle {sh_1}→{sh_k}MB ({sh_k / sh_1:.1f}x)"
                if sh_1 and sh_1 > 0 and sh_k > 0
                else ""
            )
            print(
                f"  K={k} {q}: {wr:.2f}x wall for {dr:.0f}x data → "
                f"exponent {expo:.2f}{sh_txt}"
            )


if __name__ == "__main__":
    main()
