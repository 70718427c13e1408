"""Settle run for the W2/W3 substrate-gap question (round-3 verdict #4).

BASELINE.md's 5e7-row runs put W2 (scan+predicate) at 4-5x and W3
(group-by) at 5-7x DuckDB with verified-minimal plans; the claim is that
the gap is JVM parquet-decode throughput plus fixed per-query overhead
that AMORTIZES at scale. This script measures the same shapes at 5e8
rows (10x), where decode bandwidth dominates, plus two extension shapes
(BM25, DSIR) on a K-replicated corpus — the ext_* dual-runs in
BENCH_r3 ran on a 5,000-doc corpus where Spark's per-stage overhead
dominates.

Run on an IDLE machine:
    python scripts/bench_settle.py            # 5e8 rows, K=10 corpus
    SPARK_GRAFT_SETTLE_ROWS=100000000 python scripts/bench_settle.py

Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from bench import anchor_run, baseline_workloads  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402
from etl_lealone_spark.tables import TABLE_NAMES, load_tables  # noqa: E402
from etl_lealone_spark.workloads import all_workloads  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXT_AT_SCALE = ["bm25_topk", "dsir_importance_weights"]


def build_scaled_dir(spark, k: int) -> str:
    """A sf-dir clone whose documents table is K-replicated (distinct
    ids, per-copy token salt — same trick as scripts/scale_probe.py);
    all other tables symlink to SF_DIR so load_tables and the DuckDB
    views read identical data."""
    out = tempfile.mkdtemp(prefix=f"settle_sf_x{k}_")
    for t in TABLE_NAMES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, os.path.join(out, f"{t}.parquet"))
    d = load_tables(spark, SF_DIR)["documents"]
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
    docs = copies[0]
    for c in copies[1:]:
        docs = docs.unionAll(c)
    docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def ext_dual_at_scale(
    spark, sf_dir: str, reps: int = 2, names: list[str] | None = None
) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        # testdata tables are single files; the Spark-rewritten documents
        # table is a directory of part files — glob those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    wl = all_workloads()
    out: dict[str, float] = {}
    for name in names or EXT_AT_SCALE:
        w = wl[name]

        def s_run():
            w.build(spark, sf_dir).write.format("noop").mode("overwrite").save()

        def d_run():
            con.execute(w.oracle).fetchall()

        s_run(), d_run()  # warm
        st, dt = [], []
        for _ in range(reps):
            t0 = time.time()
            s_run()
            st.append(time.time() - t0)
            t0 = time.time()
            d_run()
            dt.append(time.time() - t0)
        out[f"ext_{name}_spark"] = round(min(st), 3)
        out[f"ext_{name}_duckdb"] = round(min(dt), 3)
    con.close()
    return out


def duck_anchor() -> float:
    """DuckDB twin of bench.anchor_run: a constant-size, SF-independent
    CPU probe on a fresh connection (DuckDB gets a fresh connection per
    dual-run call, so the anchor matches that substrate). Paired with
    the Spark anchor it turns host drift DURING the settle into a
    recorded, per-engine quantity (r8 verdict task 5 — W4's 0.89→1.09
    swing was pure DuckDB host variance with no in-run evidence)."""
    import duckdb

    con = duckdb.connect()
    t0 = time.time()
    con.execute(
        "SELECT count(*), sum(v % 97), sum(v * 31 % 9973) "
        "FROM (SELECT range AS v FROM range(20000000))"
    ).fetchall()
    con.close()
    return round(time.time() - t0, 3)


def drift_corrected(ratios: dict[str, float], anchors: dict[str, float],
                    first: str, last: str) -> dict[str, float]:
    """Raw ratios divided by sqrt(relative anchor drift): each dual-run
    sits somewhere inside the phase, so on average it sees half the
    phase's total drift — the sqrt is that half-weight in ratio space.
    rel > 1 means the Spark substrate slowed more than DuckDB's, so the
    raw ratios overstate Spark; the corrected set removes that bias
    while the raw set stays the measurement of record."""
    s0, s1 = anchors.get(f"spark_{first}"), anchors.get(f"spark_{last}")
    d0, d1 = anchors.get(f"duckdb_{first}"), anchors.get(f"duckdb_{last}")
    if not all((s0, s1, d0, d1)):
        return {}
    rel = (s1 / s0) / (d1 / d0)
    corr = rel ** 0.5
    return {k: round(v / corr, 2) for k, v in ratios.items()}


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SETTLE_ROWS", "500000000"))
    ks = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SETTLE_K", "10,30").split(",")
        if x.strip()
    ]
    spark = build_spark(app_name="bench_settle", cores=default_parallelism())
    # Cache-state control (r5 verdict task 2): W1 runs LAST so its
    # DuckDB bulk COPY (~15 GB at 5e8 rows) cannot evict the scan
    # shapes' pages mid-suite; min-of-3 reps.
    # TWO untimed warms per engine: the r9 settle's spark_first read
    # 0.658 vs 0.414 at suite end — residual JIT after a single warm
    # biased the drift correction; two warms pin the steady state.
    for _ in range(2):
        anchor_run(spark), duck_anchor()
    anchors: dict[str, float] = {
        "spark_first": anchor_run(spark),
        "duckdb_first": duck_anchor(),
    }
    base = baseline_workloads(spark, n=n, reps=3, w1_last=True)
    anchors["spark_last"] = anchor_run(spark)
    anchors["duckdb_last"] = duck_anchor()
    # Fresh JVM for the ext phase: after the 5e8-row W-suite the executor
    # heap/shuffle state inflates small-corpus walls ~3x (dsir measured
    # 11.5s stale vs 3.7s fresh at identical data) — restart so the ext
    # ratios measure the queries, not the session's history.
    ext: dict[str, float] = {}
    for k in ks:
        # fresh JVM per K: the K-replicated corpus build + ext reps leave
        # heap/shuffle state that inflates the NEXT K's small-corpus
        # walls ~3x (the very effect the post-W-suite restart controls
        # for) — DuckDB gets a fresh connection per call, so a stale
        # Spark session would overstate only the Spark side of the ratio
        spark.stop()
        spark = build_spark(
            app_name=f"bench_settle_ext_k{k}", cores=default_parallelism()
        )
        scaled = build_scaled_dir(spark, k)
        try:
            anchor_run(spark), anchor_run(spark)  # warms (fresh JVM per K)
            anchors[f"spark_first_k{k}"] = anchor_run(spark)
            anchors[f"duckdb_first_k{k}"] = duck_anchor()
            for key, v in ext_dual_at_scale(spark, scaled).items():
                ext[f"{key}_k{k}"] = v
            anchors[f"spark_last_k{k}"] = anchor_run(spark)
            anchors[f"duckdb_last_k{k}"] = duck_anchor()
        finally:
            shutil.rmtree(scaled, ignore_errors=True)
    ratios = {}
    spark_keys = {
        "w1": "w1_bulk_insert",
        "w2": "w2_scan_predicate",
        # W2's same-session decode-substrate twin (r10 verdict task 3):
        # the floor W2 is judged against, from the same host state
        "w2sub": "w2_decode_substrate",
        "w3": "w3_groupby_having",
        "w4": "w4_joins",
        "w5": "w5_topk_offset",
    }
    for wnum, skey in spark_keys.items():
        s, d = base.get(skey), base.get(f"{wnum}_duckdb")
        if s and d:
            ratios[wnum] = round(s / d, 2)
    for name in EXT_AT_SCALE:
        for k in ks:
            s = ext.get(f"ext_{name}_spark_k{k}")
            d = ext.get(f"ext_{name}_duckdb_k{k}")
            if s and d:
                ratios[f"ext_{name}_k{k}"] = round(s / d, 2)
    corrected = drift_corrected(
        {k: v for k, v in ratios.items() if k.startswith("w")},
        anchors, "first", "last",
    )
    for k in ks:
        corrected.update(
            drift_corrected(
                {r: v for r, v in ratios.items() if r.endswith(f"_k{k}")},
                anchors, f"first_k{k}", f"last_k{k}",
            )
        )
    print(
        json.dumps(
            {
                "metric": "settle_run",
                "rows": n,
                "corpus_k": ks,
                "timings": {**base, **ext},
                "anchors": anchors,
                "ratios": ratios,
                "ratios_drift_corrected": corrected,
            }
        )
    )


if __name__ == "__main__":
    main()
