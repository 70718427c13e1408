"""dsir_importance_weights crossover probe (r6 verdict task 2).

BASELINE.md r06 left dsir as the one perf-weak grade: K=10 7.87x ->
K=30 3.9x with a ~0.4 wall exponent — falling, but the crossover was
never MEASURED. This probe runs the identical dual-run protocol as
bench_settle's ext phase (fresh JVM per K, fresh DuckDB connection per
call, warm + min-of-2) at larger K so the record shows either a
measured crossing or a pinned floor.

It also runs a SUBSTRATE TWIN at each K, the decode_probe trick applied
to dsir's dominant stage: dsir is explode(words) -> per-(doc,bucket)
count -> two joins on a compact table, and its wall is dominated by the
tokenize+explode+hash of every document. The twin measures exactly
that stage alone in both engines (explode words, md5-bucket, count
rows — nothing a planner can reorder), so if the full-query ratio
tracks the twin ratio, the remaining gap is string-tokenization
substrate (JVM UTF-8 regex split + md5 vs DuckDB's native string ops),
not plan quality. The twin's (count, sum) is asserted bit-equal across
engines on the full scaled corpus before any rep is timed — a ratio of
two different computations would be meaningless.

Run on an IDLE machine:
    python scripts/dsir_probe.py            # K = 30, 100
    python scripts/dsir_probe.py 30 60 100  # custom ladder

Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from bench_settle import build_scaled_dir, ext_dual_at_scale  # noqa: E402

from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402

# The tokenize+explode+hash substrate twin: the same fused split as
# dsir's first stage (split(lower, '[^a-z0-9]+'), r10 — one regex pass
# instead of regexp_replace+trim+split), md5 bucket hash, and a global
# count — no importance-weight logic, no per-doc aggregation, nothing
# plan-dependent. Spark side mirrors
# operators/pipeline.dsir_log_weights' first stage verbatim; the
# DuckDB side keeps its own best form (the two produce the identical
# nonempty-token multiset — asserted below before timing).
_TWIN_DUCKDB = """
    SELECT count(*) AS n, cast(sum(b) as bigint) AS s FROM (
      SELECT ('0x' || substr(md5(wd), 1, 15))::BIGINT % 1024 AS b
      FROM (
        SELECT unnest(list_filter(
          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
          x -> x <> '')) AS wd
        FROM documents
      ) t
    ) u
"""


def twin_spark(spark, sf_dir: str) -> tuple[int, int]:
    from pyspark.sql import functions as F

    from etl_lealone_spark.tables import load_tables

    d = load_tables(spark, sf_dir)["documents"]
    r = (
        d.select(
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .select(
            (
                F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast(
                    "long"
                )
                % 1024
            ).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("b").alias("s"))
        .first()
    )
    return (int(r["n"]), int(r["s"]))


def twin_dual(spark, sf_dir: str, reps: int = 2) -> dict[str, float]:
    import duckdb

    con = duckdb.connect()
    p = os.path.join(sf_dir, "documents.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')"
    )
    # the warm pass doubles as the provenance gate: the twin ratio is
    # meaningless unless both engines computed the SAME thing — assert
    # bit-equality of (count, sum) on the full scaled corpus before
    # timing a single rep
    s_res = twin_spark(spark, sf_dir)
    d_res = tuple(int(x) for x in con.execute(_TWIN_DUCKDB).fetchall()[0])
    if s_res != d_res:
        raise AssertionError(
            f"substrate twin diverged: spark={s_res} duckdb={d_res} — "
            f"the timing ratio would compare different computations"
        )
    st, dt = [], []
    for _ in range(reps):
        t0 = time.time()
        twin_spark(spark, sf_dir)
        st.append(time.time() - t0)
        t0 = time.time()
        con.execute(_TWIN_DUCKDB).fetchall()
        dt.append(time.time() - t0)
    con.close()
    return {"twin_spark": round(min(st), 3), "twin_duckdb": round(min(dt), 3)}


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [30, 100]
    out: dict[str, float] = {}
    ratios: dict[str, float] = {}
    for k in ks:
        # fresh JVM per K (the bench_settle provenance rule)
        spark = build_spark(
            app_name=f"dsir_probe_k{k}", cores=default_parallelism()
        )
        scaled = build_scaled_dir(spark, k)
        try:
            r = ext_dual_at_scale(
                spark, scaled, names=["dsir_importance_weights"]
            )
            t = twin_dual(spark, scaled)
        finally:
            shutil.rmtree(scaled, ignore_errors=True)
            spark.stop()
        s = r["ext_dsir_importance_weights_spark"]
        d = r["ext_dsir_importance_weights_duckdb"]
        out[f"dsir_spark_k{k}"] = s
        out[f"dsir_duckdb_k{k}"] = d
        out[f"twin_spark_k{k}"] = t["twin_spark"]
        out[f"twin_duckdb_k{k}"] = t["twin_duckdb"]
        ratios[f"dsir_k{k}"] = round(s / d, 2)
        ratios[f"twin_k{k}"] = round(t["twin_spark"] / t["twin_duckdb"], 2)
    print(
        json.dumps(
            {"metric": "dsir_probe", "corpus_k": ks, "timings": out,
             "ratios": ratios}
        )
    )


if __name__ == "__main__":
    main()
