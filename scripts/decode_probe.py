"""Decode-substrate decomposition for W2/W3 (the r06 settle's evidence;
BASELINE.md "r06 settle OF RECORD").

Times a PURE parquet decode + trivial aggregate — no predicate, no
grouping, nothing a planner can do differently — in both engines on
identical 5e8-row files, next to the W2 filter shape. If the pure
decode ratio is at or above the W2/W3 settle ratios, the scan-shape gap
is the columnar-decode substrate (JVM vectorized reader vs native
SIMD), not plan quality. r06 measurement (min-of-3, idle):
decode_sum 2.73x vs W2 2.05x — the shapes run BELOW the substrate.

    python scripts/decode_probe.py          # 5e8 rows
    SPARK_GRAFT_PROBE_ROWS=50000000 python scripts/decode_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_PROBE_ROWS", "500000000"))
    spark = build_spark(app_name="decode_probe", cores=default_parallelism())
    tmp = tempfile.mkdtemp(prefix="decode_probe_")
    try:
        spark.range(n).select(
            F.col("id").cast("int").alias("f1"), (F.col("id") * 10).alias("f2")
        ).write.mode("overwrite").parquet(f"{tmp}/test")
        t = spark.read.parquet(f"{tmp}/test")

        def s_decode():
            t.agg(F.sum("f2"), F.sum(F.col("f1").cast("long"))).collect()

        def s_w2():
            t.filter(F.col("f2") % 1000 == 0).agg(F.count(F.lit(1))).collect()

        import duckdb

        con = duckdb.connect()
        g = f"{tmp}/test/*.parquet"

        def d_decode():
            con.execute(
                f"SELECT sum(f2), sum(cast(f1 as bigint)) FROM '{g}'"
            ).fetchall()

        def d_w2():
            con.execute(
                f"SELECT count(*) FROM '{g}' WHERE f2 % 1000 = 0"
            ).fetchall()

        out = {"rows": n}
        for name, s_fn, d_fn in [
            ("decode_sum", s_decode, d_decode),
            ("w2_filter", s_w2, d_w2),
        ]:
            s_fn(), d_fn()  # warm
            st, dt = [], []
            for _ in range(3):
                t0 = time.time()
                s_fn()
                st.append(time.time() - t0)
                t0 = time.time()
                d_fn()
                dt.append(time.time() - t0)
            out[f"{name}_spark"] = round(min(st), 3)
            out[f"{name}_duckdb"] = round(min(dt), 3)
            out[f"{name}_ratio"] = round(min(st) / min(dt), 2)
        con.close()
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
