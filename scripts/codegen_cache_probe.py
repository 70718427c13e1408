"""Probe: does codegen-class-cache eviction explain the in-suite vs
isolated-warm gap? (r13, guide §1)

Methodology mimic of bench.py: warm N queries once each, THEN time each
once in the same order — the warm→timed distance is N-1 queries, so a
codegen cache smaller than the suite's generated-class count forces
every timed run to re-generate + re-JIT its whole-stage classes.

    python scripts/codegen_cache_probe.py <maxEntries> name [name ...]

Prints per-query one-shot timings under the given
spark.sql.codegen.cache.maxEntries.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, ".")

from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402
from etl_lealone_spark.workloads import all_workloads  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    max_entries = sys.argv[1]
    names = sys.argv[2:]
    spark = build_spark(
        app_name=f"codegen_probe_{max_entries}",
        cores=default_parallelism(),
        extra_conf={"spark.sql.codegen.cache.maxEntries": max_entries},
    )
    wl = all_workloads()
    from etl_lealone_spark.tables import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).count()
    # warm pass (bench.py methodology)
    for name in names:
        wl[name].build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    try:
        spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception:
        pass
    # timed pass, one shot each, same isolation as bench.py
    out: dict[str, float] = {}
    for name in names:
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        t0 = time.time()
        wl[name].build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        if name.startswith("stream_") or name.startswith("scd2_"):
            try:
                spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
            except Exception:
                pass
    print(json.dumps({"maxEntries": max_entries, "timings": out, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
