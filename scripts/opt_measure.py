"""Optimization-round measurement harness (guide §1).

Times individual headline workloads in isolation with the noop sink and
captures their formatted physical plans to plans/r12/<name>_<tag>.txt.

    python scripts/opt_measure.py before [sf_dir] name [name ...]
    python scripts/opt_measure.py after  [sf_dir] name [name ...]

Each query: one untimed warm run (codegen/JIT/footer caches), then 3
timed noop-sink runs, min reported. Plans are captured from the UNRUN
DataFrame (initial AQE plan) plus Exchange count and pushed filters.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, ".")

from etl_lealone_spark.plans import count_exchanges, explain_str  # noqa: E402
from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402
from etl_lealone_spark.workloads import all_workloads  # noqa: E402

PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("OPT_ROUND", "r13"),
)


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = build_spark(app_name="opt_measure", cores=default_parallelism())
    wl = all_workloads()
    from etl_lealone_spark.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    out: dict[str, float] = {}
    for name in names:
        w = wl[name]
        spark.sparkContext.setJobDescription(f"{tag}:{name}")
        df = w.build(spark, sf_dir)
        plan = explain_str(df, "formatted")
        nex = count_exchanges(df)
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(f"-- {name} ({tag}) @ {sf_dir}  exchanges={nex}\n")
            f.write(plan)
        # warm (build a FRESH df per run: reusing one replays AQE stages)
        w.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        if name.startswith("stream_") or name.startswith("scd2_"):
            try:
                spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
            except Exception:
                pass
        ts = []
        for _ in range(3):
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            t0 = time.time()
            w.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
            if name.startswith("stream_") or name.startswith("scd2_"):
                try:
                    spark.sparkContext._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
                except Exception:
                    pass
        out[name] = round(min(ts), 3)
        print(f"{name}: min={min(ts):.3f} runs={[round(t,3) for t in ts]} exchanges={nex}", flush=True)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "timings": out}))


if __name__ == "__main__":
    main()
