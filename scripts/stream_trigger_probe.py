"""Decompose a streaming workload's wall into per-trigger engine phases
(r13, guide §1): re-runs one stream workload's exact drain but records
``query.recentProgress`` — durationMs per micro-batch broken into
addBatch / getBatch / latestOffset / queryPlanning / triggerExecution /
walCommit / commitOffsets — so per-trigger fixed cost is attributed to
a phase instead of guessed at.

    python scripts/stream_trigger_probe.py [tumbling|interval|stateful]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_lealone_spark.session import build_spark, default_parallelism  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "tumbling"
    spark = build_spark(app_name="stream_probe", cores=default_parallelism())
    from etl_lealone_spark.workloads.analytics_q import (
        _ckpt_tmp,
        _ensure_stream_feed,
        _flush_sentinel,
        _stream_bucket_files,
    )
    from etl_lealone_spark.streaming.ingest import (
        join_streams_interval,
        running_user_totals,
        stream_from_parquet_dir,
        streaming_tumbling_agg,
    )

    if which == "tumbling":
        def build(ev, d):
            _stream_bucket_files(ev, [(d + "/s", None)], tail=_flush_sentinel(ev))

        feed = _ensure_stream_feed(spark, SF_DIR, "tumb", build)
        sdf = streaming_tumbling_agg(stream_from_parquet_dir(spark, feed + "/s"))
        state_partitions = 4
    elif which == "interval":
        def build(ev, d):
            _stream_bucket_files(
                ev,
                [
                    (os.path.join(d, "l"), F.col("event_type") == "click"),
                    (os.path.join(d, "r"), F.col("event_type") == "purchase"),
                ],
            )

        feed = _ensure_stream_feed(spark, SF_DIR, "sij", build)
        sdf = join_streams_interval(
            stream_from_parquet_dir(spark, os.path.join(feed, "l")),
            stream_from_parquet_dir(spark, os.path.join(feed, "r")),
            key="user_id",
            within="4 hours",
            watermark="1 day",
        )
        state_partitions = 4
    else:
        def build(ev, d):
            _stream_bucket_files(ev, [(d + "/s", None)])

        feed = _ensure_stream_feed(spark, SF_DIR, "stot", build)
        sdf = running_user_totals(stream_from_parquet_dir(spark, feed + "/s"))
        state_partitions = 8

    tmp = _ckpt_tmp("probe_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    prev_ndmb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        t0 = time.time()
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"probe_{os.getpid()}")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        wall = time.time() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
        print(f"\n== {which}: wall={wall:.3f}s, {len(prog)} progress events")
        keys = [
            "addBatch",
            "getBatch",
            "latestOffset",
            "queryPlanning",
            "triggerExecution",
            "walCommit",
            "commitOffsets",
        ]
        tot: dict[str, int] = {}
        for p in prog:
            d = p.get("durationMs", {})
            row = {k: d.get(k, 0) for k in keys}
            for k, v in row.items():
                tot[k] = tot.get(k, 0) + v
            print(
                f"batch {p.get('batchId')}: rows_in={p.get('numInputRows')} "
                + " ".join(f"{k}={row[k]}" for k in keys)
            )
        print("TOTAL ms:", tot)
        # state operator metrics from the last progress
        if prog:
            for op in prog[-1].get("stateOperators", []):
                print(
                    "state op:",
                    op.get("operatorName"),
                    "commitTimeMs(last batch)=",
                    op.get("allUpdatesTimeMs"),
                    op.get("commitTimeMs"),
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndmb)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
