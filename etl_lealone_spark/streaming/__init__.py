"""Structured Streaming carriers (SURVEY.md §2.12).

The reference has no stream processing; these are the engine's extension
surface for incremental pipelines (BASELINE.json): streaming ingest with
watermarked windowed aggregation, streaming exact dedup, and a stateful
sessionizer.
"""

from .ann_maintenance import StreamingIvfMaintainer
from .incremental_dedup import IncrementalDeduper
from .ingest import (
    enrich_stream,
    join_streams_interval,
    running_user_totals,
    sessionize_stream,
    streaming_dedup,
    streaming_sliding_agg,
    streaming_tumbling_agg,
    stream_from_parquet_dir,
    upsert_sink,
)

__all__ = [
    "IncrementalDeduper",
    "StreamingIvfMaintainer",
    "enrich_stream",
    "join_streams_interval",
    "running_user_totals",
    "stream_from_parquet_dir",
    "streaming_sliding_agg",
    "streaming_tumbling_agg",
    "streaming_dedup",
    "sessionize_stream",
    "upsert_sink",
]
