"""Structured Streaming slice (SURVEY §2.12).

The reference's closest behaviors (incremental poll + dedup-upsert,
daily bucket aggregation, publication-time expiry, day-over-day
alerting) re-expressed properly on Structured Streaming over the
``events`` table: watermarked tumbling/sliding windows, and
``foreachBatch`` MERGE for idempotent late-arrival upserts.
"""

from agrobr_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
    sliding_window_counts,
    tumbling_daily_agg,
)
from agrobr_spark.streaming.upsert import stream_upsert_indicadores

__all__ = [
    "read_events_stream",
    "run_available_now",
    "sliding_window_counts",
    "tumbling_daily_agg",
    "stream_upsert_indicadores",
]
