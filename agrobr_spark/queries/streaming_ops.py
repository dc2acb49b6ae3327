"""Streaming operators as catalog queries (SURVEY §2.12).

The streaming query runs to completion over all available input
(Trigger.AvailableNow → memory sink) and the finished result is
compared against the equivalent batch SQL — proving the watermarked
windowed aggregation computes exactly the batch semantics when all
data has arrived.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.queries import register
from agrobr_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
    tumbling_daily_agg,
)

_COUNTER = [0]


@register(
    "stream_tumbling_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS data,
           event_type,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,4))) AS soma_valor,
           min(value) AS valor_min,
           max(value) AS valor_max
    FROM events
    GROUP BY 1, 2
    """,
    tags=("STREAM", "A4"),
)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling 1-day window aggregation, run as a real
    Structured Streaming query (file micro-batches → memory sink)."""
    _COUNTER[0] += 1
    name = f"stream_tumbling_daily_{_COUNTER[0]}"
    events = read_events_stream(spark, sf_dir)
    return run_available_now(tumbling_daily_agg(events), name)
