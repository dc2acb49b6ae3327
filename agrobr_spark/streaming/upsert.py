"""foreachBatch MERGE: idempotent late-arrival upsert into the store.

Reference behavior: poll the recent window, dedup-upsert by PK
(agrobr/cepea/api.py:119-187 + duckdb_store.py:92-102). Streaming-
native: every micro-batch MERGEs into the indicadores table — a late
or replayed row overwrites by PK instead of duplicating, which makes
the pipeline exactly-once *effectively* (idempotent sink) even under
at-least-once delivery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from agrobr_spark.store.indicadores import SCHEMA, IndicadoresStore
from agrobr_spark.streaming.windows import drain_or_raise


def stream_upsert_indicadores(
    events: DataFrame, store: IndicadoresStore, timeout_s: int = 120
):
    """Map an events stream into indicador rows and MERGE each
    micro-batch. Returns the finished StreamingQuery."""

    def to_indicadores(batch: DataFrame) -> DataFrame:
        return batch.select(
            F.col("event_type").alias("produto"),
            F.lit(None).cast("string").alias("praca"),
            F.col("ts").cast("date").alias("data"),
            F.lit("events").alias("fonte"),
            F.col("value").cast("decimal(18,4)").alias("valor"),
            F.lit(None).cast("double").alias("variacao"),
            F.lit(None).cast("string").alias("unidade"),
            F.col("ts").alias("collected_at"),
        ).select(*SCHEMA.fieldNames())

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        # aggregate within the batch to one row per PK (last by ts),
        # then MERGE — replays of the same data converge to one state
        rows = (
            to_indicadores(batch)
            .groupBy("produto", "praca", "data", "fonte")
            .agg(
                F.max_by("valor", "collected_at").alias("valor"),
                F.first("variacao").alias("variacao"),
                F.first("unidade").alias("unidade"),
                F.max("collected_at").alias("collected_at"),
            )
        )
        store.upsert(rows)

    q = (
        events.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    drain_or_raise(q, "stream_upsert_indicadores", timeout_s)
    return q
