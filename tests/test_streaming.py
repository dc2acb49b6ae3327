"""Structured Streaming slice: windows, late data, foreachBatch MERGE."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from agrobr_spark.store import IndicadoresStore
from agrobr_spark.streaming import (
    read_events_stream,
    run_available_now,
    sliding_window_counts,
    stream_upsert_indicadores,
)
from tests.conftest import SF_SMOKE


def test_sliding_windows_overlap(spark):
    events = read_events_stream(spark, SF_SMOKE)
    out = run_available_now(
        sliding_window_counts(events, "1 hour", "30 minutes"), "t_sliding"
    )
    rows = out.collect()
    assert len(rows) > 0
    # every event lands in exactly 2 overlapping windows:
    # sum of per-window counts == 2 * event count
    total = sum(r["n"] for r in rows)
    batch_n = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert total == 2 * batch_n


def test_foreachbatch_merge_idempotent(spark, tmp_path):
    store = IndicadoresStore(spark, str(tmp_path / "ind"))
    events = read_events_stream(spark, SF_SMOKE)
    stream_upsert_indicadores(events, store)
    n1 = store.table.read().count()
    assert n1 > 0
    # PK = (produto=event_type, praca NULL, data, fonte): one row per
    # event_type/day
    per_key = (
        store.table.read()
        .groupBy("produto", "data")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert per_key == 0
    # replay the whole stream from scratch -> converges, no duplicates
    events2 = read_events_stream(spark, SF_SMOKE)
    stream_upsert_indicadores(events2, store)
    assert store.table.read().count() == n1
