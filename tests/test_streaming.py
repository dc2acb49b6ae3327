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


def test_stateful_day_over_day_matches_batch(spark, tmp_path):
    """applyInPandasWithState flags must equal the batch lag-window
    result once all data has arrived — state carries across the two
    micro-batches the split input forces."""
    from agrobr_spark.io import load
    from agrobr_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
        day_over_day_flags,
        day_over_day_flags_batch,
    )
    from agrobr_spark.streaming.windows import run_available_now

    events = load(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    cut = events.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    src = str(tmp_path / "events_split")
    events.filter(F.col("ts") <= cut).coalesce(1).write.parquet(f"{src}/b=1")
    events.filter(F.col("ts") > cut).coalesce(1).write.parquet(f"{src}/b=2")

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b=*")
    )
    got = run_available_now(day_over_day_flags(stream), "t_stateful", mode="append")
    want = day_over_day_flags_batch(events)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.schema == OUTPUT_SCHEMA


def test_salted_join_matches_plain(spark):
    """Skew-salted join must be result-identical to the plain join."""
    from agrobr_spark.io import load
    from agrobr_spark.operators.skew import salted_join

    o = load(spark, SF_SMOKE, "orders")
    c = load(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_nationkey"
    )
    plain = o.join(c, ["o_custkey"], "left").select("o_orderkey", "c_name")
    salted = salted_join(o, c, ["o_custkey"], "left", salt=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_session_window_matches_batch_sessionize(spark):
    """Streaming session_window must produce the same (user, session)
    partitioning as the batch lag-gap sessionization once all data has
    arrived: same session count and same per-session event totals."""
    from agrobr_spark.queries import catalog
    from agrobr_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        session_window_counts,
    )

    events = read_events_stream(spark, SF_SMOKE).select("user_id", "ts", "event_id")
    got = run_available_now(
        session_window_counts(events, "30 minutes"), "t_session"
    )
    want = catalog()["w7_sessionize"].fn(spark, SF_SMOKE)
    g = sorted((r["user_id"], r["eventos"]) for r in got.collect())
    w = sorted((r["user_id"], r["eventos"]) for r in want.collect())
    assert g == w


def test_watermark_drops_too_late_event(spark, tmp_path):
    """Negative late-data proof: an event arriving in a later
    micro-batch with an event time older than the watermark must be
    DROPPED from the windowed aggregation (r3 advice #6 — prior tests
    only proved completeness on fully-arrived data).

    Watermark mechanics pinned by this test: the late-row filter uses
    the watermark as of the END of the PREVIOUS batch, so the late
    event must arrive ≥2 batches after the data that advanced the
    watermark past it. Batch 1 (03-01, 03-03 events) advances the
    watermark to 03-02 02:00; batch 2 keeps the stream moving; batch 3
    delivers an event weeks below the watermark (02-20) alongside an
    on-time one. Spark must drop the 02-20 row — its window never
    appears — while the finalized 03-01 window counts only its two
    on-time events.
    """
    import os

    from agrobr_spark.streaming.windows import run_available_now, tumbling_daily_agg

    d = dt.datetime
    batches = [
        [
            (1, d(2024, 3, 1, 10, 0), "venda", 10.0),
            (2, d(2024, 3, 1, 11, 0), "venda", 20.0),
            (3, d(2024, 3, 3, 2, 0), "venda", 30.0),  # watermark → 03-02 02:00
        ],
        [(4, d(2024, 3, 5, 12, 0), "venda", 40.0)],  # on time
        [
            (5, d(2024, 2, 20, 12, 0), "venda", 99.0),  # weeks late: dropped
            (6, d(2024, 3, 6, 12, 0), "venda", 50.0),  # on time
        ],
    ]
    src = str(tmp_path / "late_events")
    schema = "event_id long, ts timestamp, event_type string, value double"
    for i, rows in enumerate(batches, 1):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/b={i}")
        # file-source batch order follows modification time: pin it
        t = 1_700_000_000 + i * 1000
        for f in os.listdir(f"{src}/b={i}"):
            os.utime(f"{src}/b={i}/{f}", (t, t))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b=*")
    )
    out = run_available_now(
        tumbling_daily_agg(stream, watermark="1 day"),
        "t_late_drop",
        mode="append",
    )
    rows = {r["data"]: r for r in out.collect()}
    # the too-late event's window must never materialize
    assert dt.date(2024, 2, 20) not in rows
    # 03-01 window finalized with only its on-time events
    assert rows[dt.date(2024, 3, 1)]["n"] == 2
    assert rows[dt.date(2024, 3, 1)]["soma_valor"] == 30.0
    assert rows[dt.date(2024, 3, 3)]["n"] == 1
    # trailing windows not finalized in append mode (nothing beyond them)
    assert dt.date(2024, 3, 5) not in rows
    assert dt.date(2024, 3, 6) not in rows


def test_stream_upsert_merge_converges_across_batches(spark, tmp_path):
    """The foreachBatch MERGE catalog query must reach the same final
    state regardless of how the input splits into micro-batches —
    split the events into two files and compare against the single-file
    fixture result."""
    import os

    from agrobr_spark.io import load
    from agrobr_spark.queries import catalog

    fn = catalog()["stream_upsert_merge"].fn
    single = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}

    events = load(spark, SF_SMOKE, "events")
    cut = events.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    src = str(tmp_path / "events_2b")
    events.filter(F.col("event_id") <= cut).coalesce(1).write.parquet(
        f"{src}/events.parquet/b=1"
    )
    events.filter(F.col("event_id") > cut).coalesce(1).write.parquet(
        f"{src}/events.parquet/b=2"
    )
    for i, b in enumerate(("b=1", "b=2")):
        t = 1_700_000_000 + i * 1000
        for f in os.listdir(f"{src}/events.parquet/{b}"):
            os.utime(f"{src}/events.parquet/{b}/{f}", (t, t))
    double = {tuple(r) for r in fn(spark, src).collect()}
    assert double == single


def test_stream_admit_replay_converges(spark):
    """Replay proof for the streaming admission sink: running the
    whole streamed admission twice over the same fixture produces the
    IDENTICAL survivor store state both times (at-least-once delivery
    → effectively-exactly-once through the idempotent admit_frame
    MERGE: a re-delivered doc meets itself in the index and is flagged
    duplicado_corpus instead of being double-admitted)."""
    from agrobr_spark.queries.streaming_ops import stream_admit_batch
    from tests.conftest import SF_SMOKE

    first = {
        (r["doc_id"], r["n_chars"], r["bloco"])
        for r in stream_admit_batch(spark, SF_SMOKE).collect()
    }
    second = {
        (r["doc_id"], r["n_chars"], r["bloco"])
        for r in stream_admit_batch(spark, SF_SMOKE).collect()
    }
    assert first and first == second


def test_stream_dedup_replay_emits_no_duplicate_keys(spark, tmp_path):
    """Feeding the SAME events file twice through 1-file micro-batches
    must emit each (user, type, day) key exactly once: in-horizon
    replays are suppressed by dedup state, out-of-horizon replays by
    the watermark drop — either way the key set equals one copy's
    DISTINCT."""
    import shutil

    import pyspark.sql.functions as F

    from agrobr_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
    )

    src = f"{SF_SMOKE}/events.parquet"
    ingest = tmp_path / "events.parquet"
    ingest.mkdir()
    shutil.copyfile(src, ingest / "copy_a.parquet")
    shutil.copyfile(src, ingest / "copy_b.parquet")

    events = read_events_stream(spark, str(tmp_path), max_files_per_trigger=1)
    dedup = (
        events.withWatermark("ts", "1 day")
        .withColumn("data", F.col("ts").cast("date"))
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "data"])
        .select("user_id", "event_type", "data")
    )
    got = [
        (r["user_id"], r["event_type"], r["data"])
        for r in run_available_now(dedup, "t_dedup_replay", mode="append").collect()
    ]
    assert len(got) == len(set(got)), "replay must not re-emit a key"

    from agrobr_spark.io import load

    want = {
        (r["user_id"], r["event_type"], r["data"])
        for r in load(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", F.col("ts").cast("date").alias("data"))
        .distinct()
        .collect()
    }
    assert set(got) == want


def test_stream_divergence_flags_planted_drifted_batch(spark, tmp_path):
    """The streaming KL monitor must rank a planted jargon-flooded
    micro-batch far above healthy batches speaking the corpus
    language — the broken-scraper alert."""
    import pyspark.sql.functions as F

    from agrobr_spark.queries import catalog as _cat
    from agrobr_spark.queries.admission import _SPLIT_CACHE

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(94):  # historical corpus + two healthy batches
        rows.append((i, base, "pt", "web", len(base)))
    for i in range(94, 100):  # the last id-range chunk: pure jargon
        rows.append((i, "jargao quebrado " * 4, "pt", "forum", 60))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    # _split_params also profiles embeddings for the admission cut
    spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    _SPLIT_CACHE.clear()

    out = sorted(
        _cat()["stream_source_divergence"].fn(spark, str(tmp_path)).collect(),
        key=lambda r: r["lote_inicio"],
    )
    # cut = 80, span = (99 - 80 + 3) // 3 = 7 -> batches at 80, 87, 94
    assert [r["lote_inicio"] for r in out] == [80, 87, 94]
    healthy = [r["kl_bits"] for r in out[:2]]
    drifted = out[2]["kl_bits"]
    assert all(h < 0.1 for h in healthy), healthy  # matches the blend
    assert drifted > max(healthy) + 1.0, (drifted, healthy)
    _SPLIT_CACHE.clear()


def test_stream_stream_join_batch_split_invariant(spark, tmp_path):
    """stream_stream_join semantics under forced multi-batch arrival:
    splitting the two sides into 1-file micro-batches (views and
    purchases arriving interleaved) must emit exactly the batch
    join's pair set — the watermark + interval condition bounds state
    without dropping any in-horizon pair."""
    import pyspark.sql.functions as F

    from agrobr_spark.io import load
    from agrobr_spark.streaming.windows import run_available_now
    from tests.conftest import SF_SMOKE

    events = load(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    cut = events.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    src = str(tmp_path / "ev_split")
    events.filter(F.col("ts") <= cut).coalesce(1).write.parquet(f"{src}/b=1")
    events.filter(F.col("ts") > cut).coalesce(1).write.parquet(f"{src}/b=2")

    def reader():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b=*")
        )

    views = (
        reader()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        reader()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("view_id", "purchase_id")
    got = run_available_now(joined, "t_ssj_split", mode="append")

    v = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("vt"))
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pt"))
    want = v.join(
        p,
        (F.col("vu") == F.col("pu"))
        & (F.col("pt") >= F.col("vt"))
        & (F.col("pt") <= F.col("vt") + F.expr("INTERVAL 1 HOUR")),
    ).select("view_id", "purchase_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_drain_timeout_raises_not_partial(spark):
    """A drain that exceeds its budget must raise StreamDrainTimeout
    (naming the entry), never silently stop and let the caller read a
    partially-folded store (r10 ADVICE). Exercised two ways: the
    helper's contract against a stalled-query double, and a real
    AvailableNow stream whose foreachBatch outlives a 1 s budget."""
    import time

    import pytest

    from agrobr_spark.streaming.windows import (
        StreamDrainTimeout,
        drain_or_raise,
    )

    class _StalledQuery:
        def __init__(self):
            self.stopped = False
            self.isActive = True

        def awaitTermination(self, timeout_s):
            return False

        def stop(self):
            self.stopped = True
            self.isActive = False

    q = _StalledQuery()
    with pytest.raises(StreamDrainTimeout, match="my_entry.*1s"):
        drain_or_raise(q, "my_entry", 1)
    assert q.stopped  # no orphan micro-batches after the raise

    # real stream: handler sleeps past the budget → raise, and the
    # sink table the handler would have filled stays unread
    events = read_events_stream(spark, SF_SMOKE)

    def slow_handle(batch, batch_id):
        time.sleep(5)

    sq = (
        events.writeStream.foreachBatch(slow_handle)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamDrainTimeout, match="slow_entry"):
        drain_or_raise(sq, "slow_entry", 1)
    assert not sq.isActive
