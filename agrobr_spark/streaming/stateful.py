"""Stateful streaming: day-over-day change flags via
``applyInPandasWithState``.

Reference behavior being upgraded: agrobr/validators/sanity.py:161-180
and semantic.py:144-181 — batch-sorted previous-value comparison
(pct_change > threshold ⇒ anomaly). In a stream there is no ``lag``
window; the previous value per product is explicit keyed state that
survives across micro-batches (SURVEY §2.12).

Scale posture: state is one float per key (bounded by key cardinality,
not stream length); rows move through Arrow batches, not Python rows;
the shuffle is the same single hash exchange a batch lag-window needs.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("valor_anterior", T.DoubleType()),
        T.StructField("variacao_pct", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_value", T.DoubleType())])


def _make_flagger(threshold_pct: float):
    def flag(key, pdfs, state: GroupState):
        (event_type,) = key
        last = state.get[0] if state.exists else None
        # vectorized: previous non-null value = shift(1) over the
        # null-dropped sorted batch, with keyed state seeding row 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = (
            pdf[pdf["value"].notna()]
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        if len(pdf):
            prev = pdf["value"].shift(1)
            if last is not None:
                prev.iloc[0] = last
            pct = (pdf["value"] / prev - 1.0) * 100.0
            mask = prev.notna() & (prev != 0) & (pct.abs() > threshold_pct)
            out = pdf.loc[mask, ["event_id", "ts", "value"]].copy()
            out.insert(0, "event_type", event_type)
            out["valor_anterior"] = prev[mask]
            out["variacao_pct"] = pct[mask]
            state.update((float(pdf["value"].iloc[-1]),))
            if len(out):
                yield out
        else:
            state.update((last,))

    return flag


def day_over_day_flags(events: DataFrame, threshold_pct: float = 20.0) -> DataFrame:
    """Per event_type, flag events whose value changed more than
    ``threshold_pct`` vs the previous event of that type. Works on a
    streaming DataFrame; previous-value state persists across
    micro-batches."""
    return events.groupBy("event_type").applyInPandasWithState(
        _make_flagger(threshold_pct),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def day_over_day_flags_batch(
    events: DataFrame, threshold_pct: float = 20.0
) -> DataFrame:
    """Batch equivalent (lag window) — the cross-check oracle for the
    stateful stream: on fully-arrived data both must agree exactly."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pct = (F.col("value") / F.col("valor_anterior") - 1.0) * 100.0
    return (
        events.filter(F.col("value").isNotNull())
        .withColumn("valor_anterior", F.lag("value").over(w))
        .withColumn("variacao_pct", pct)
        .filter(
            F.col("valor_anterior").isNotNull()
            & (F.col("valor_anterior") != 0)
            & (F.abs(F.col("variacao_pct")) > threshold_pct)
        )
        .select(
            "event_type", "event_id", "ts", "value", "valor_anterior", "variacao_pct"
        )
    )
