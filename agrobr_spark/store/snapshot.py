"""Deterministic snapshot mode (D4).

Reference: agrobr/datasets/deterministic.py:10-46 — a contextvar pins
``data <= snapshot`` and forces offline/cache-only reads so a pipeline
re-run reproduces byte-identical results.

Spark-native: the pin is a context-managed filter stage appended to
every dataset read (time-travel by predicate; with Delta this would
also pin a table version).
"""

from __future__ import annotations

import contextlib
import contextvars
import datetime as dt
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_snapshot: contextvars.ContextVar[dt.date | None] = contextvars.ContextVar(
    "agrobr_spark_snapshot", default=None
)


def current_snapshot() -> dt.date | None:
    return _snapshot.get()


@contextlib.contextmanager
def with_snapshot(snapshot: dt.date) -> Iterator[dt.date]:
    """Pin all dataset reads inside the block to ``data <= snapshot``."""
    token = _snapshot.set(snapshot)
    try:
        yield snapshot
    finally:
        _snapshot.reset(token)


def snapshot_filter(df: DataFrame, date_col: str = "data") -> DataFrame:
    """Apply the active snapshot pin (no-op when none is active)."""
    snap = _snapshot.get()
    if snap is None:
        return df
    return df.filter(F.col(date_col) <= F.lit(snap))
