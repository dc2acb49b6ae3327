"""Table loading helpers for the driver-provided parquet test tables.

Single place that knows the sf-dir layout (TESTDATA.md): one parquet
file per table. At cluster scale these become partitioned table reads;
the call sites stay identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Column pruning / predicate pushdown are
    left to Catalyst — callers express filters declaratively.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (older
    fixtures) and TIMESTAMP(MICROS) without timezone (current). Spark 4
    rejects nanos ([PARQUET_TYPE_ILLEGAL]) unless read as raw longs, and
    reads tz-less micros as TIMESTAMP_NTZ. Both are normalized here to a
    plain TIMESTAMP carrying the file's wall clock as a UTC instant, so
    every downstream epoch extraction (``unix_micros``) matches DuckDB's
    ``epoch_ns(ts) // 1000`` on the same file regardless of the session
    timezone.
    """
    if name == "events":
        # Scope the legacy-conf flip to this read (it is only consulted
        # at analysis time of the scan) so a session-wide side effect
        # doesn't leak into unrelated parquet reads.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return _normalize_events_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` (raw nanos bigint or TIMESTAMP_NTZ micros) to a
    TIMESTAMP whose epoch-µs equal the file's wall clock taken as UTC —
    session-timezone-independent (``timestampdiff`` on NTZ is pure
    wall-clock arithmetic, no tz conversion)."""
    kind = dict(df.dtypes).get("ts")
    if kind == "bigint":
        # floor-divide nanos → micros: Spark's native timestamp
        # resolution. DuckDB oracles must do epoch_ns(ts) // 1000
        # when they compare or emit raw ts (see w7_sessionize).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif kind == "timestamp_ntz":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            ),
        )
    return df


def table_cache_key(sf_dir: str, name: str) -> tuple:
    """Cache key for per-fixture-dir scalar caches (corpus counts,
    split params): (dir, table, mtime) so a fixture dir REWRITTEN
    mid-session invalidates the cached scalar instead of serving a
    stale value. mtime is None for non-local paths (object stores) —
    there the run-per-process model is the freshness guarantee."""
    import os

    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.path.getmtime(p)
    except OSError:
        mtime = None
    return (sf_dir, name, mtime)
