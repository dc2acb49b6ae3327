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

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos and rebuild the
    timestamp at microsecond precision (Spark's native resolution).
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
        if dict(df.dtypes).get("ts") == "bigint":
            # floor-divide nanos → micros: Spark's native timestamp
            # resolution. DuckDB oracles must do epoch_ns(ts) // 1000
            # when they compare or emit raw ts (see w7_sessionize).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
