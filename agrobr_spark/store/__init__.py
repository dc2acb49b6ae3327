"""Storage layer: partitioned-parquet tables with MERGE-upsert, TTL
cache policies, append-only history, and deterministic snapshots
(SURVEY §2.9 M1-M6, §2.11 D4).

The reference embeds DuckDB (agrobr/cache/duckdb_store.py); the
Spark-native store is a directory of partitioned parquet plus
set-oriented MERGE rewrites. Delta Lake would supply `MERGE INTO`
natively — this implementation keeps the same logical plan (staging ∪
target → row_number precedence → dynamic partition overwrite) with no
extra dependency, and only rewrites partitions the staging batch
touches.
"""

from agrobr_spark.store.table import ParquetStore
from agrobr_spark.store.indicadores import IndicadoresStore
from agrobr_spark.store.history import HistoryStore, business_day_gaps
from agrobr_spark.store.policies import ExpiryPolicy, POLICIES, next_expiry
from agrobr_spark.store.snapshot import snapshot_filter, with_snapshot

__all__ = [
    "ParquetStore",
    "IndicadoresStore",
    "HistoryStore",
    "business_day_gaps",
    "ExpiryPolicy",
    "POLICIES",
    "next_expiry",
    "snapshot_filter",
    "with_snapshot",
]
