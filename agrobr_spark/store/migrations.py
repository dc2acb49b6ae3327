"""M6: versioned schema migrations for store tables.

Reference: agrobr/cache/migrations.py — versioned DDL applied on cache
open. Re-expressed for a parquet/Delta store: each migration is a
(version, transform) pair; the runner reads the table's current version
from its ``_store_meta.json`` sidecar, applies every pending transform
in order, and rewrites the table once.

Scale posture: migrations follow the type-widening contract guarantee
("int→float ok, float→int never, columns only added" —
SURVEY §1.1) so every transform is a projection (narrow, no shuffle);
the single rewrite is the unavoidable cost of physical schema change,
and on Delta the same transforms map to metadata-only ALTER TABLE.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame

from agrobr_spark.store.fs import read_text, write_text
from agrobr_spark.store.table import ParquetStore

Migration = tuple[int, str, Callable[[DataFrame], DataFrame]]

_META_FILE = "_store_meta.json"


def _meta_path(store: ParquetStore) -> str:
    return store.path.rstrip("/") + "/" + _META_FILE


def current_version(store: ParquetStore) -> int:
    """Version from the sidecar, 0 when absent/unreadable. Goes through
    the Hadoop FS API so the sidecar convention works on object
    stores, same as every other store maintenance path."""
    try:
        text = read_text(store.spark, _meta_path(store))
        if text is None:
            return 0
        return int(json.loads(text).get("schema_version", 0))
    except (ValueError, OSError):
        return 0


def _write_version(store: ParquetStore, version: int) -> None:
    write_text(
        store.spark, _meta_path(store), json.dumps({"schema_version": version})
    )


def migrate(store: ParquetStore, migrations: list[Migration]) -> int:
    """Apply every migration newer than the table's recorded version,
    in ascending version order, with one table rewrite at the end.
    Returns the resulting schema version. Idempotent: re-running with
    the same list is a no-op."""
    have = current_version(store)
    pending = sorted(
        (m for m in migrations if m[0] > have), key=lambda m: m[0]
    )
    if not pending:
        return have
    if not store.exists():
        _write_version(store, pending[-1][0])
        return pending[-1][0]
    df = store.read()
    for _version, _name, fn in pending:
        df = fn(df)
    store.rewrite(df)
    latest = pending[-1][0]
    _write_version(store, latest)
    return latest


def add_column(name: str, dtype: str) -> Callable[[DataFrame], DataFrame]:
    """Migration transform: add a nullable column (names only added —
    the contract evolution rule)."""
    import pyspark.sql.functions as F

    return lambda df: df.withColumn(name, F.lit(None).cast(dtype))


def widen_column(name: str, dtype: str) -> Callable[[DataFrame], DataFrame]:
    """Migration transform: widen a column's type (int→float class of
    changes only; narrowing violates the contract guarantee and should
    never be registered)."""
    import pyspark.sql.functions as F

    return lambda df: df.withColumn(name, F.col(name).cast(dtype))
