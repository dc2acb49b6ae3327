"""Query catalog: every implemented SURVEY §2 operator as a pair of

- a Spark DataFrame query ``(spark, sf_dir) -> DataFrame`` (the engine), and
- an equivalent ANSI SQL string for the DuckDB oracle (the spec).

The driver (and ``tests/test_oracle.py``) runs both sides on the same
parquet tables and compares row count + schema + order-insensitive
value hash, so every query here must be **deterministic across
engines**:

- per-row arithmetic on the same doubles is IEEE-identical → safe;
- order-dependent double aggregation (sum/avg) is NOT → aggregate in
  ``decimal(18,4)`` and cast the final value back to double;
- averages = ``cast(sum_dec as double) / cast(count as double)`` (both
  operands bit-identical → quotient bit-identical);
- window/top-k orderings always carry a unique tie-breaker key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver runs rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, CatalogEntry] = {}


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = CatalogEntry(name, fn, oracle, tags, doc or (fn.__doc__ or ""))
        return fn

    return deco


def catalog() -> dict[str, CatalogEntry]:
    """All registered queries (imports every query module on first use)."""
    from agrobr_spark.queries import (  # noqa: F401
        dedup,
        merge,
        normalize_ops,
        operator_ops,
        pipeline_text,
        relational,
        scalars,
        similarity,
        store_ops,
        streaming_ops,
        validation_ops,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in catalog().items() if e.oracle is not None}
