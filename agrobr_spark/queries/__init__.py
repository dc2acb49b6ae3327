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


def _verification_history() -> dict[str, tuple[int, int]]:
    """Per query: (last round with a fully-green driver row, count of
    green rounds), from the recorded ``CORRECTNESS_r*.json`` files.

    Drives the driver-window rotation automatically (no hand-kept
    list): the round driver hash-checks the FIRST ~50 catalog entries,
    so queries that were never green — new, changed-and-failed, or
    rows-only — sort first, then the least-recently-verified, and the
    freshest greens rotate out. Every query keeps a green row within
    any two consecutive rounds, and anything unverified re-enters the
    window immediately.
    """
    import json
    import re as _re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    hist: dict[str, tuple[int, int]] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(f.read_text())
        except (OSError, json.JSONDecodeError):  # pragma: no cover
            continue
        for name, row in data.items():
            if isinstance(row, dict) and all(
                row.get(k) for k in ("rows_match", "schema_match", "hash_match")
            ):
                last, count = hist.get(name, (-1, 0))
                hist[name] = (max(last, rnd), count + 1)
    return hist


def catalog() -> dict[str, CatalogEntry]:
    """All registered queries (imports every query module on first
    use), ordered least-recently-driver-verified first (see
    ``_verification_history``) so the driver's ~50-entry check window
    rotates over the whole catalog; all queries stay oracle-checked
    locally every run by ``tests/test_oracle.py`` regardless of
    order."""
    from agrobr_spark.queries import (  # noqa: F401
        admission,
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
        training_prep,
        validation_ops,
        vocab,
    )

    ordered = rotation_order(list(_REGISTRY), _verification_history())
    return {n: _REGISTRY[n] for n in ordered}


def rotation_order(
    names: list[str], hist: dict[str, tuple[int, int]]
) -> list[str]:
    """Driver-window rotation order: strictly oldest-driver-green
    first (never-green queries sort as round -1, i.e. first), name as
    the only tiebreaker. Pure function so the coverage guarantee is
    unit-testable: for a static N-query catalog and a W-slot window,
    every query is checked within ceil(N/W) rounds, because a checked
    query's last-green round strictly exceeds every unchecked one's
    and it rotates to the back (see
    ``tests/test_catalog.py::test_rotation_covers_catalog``)."""
    return sorted(names, key=lambda n: (hist.get(n, (-1, 0))[0], n))


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in catalog().items() if e.oracle is not None}
