"""Shared connector plumbing.

Each connector splits into two layers, Spark-first:

- ``*_columns(df)`` — a pure DataFrame→DataFrame transformation from
  the source's native column names/types to the contract shape. At
  100 TB this composes directly with a distributed scan
  (``spark.read.csv(dir).transform(exportacao_columns)``); every cast
  and rename is a Catalyst expression, no Python in the hot path.
- ``read_*(spark, payload)`` — a driver-side payload decoder for the
  small per-request API responses the reference fetches (one HTML
  page, one JSON body). Decode → rows → createDataFrame → the same
  ``*_columns`` transformation.
"""

from __future__ import annotations

import csv
import io
import unicodedata
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.normalize.encoding import decode_content


def csv_text_rows(
    text: str, sep: str | None = None
) -> tuple[list[str], list[list[str | None]]]:
    """Parse delimited text -> (header, rows), all strings; empty
    cells -> None (the reference's dtype=str regime)."""
    first = text.split("\n", 1)[0]
    if sep is None:
        sep = ";" if first.count(";") > first.count(",") else ","
    reader = csv.reader(io.StringIO(text), delimiter=sep)
    rows = [r for r in reader if any(c.strip() for c in r)]
    if not rows:
        return [], []
    header = [h.strip() for h in rows[0]]
    # Never truncate: gov CSVs with trailing separators or stray extra
    # cells yield data rows wider than the header — widen the header
    # with generated colN names (rows_df de-duplicates) so no cell is
    # silently dropped.
    width = max(len(header), max((len(r) for r in rows[1:]), default=0))
    header = header + [f"col{i}" for i in range(len(header), width)]
    data: list[list[str | None]] = []
    for r in rows[1:]:
        r = list(r) + [None] * (width - len(r))
        data.append([c.strip() if c is not None and c.strip() != "" else None for c in r])
    return header, data


def decode_csv(payload: bytes | str, declared: str | None = None) -> str:
    return payload if isinstance(payload, str) else decode_content(payload, declared)[0]


def rows_df(
    spark: SparkSession, header: list[str], rows: list[list]
) -> DataFrame:
    """All-string DataFrame from header+rows; blank/duplicate column
    names are made unique so downstream selects are unambiguous."""
    seen: dict[str, int] = {}
    cols = []
    for i, h in enumerate(header):
        name = h.strip() or f"col{i}"
        n = seen.get(name, 0)
        seen[name] = n + 1
        cols.append(name if n == 0 else f"{name}_{n}")
    schema = ", ".join(f"`{c}` string" for c in cols)
    data = [tuple(None if c is None else str(c) for c in r) for r in rows]
    return spark.createDataFrame(data, schema)


def rename_existing(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Apply only the renames whose source column exists (the
    reference's ``{k: v for k, v in MAP.items() if k in df.columns}``
    idiom, e.g. comexstat/parser.py:72-73)."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present) if present else df


def rename_coalescing(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """``rename_existing`` that is safe when several source columns map
    to the same target (e.g. bcb payloads carrying both ``UF`` and
    ``nomeUF``): the present sources for a target are coalesced in
    mapping order into one column, so the result never has duplicate
    column names / AMBIGUOUS_REFERENCE downstream."""
    from pyspark.sql import functions as F

    by_target: dict[str, list[str]] = {}
    for src, dst in mapping.items():
        if src in df.columns:
            by_target.setdefault(dst, []).append(src)
    for dst, sources in by_target.items():
        if len(sources) > 1 or dst in df.columns and dst not in sources:
            keep, drop = sources[0], sources[1:]
            cols = [F.col(s) for s in sources]
            if dst in df.columns and dst not in sources:
                cols.append(F.col(dst))
                drop = drop + [dst]
            df = df.withColumn(keep, F.coalesce(*cols)).drop(*drop)
    return rename_existing(df, mapping)


def strip_accents_upper(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFD", s.upper())
        if unicodedata.category(c) != "Mn"
    )


# ---------------------------------------------------------------------------
# Connector registry (plugin surface; ref: agrobr/plugins/__init__.py)
# ---------------------------------------------------------------------------

_CONNECTORS: dict[str, Callable[..., DataFrame]] = {}


def register_connector(name: str, fn: Callable[..., DataFrame] | None = None):
    """Register a payload reader under ``<source>.<shape>``. Usable as
    a decorator or direct call; later registrations win (plugins can
    override built-ins, ref plugins/__init__.py:18-50)."""
    if fn is None:
        def deco(f):
            _CONNECTORS[name] = f
            return f
        return deco
    _CONNECTORS[name] = fn
    return fn


def get_connector(name: str) -> Callable[..., DataFrame]:
    import agrobr_spark.sources.connectors  # noqa: F401 — load built-ins

    if name not in _CONNECTORS:
        raise KeyError(f"unknown connector {name!r}; see list_connectors()")
    return _CONNECTORS[name]


def list_connectors() -> list[str]:
    import agrobr_spark.sources.connectors  # noqa: F401

    return sorted(_CONNECTORS)
