"""S6: WFS/GeoServer scan with source-level pushdown.

Reference: agrobr/desmatamento/client.py:39-57,87-112 — the client
builds a GetFeature URL carrying ``propertyName`` (column pruning),
``CQL_FILTER`` (predicate pushdown), and ``maxFeatures`` (limit
pushdown). That is exactly what a Catalyst v2 source would push; the
HTTP fetch stays driver-side, the CSV payload lands in spark.read.csv.
"""

from __future__ import annotations

import datetime as dt
from urllib.parse import urlencode


def _cql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (dt.date, dt.datetime)):
        return v.isoformat()
    return str(v)


def build_getfeature_url(
    base_url: str,
    type_name: str,
    columns: list[str] | None = None,
    equals: dict | None = None,
    date_between: tuple[str, dt.date, dt.date] | None = None,
    max_features: int | None = None,
    output_format: str = "csv",
) -> str:
    """Compose a WFS 2.0 GetFeature URL with pushdown parameters."""
    params: dict[str, str] = {
        "service": "WFS",
        "version": "2.0.0",
        "request": "GetFeature",
        "typeNames": type_name,
        "outputFormat": output_format,
    }
    if columns:
        params["propertyName"] = ",".join(columns)
    filters = [
        f"{k} = {_cql_literal(v)}" for k, v in (equals or {}).items()
    ]
    if date_between:
        col, lo, hi = date_between
        filters.append(f"{col} BETWEEN {lo.isoformat()} AND {hi.isoformat()}")
    if filters:
        params["CQL_FILTER"] = " AND ".join(filters)
    if max_features is not None:
        params["count"] = str(max_features)
    return f"{base_url}?{urlencode(params)}"
