"""Local re-implementation of the driver's DuckDB-oracle check.

Runs each catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
an order-insensitive canonical value hash.

IMPORTANT (round-1 lesson): both result sets are fetched THROUGH
pandas, exactly like the driver, so engine→pandas dtype coercions are
part of what's compared. DuckDB `sum()` returns HUGEINT which pandas
renders float64 ('239545.0') while Spark's bigint stays int64
('239545') — `fetchall()` hid this (Python ints both sides) and local
green falsely predicted driver green for six queries. Oracle SQL must
CAST integer sums to BIGINT and surface decimals as DOUBLE.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from agrobr_spark.io import TABLES


def _canon(v):
    if v is None or v is pd.NaT:
        return "\0"
    if isinstance(v, (bool, np.bool_)):
        return "b:" + str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "f:nan"
        return "f:" + repr(v)
    if isinstance(v, decimal.Decimal):
        # NOT normalized: the driver stringifies pandas object cells, so
        # Decimal('96.04340000') != float 96.0434 — queries must cast.
        return "d:" + str(v)
    if isinstance(v, (int, np.integer)):
        return "i:" + str(int(v))
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        # midnight-exact datetimes canonicalize as dates: DuckDB's .df()
        # renders DATE columns as midnight datetime64 while Spark keeps
        # datetime.date objects — the driver equates them (date-output
        # queries hashed green in round 1)
        if (
            v.hour == 0 and v.minute == 0 and v.second == 0
            and v.microsecond == 0
            and getattr(v, "nanosecond", 0) == 0
            and v.tzinfo is None
        ):
            return "D:" + v.date().isoformat()
        return "t:" + v.isoformat()
    if isinstance(v, dt.date):
        return "D:" + v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "y:" + bytes(v).hex()
    return "s:" + str(v)


def value_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted(
        "\x1e".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _pandas_rows(pdf: pd.DataFrame) -> list[tuple]:
    """Rows as the driver sees them: through pandas dtype coercion.
    NaN/NaT → None only where pandas uses them as null markers."""
    rows = []
    for row in pdf.to_numpy(dtype=object):
        rows.append(
            tuple(
                None
                if x is None
                or x is pd.NaT
                or (isinstance(x, (float, np.floating)) and math.isnan(x))
                else x
                for x in row
            )
        )
    return rows


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    srows = _pandas_rows(sdf.toPandas())
    scols = [c.lower() for c in sdf.columns]

    cur = con.execute(sql)
    ocols = [d[0].lower() for d in cur.description]
    orows = _pandas_rows(cur.df())

    if sorted(scols) != sorted(ocols):
        return CompareResult(
            name, False, len(srows), len(orows),
            f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}",
        )
    if len(srows) != len(orows):
        return CompareResult(
            name, False, len(srows), len(orows), "row count mismatch"
        )
    sh = value_hash(srows, scols)
    oh = value_hash(orows, ocols)
    if sh != oh:
        # find a few differing canonical rows to aid debugging
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
        cs = sorted("\x1e".join(_canon(r[i]) for i in order_s) for r in srows)
        co = sorted("\x1e".join(_canon(r[i]) for i in order_o) for r in orows)
        diffs = [
            f"spark={a!r} oracle={b!r}" for a, b in zip(cs, co) if a != b
        ][:3]
        return CompareResult(
            name, False, len(srows), len(orows), "value hash mismatch: " + "; ".join(diffs)
        )
    return CompareResult(name, True, len(srows), len(orows))
