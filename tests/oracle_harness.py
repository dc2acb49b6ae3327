"""Local re-implementation of the driver's DuckDB-oracle check.

Runs each catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
an order-insensitive canonical value hash. Stricter-than-driver
canonicalization (exact reprs, no float tolerance) so a local pass
predicts a driver pass.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
from dataclasses import dataclass

import duckdb

from agrobr_spark.io import TABLES


def _canon(v):
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:" + repr(v)
    if isinstance(v, decimal.Decimal):
        return "d:" + format(v.normalize(), "f")
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, dt.datetime):
        return "t:" + v.isoformat()
    if isinstance(v, dt.date):
        return "D:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
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


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    cur = con.execute(sql)
    ocols = [d[0].lower() for d in cur.description]
    orows = cur.fetchall()

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
