"""SURVEY §7's minimum end-to-end slice as ONE composed test:

load an indicadores-shaped table → contract-validate (PK dup + null +
range aggregates) → MERGE a fresh batch with overlapping dates →
filter produto+date-range → orderBy data desc → hash-compare against
DuckDB executing the same SQL on the same inputs.

Exercises S8, P2, P4, M1, V1, W4, O2 in one path.
"""

from __future__ import annotations

import datetime as dt
import decimal

import duckdb
import pyspark.sql.functions as F

from agrobr_spark.contracts import get_contract
from agrobr_spark.store import IndicadoresStore
from agrobr_spark.store.indicadores import SCHEMA
from tests.oracle_harness import value_hash


def _rows(n0, n, produto, valor0, day0, fonte="cepea", ts="2024-01-02 10:00:00"):
    return [
        (
            produto,
            "praca_1",
            dt.date(2024, 1, 1) + dt.timedelta(days=day0 + i),
            fonte,
            decimal.Decimal(valor0) + i,
            None,
            "BRL/sc60kg",
            dt.datetime.fromisoformat(ts),
        )
        for i in range(n0, n)
    ]


def test_minimum_e2e_slice(spark, tmp_path):
    store = IndicadoresStore(spark, str(tmp_path / "ind"))

    # 1. initial load: two products, 20 days each
    base = _rows(0, 20, "soja", "120.5", 0) + _rows(0, 20, "milho", "60.25", 0)
    store.upsert(spark.createDataFrame(base, SCHEMA))

    # 2. D3 post-fetch normalize (inject missing nullable columns) +
    #    contract gate on the loaded table
    contract = get_contract("cepea.indicador")
    normalized = store.table.read()
    for missing in contract.missing_columns(normalized):
        normalized = normalized.withColumn(missing, F.lit(None).cast("string"))
    assert contract.is_valid(normalized)

    # 3. fresh batch overlapping the last 5 days (revised values) plus
    #    5 new days — MERGE must update-in-place, not duplicate
    fresh = _rows(15, 30, "soja", "200.0", 0, ts="2024-01-05 10:00:00")
    store.upsert(spark.createDataFrame(fresh, SCHEMA))

    # 4-5. produto + date-range filter, recency sort (partitioned
    # parquet reads put the partition column last — pin the contract
    # column order explicitly)
    got = store.query("soja", inicio="2024-01-05", fim="2024-01-28").select(
        *SCHEMA.fieldNames()
    )
    grows = [tuple(r) for r in got.collect()]

    # oracle: same inputs, same MERGE semantics, same query — in DuckDB
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base (produto VARCHAR, praca VARCHAR, data DATE, "
        "fonte VARCHAR, valor DECIMAL(18,4), variacao DOUBLE, "
        "unidade VARCHAR, collected_at TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO base VALUES (?,?,?,?,?,?,?,?)", base + fresh
    )
    orows = con.execute(
        """
        WITH lww AS (
          SELECT *, row_number() OVER (
            PARTITION BY produto, praca, data, fonte
            ORDER BY collected_at DESC) AS rn
          FROM base)
        SELECT produto, praca, data, fonte, valor, variacao, unidade,
               collected_at
        FROM lww
        WHERE rn = 1 AND produto = 'soja'
          AND data BETWEEN DATE '2024-01-05' AND DATE '2024-01-28'
        ORDER BY data DESC
        """
    ).fetchall()

    assert len(grows) == len(orows) == 24
    assert value_hash(grows, got.columns) == value_hash(orows, got.columns)

    # the overlapping days carry the revised (fresh) values
    idx_data = got.columns.index("data")
    idx_valor = got.columns.index("valor")
    revised = {
        r[idx_data]: r[idx_valor]
        for r in grows
        if r[idx_data] >= dt.date(2024, 1, 16)
    }
    assert revised[dt.date(2024, 1, 16)] == decimal.Decimal("215.0000")

    # W4: latest-per-key top-1
    ultimo = got.orderBy(F.desc("data")).limit(1).collect()[0]
    assert ultimo["data"] == dt.date(2024, 1, 30) - dt.timedelta(days=2)
