"""Semantic layer: priority fallback, contract gating, snapshot,
provenance (SURVEY §2.11 D1-D4)."""

from __future__ import annotations

import datetime as dt
import decimal

import pytest

from agrobr_spark.datasets import (
    DatasetSource,
    SourceUnavailableError,
    get_dataset,
    list_datasets,
)
from agrobr_spark.store import with_snapshot


def _preco_df(spark, n=3):
    rows = [
        (dt.date(2024, 1, 1 + i), "soja", "Paranagua", 120.0 + i, "BRL/sc60kg")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "data date, produto string, praca string, valor double, unidade string"
    )


def test_twelve_datasets_registered():
    assert len(list_datasets()) == 12
    assert "preco_diario" in list_datasets()
    with pytest.raises(KeyError):
        get_dataset("nope", [])


def test_priority_fallback_and_meta(spark):
    def failing(**kw):
        raise ConnectionError("boom")

    ds = get_dataset(
        "preco_diario",
        [
            DatasetSource("cepea", 1, failing),
            DatasetSource("cache", 99, lambda **kw: _preco_df(spark)),
        ],
    )
    df, meta = ds.fetch()
    assert df.count() == 3
    assert meta.source == "cache"
    assert meta.attempted_sources == ["cepea", "cache"]
    assert meta.contract == "cepea.indicador"
    # D3 normalize injected the missing fonte column
    assert "fonte" in df.columns


def test_all_sources_fail(spark):
    def failing(**kw):
        raise ValueError("parse error")

    ds = get_dataset("preco_diario", [DatasetSource("cepea", 1, failing)])
    with pytest.raises(SourceUnavailableError) as ei:
        ds.fetch()
    assert ei.value.attempts[0][:2] == ("cepea", "ValueError")


def test_contract_gate_rejects_invalid(spark):
    import pyspark.sql.functions as F

    bad = _preco_df(spark).withColumn("valor", -F.col("valor"))

    ds = get_dataset(
        "preco_diario",
        [
            DatasetSource("cepea", 1, lambda **kw: bad),
            DatasetSource("cache", 99, lambda **kw: _preco_df(spark)),
        ],
    )
    df, meta = ds.fetch()
    assert meta.source == "cache"  # invalid source skipped, fallback used
    assert meta.attempted_sources[0] == "cepea"


def test_snapshot_pins_reads(spark):
    ds = get_dataset(
        "preco_diario", [DatasetSource("cache", 1, lambda **kw: _preco_df(spark))]
    )
    with with_snapshot(dt.date(2024, 1, 2)):
        df, meta = ds.fetch()
        assert df.count() == 2
        assert meta.snapshot == "2024-01-02"
