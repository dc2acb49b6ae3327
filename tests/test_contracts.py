"""Contract registry + generated validation query (SURVEY §2.10 V1)."""

from __future__ import annotations

import datetime as dt

import pytest

from agrobr_spark.contracts import all_contracts, get_contract


def test_registry_has_all_30_contracts():
    names = all_contracts()
    assert len(names) == 30
    # spot-check the PKs SURVEY §2.10 documents
    assert get_contract("cepea.indicador").primary_key == ("data", "produto")
    assert get_contract("conab.safras").primary_key == (
        "safra", "produto", "uf", "levantamento",
    )
    assert get_contract("ibge.pam").primary_key == ("ano", "produto", "localidade")


def test_struct_type_roundtrip():
    for c in all_contracts().values():
        st = c.struct_type()
        assert len(st.fields) == len(c.columns)
        # JSON round-trip (schema export compatibility)
        import pyspark.sql.types as T

        assert T.StructType.fromJson(st.jsonValue()) == st


def _rows(valid: bool):
    from decimal import Decimal

    base = [
        (dt.date(2024, 1, 31), "soja", "Paranagua", Decimal("124.58"),
         "BRL/sc60kg", "cepea", None, None),
        (dt.date(2024, 2, 1), "soja", "Paranagua", Decimal("125.10"),
         "BRL/sc60kg", "cepea", None, None),
    ]
    if not valid:
        base.append(
            (dt.date(2024, 1, 31), "soja", "Paranagua", Decimal("-5.0"),
             "BRL/sc60kg", "cepea", None, None)  # negative valor AND dup PK
        )
    return base


def test_validation_clean_and_dirty(spark):
    c = get_contract("cepea.indicador")
    clean = spark.createDataFrame(_rows(True), c.struct_type())
    assert c.is_valid(clean)

    dirty = spark.createDataFrame(_rows(False), c.struct_type())
    row = c.validation_query(dirty).collect()[0].asDict()
    assert row["fora_valor"] == 1
    assert row["pk_duplicados"] == 1
    assert not c.is_valid(dirty)


def test_missing_columns(spark):
    c = get_contract("cepea.indicador")
    df = spark.createDataFrame([(1,)], "valor long")
    assert "data" in c.missing_columns(df)
    assert not c.is_valid(df)
