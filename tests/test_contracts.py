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


# -- JSON interchange vs the reference's shipped schema exports --

_REF_SCHEMAS = "/root/reference/agrobr/schemas"


def _ref_schema_files():
    import glob

    return sorted(glob.glob(_REF_SCHEMAS + "/*.json"))


def test_reference_schema_files_round_trip_unchanged():
    """Every schema file the reference ships must round-trip through
    the repo's Contract (from_json -> to_json) with an identical
    parsed payload — the interchange format is byte-compatible, not
    merely similar. One shipped file (antaq_movimentacao.json) is in
    a compact hand-edited form that omits default-valued keys; for it
    the contract must still load and reach a FIXPOINT (the normalized
    re-export re-reads as an equal Contract)."""
    import json

    from agrobr_spark.contracts import Contract

    files = _ref_schema_files()
    assert len(files) >= 30
    full_matches = 0
    for f in files:
        text = open(f, encoding="utf-8").read()
        c = Contract.from_json(text)
        rt = json.loads(c.to_json())
        if rt == json.loads(text):
            full_matches += 1
        # fixpoint must hold for every file, compact or full
        assert Contract.from_json(c.to_json()) == c, f
    # all but the one compact file reproduce exactly
    assert full_matches >= len(files) - 1, full_matches


def test_registry_matches_reference_schema_exports():
    """The repo's 30 registered contracts must agree with the
    reference's shipped exports column-by-column: same column sets and
    order, dtypes, nullability, range bounds, and primary keys. The
    single allowed divergence is the documented money-column widening
    (registry docstring: engine may declare decimal where the
    reference declares float — float->decimal is the widening
    direction the store layer guarantees)."""
    import json

    from agrobr_spark.contracts import all_contracts

    reg = all_contracts()
    seen = set()
    for f in _ref_schema_files():
        d = json.load(open(f, encoding="utf-8"))
        c = reg.get(d["name"])
        assert c is not None, f"no registered contract for {d['name']}"
        seen.add(d["name"])
        assert [cs.name for cs in c.columns] == [
            cd["name"] for cd in d["columns"]
        ], d["name"]
        assert tuple(c.primary_key) == tuple(d["primary_key"]), d["name"]
        for cs, cd in zip(c.columns, d["columns"]):
            ok_type = cs.dtype == cd["type"] or (
                cs.dtype == "decimal" and cd["type"] == "float"
            )
            assert ok_type, (d["name"], cs.name, cs.dtype, cd["type"])
            assert cs.nullable == cd["nullable"], (d["name"], cs.name)
            assert cs.min_value == cd.get("min_value"), (d["name"], cs.name)
            assert cs.max_value == cd.get("max_value"), (d["name"], cs.name)
    assert seen == set(reg), sorted(set(reg) ^ seen)


def test_export_json_schemas_writes_loadable_files(tmp_path):
    """export_json_schemas writes one reference-format file per
    registered contract; each reloads to an equal Contract."""
    import json

    from agrobr_spark.contracts import (
        Contract,
        all_contracts,
        export_json_schemas,
    )

    written = export_json_schemas(str(tmp_path))
    assert len(written) == len(all_contracts())
    for p in written:
        text = open(p, encoding="utf-8").read()
        c = Contract.from_json(text)
        reg = all_contracts()[c.name]
        # from_json fills description="" on the Contract itself (the
        # interchange format has no top-level description); compare
        # everything else exactly
        import dataclasses

        assert dataclasses.replace(reg, description="") == c
        d = json.loads(text)
        # derived sections present and consistent
        assert set(d["dtypes"]) == {cd["name"] for cd in d["columns"]}
        assert set(d["required_columns"]) <= set(d["dtypes"])
