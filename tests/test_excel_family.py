"""Excel-family connectors (ABIOVE / DERAL / MapBiomas) against the
real captured workbooks, pinned to the reference's golden
expectations (ref: tests/golden_data/{abiove,deral,mapbiomas} in the
reference suite), plus unit coverage for the stdlib BIFF8 ``.xls``
reader and the magic-byte workbook dispatcher."""

from __future__ import annotations

import struct
from pathlib import Path

import pytest

from agrobr_spark.sources import workbook, xls_biff
from agrobr_spark.sources.connectors.abiove import agregar_mensal, read_exportacao
from agrobr_spark.sources.connectors.deral import read_condicao
from agrobr_spark.sources.connectors.mapbiomas import read_cobertura, read_transicao

GOLDEN = Path(__file__).parent / "golden_data"
ABIOVE_XLSX = str(GOLDEN / "abiove" / "exportacao_sample" / "response.xlsx")
DERAL_XLS = str(GOLDEN / "deral" / "pc_sample" / "response.xlsx")
MAPBIOMAS_XLSX = str(GOLDEN / "mapbiomas" / "cobertura_sample" / "response.xlsx")


# ---------- BIFF8 reader ----------


def test_rk_decode_int_and_float():
    # integer RK: 30-bit signed << 2 | 0b10
    assert xls_biff._rk_value((42 << 2) | 2) == 42.0
    assert xls_biff._rk_value((-7 << 2) & 0xFFFFFFFF | 2) == -7.0
    # float RK: top 30 bits of an IEEE double
    bits = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
    assert xls_biff._rk_value((bits >> 32) & 0xFFFFFFFC) == 2.5
    # div-100 flag
    assert xls_biff._rk_value((1234 << 2) | 2 | 1) == 12.34


def test_biff_reads_real_deral_workbook():
    names = xls_biff.sheet_names(DERAL_XLS)
    assert "Atual" in names and len(names) >= 10
    rows = xls_biff.read_sheet_rows(DERAL_XLS, "Atual")
    flat = [str(v).strip().lower() for r in rows for v in r if v is not None]
    assert "ruim" in flat and "boa" in flat and "plantada" in flat


def test_biff_sheet_regex_and_missing():
    rows = xls_biff.read_sheet_rows(DERAL_XLS, r"^atu")  # case-insensitive regex
    assert rows
    with pytest.raises(KeyError):
        xls_biff.read_sheet_rows(DERAL_XLS, "no-such-sheet-xyz")


def test_workbook_dispatch_by_magic_bytes():
    # OLE2 magic routes to the BIFF reader, zip magic to the xlsx reader
    assert workbook._backend(DERAL_XLS) is xls_biff
    assert workbook._backend(MAPBIOMAS_XLSX).__name__.endswith("xlsx")
    with pytest.raises(ValueError, match="unrecognized workbook"):
        workbook._backend(b"\x00\x01\x02\x03\x04\x05\x06\x07")
    # bytes payloads dispatch identically to paths
    data = Path(DERAL_XLS).read_bytes()
    assert workbook.sheet_names(data) == workbook.sheet_names(DERAL_XLS)


# ---------- reference-pinned connector shapes ----------


def test_abiove_reference_pins(spark):
    df = read_exportacao(spark, ABIOVE_XLSX, ano=2025)
    rows = df.collect()
    # ref golden_data/abiove/exportacao_sample/expected.json
    assert len(rows) >= 72
    assert set(df.columns) == {"ano", "mes", "produto", "volume_ton", "receita_usd_mil"}
    assert {r.produto for r in rows} == {"farelo", "grao", "milho", "oleo", "total"}
    assert all(r.ano == 2025 and 1 <= r.mes <= 12 for r in rows)
    mensal = agregar_mensal(df).collect()
    assert len(mensal) == 12
    assert all(m.volume_ton > 0 for m in mensal)


def test_deral_reference_pins(spark):
    df = read_condicao(spark, DERAL_XLS)
    rows = df.collect()
    # ref golden_data/deral/pc_sample/expected.json
    assert len(rows) >= 168
    assert set(df.columns) == {
        "produto", "data", "condicao", "pct", "plantio_pct", "colheita_pct"
    }
    assert {r.condicao for r in rows} == {"boa", "media", "ruim"}
    assert all(r.produto is not None for r in rows)
    # pct values are percentages when present
    assert all(0 <= r.pct <= 100 for r in rows if r.pct is not None)


def test_deral_produto_filter(spark):
    df = read_condicao(spark, DERAL_XLS, produto="soja")
    prods = {r.produto for r in df.collect()}
    assert prods == {"soja"}


def test_mapbiomas_cobertura_reference_pins(spark):
    df = read_cobertura(spark, MAPBIOMAS_XLSX)
    rows = df.collect()
    # ref golden_data/mapbiomas/expected.json (cobertura)
    assert len(rows) >= 20
    assert {r.bioma for r in rows} == {"Amazônia", "Cerrado"}
    assert {r.estado for r in rows} == {"AC", "GO"}
    assert {1985, 2000, 2020, 2024} <= {r.ano for r in rows}
    # class legend resolves ids to names (public collection-10 legend)
    soja = [r for r in rows if r.classe_id == 39]
    assert all(r.classe == "Soja" for r in soja)


def test_mapbiomas_transicao_reference_pins(spark):
    df = read_transicao(spark, MAPBIOMAS_XLSX)
    rows = df.collect()
    # ref golden_data/mapbiomas/expected.json (transicao)
    assert len(rows) >= 20
    assert {r.bioma for r in rows} == {"Amazônia", "Cerrado"}
    assert {r.estado for r in rows} == {"AC", "GO"}
    periodos = {r.periodo for r in rows}
    assert {"1985-1986", "2019-2020", "2023-2024", "1985-2024"} <= periodos
