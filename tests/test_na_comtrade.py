"""Notícias Agrícolas + Comtrade connectors and the preco_diario
cepea→na→cache fallback chain (ref: agrobr/noticias_agricolas/parser.py,
comtrade/parser.py, datasets/preco_diario.py:65-159)."""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

import pytest

from agrobr_spark.datasets import DatasetSource, get_dataset
from agrobr_spark.sources.connectors.comtrade import read_mirror, read_trade
from agrobr_spark.sources.connectors.noticias_agricolas import read_indicador

GOLDEN = Path(__file__).parent / "golden_data"
NA_HTML = (GOLDEN / "noticias_agricolas" / "soja_sample" / "response.html").read_text()
CT_DIR = GOLDEN / "comtrade"


def test_na_reference_pinned_shape(spark):
    """Reference golden_data/na/soja_sample pin: 10 rows, first
    2026-02-20 @ 128.49 Paranaguá/PR, last 2026-02-05 @ 125.61."""
    df = read_indicador(spark, NA_HTML, produto="soja")
    rows = df.orderBy("data", ascending=False).collect()
    assert len(rows) == 10
    assert rows[0]["data"] == dt.date(2026, 2, 20)
    assert rows[0]["valor"] == pytest.approx(128.49)
    assert rows[0]["praca"] == "Paranaguá/PR"
    assert rows[-1]["data"] == dt.date(2026, 2, 5)
    assert rows[-1]["valor"] == pytest.approx(125.61)
    assert {r["unidade"] for r in rows} == {"BRL/sc60kg"}


def test_na_weekly_row_flagged(spark):
    """'09 - 13/02/2026' parses to the range end and carries the
    media_semanal anomaly (ref parser.py:74-82, 175-201)."""
    rows = {r["data"]: r for r in read_indicador(spark, NA_HTML, "soja").collect()}
    weekly = rows[dt.date(2026, 2, 13)]
    assert weekly["anomalies"] == "media_semanal"
    assert weekly["valor"] == pytest.approx(127.27)
    assert rows[dt.date(2026, 2, 20)]["anomalies"] is None


def test_na_region_column_layout(spark):
    """Trigo pages carry a Região column: praça comes from the row,
    not the product default (ref parser.py:124, 152-158)."""
    html = """<table><tr><th>Data</th><th>Região</th><th>Valor R$</th></tr>
    <tr><td>10/02/2026</td><td>Norte do Paraná</td><td>1.510,00</td></tr>
    <tr><td>10/02/2026</td><td>Oeste do Paraná</td><td>1.475,50</td></tr>
    </table>"""
    rows = read_indicador(spark, html, produto="trigo").collect()
    assert {r["praca"] for r in rows} == {"Norte do Paraná", "Oeste do Paraná"}
    assert {r["unidade"] for r in rows} == {"BRL/ton"}
    assert sorted(r["valor"] for r in rows) == [1475.5, 1510.0]


def test_na_empty_raises(spark):
    with pytest.raises(ValueError, match="no indicator rows"):
        read_indicador(spark, "<html><p>nada</p></html>", "soja")


def test_comtrade_trade_columns(spark):
    payload = (CT_DIR / "comercio_sample" / "response.json").read_text()
    df = read_trade(spark, payload)
    rows = df.collect()
    assert len(rows) == 8
    r = rows[0]
    assert r["periodo"] == "2024" and r["ano"] == 2024 and r["mes"] is None
    assert r["reporter_iso"] == "BRA" and r["partner_iso"] == "CHN"
    # volume_ton derivation: netWgt kg / 1000
    assert r["volume_ton"] == pytest.approx(r["peso_liquido_kg"] / 1000.0)


def test_comtrade_monthly_period_split(spark):
    df = read_trade(spark, [{"period": "202403", "cmdCode": "1201",
                             "netWgt": 1000.0, "fobvalue": 500.0}])
    r = df.first()
    assert r["ano"] == 2024 and r["mes"] == 3


def test_comtrade_mirror_reference_pin(spark):
    """Reference mirror_sample pin: 4 rows (4 reporter × 1 partner on
    hs 1201), diffs and ratios populated, zero-divide → NULL."""
    rep = (CT_DIR / "mirror_sample" / "response_reporter.json").read_text()
    par = (CT_DIR / "mirror_sample" / "response_partner.json").read_text()
    df = read_mirror(spark, rep, par, "BRA", "CHN")
    rows = df.collect()
    assert len(rows) == 4
    total = next(r for r in rows
                 if r["peso_liquido_kg_reporter"] == pytest.approx(72557710367.0))
    assert total["peso_liquido_kg_partner"] == pytest.approx(74647380005.0)
    assert total["diff_peso_kg"] == pytest.approx(72557710367.0 - 74647380005.0)
    assert total["ratio_valor"] == pytest.approx(31499887711.0 / 36455784932.0)
    # mirror of a missing partner row → NULL partner side
    only_rep = read_mirror(
        spark,
        json.dumps({"data": [{"period": "2024", "cmdCode": "9999",
                              "netWgt": 10.0, "fobvalue": 5.0}]}),
        par, "BRA", "CHN",
    ).filter("hs_code = '9999'").first()
    assert only_rep["peso_liquido_kg_partner"] is None
    assert only_rep["diff_peso_kg"] is None


def test_preco_diario_cepea_na_cache_chain(spark):
    """D1: cepea fails → NA mirror serves; NA fails too → cache
    (ref datasets/preco_diario.py fallback order)."""
    def boom(**kw):
        raise ConnectionError("cepea down")

    cache_df = spark.createDataFrame(
        [(dt.date(2026, 2, 1), "soja", None, 120.0, "BRL/sc60kg")],
        "data date, produto string, praca string, valor double, unidade string",
    )
    ds = get_dataset(
        "preco_diario",
        [
            DatasetSource("cepea", 1, boom),
            DatasetSource(
                "noticias_agricolas", 2,
                lambda **kw: read_indicador(spark, NA_HTML, "soja"),
            ),
            DatasetSource("cache", 99, lambda **kw: cache_df),
        ],
    )
    df, meta = ds.fetch()
    assert meta.source == "noticias_agricolas"
    assert meta.attempted_sources == ["cepea", "noticias_agricolas"]
    assert df.count() == 10

    def boom2(**kw):
        raise ValueError("layout drift")

    ds2 = get_dataset(
        "preco_diario",
        [
            DatasetSource("cepea", 1, boom),
            DatasetSource("noticias_agricolas", 2, boom2),
            DatasetSource("cache", 99, lambda **kw: cache_df),
        ],
    )
    df2, meta2 = ds2.fetch()
    assert meta2.source == "cache"
    assert df2.count() == 1
