"""CEPEA connector: versioned detection, drift guard, consensus, and
the preco_diario priority-1 wiring (ref: agrobr/cepea/parsers/*,
tests/test_cepea in the reference suite)."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pytest

from agrobr_spark.datasets import DatasetSource, get_dataset
from agrobr_spark.sources.connectors.cepea import (
    ParseError,
    can_parse_v1,
    detect_and_parse,
    detect_unidade,
    parse_with_consensus,
    read_indicador,
)
from agrobr_spark.sources.fingerprint import fingerprint

GOLDEN_HTML = (
    Path(__file__).parent / "golden_data" / "cepea" / "soja_sample" / "response.html"
).read_text()


def test_can_parse_confidence_on_indicador_page():
    ok, confidence = can_parse_v1(GOLDEN_HTML)
    assert ok
    assert confidence == 1.0  # all five structural checks pass


def test_can_parse_rejects_non_indicador_page():
    ok, confidence = can_parse_v1("<html><body><p>landing page</p></body></html>")
    assert not ok
    assert confidence < 0.4


def test_reference_pinned_shape(spark):
    """The reference's golden pin: 22 rows, first 2024-01-31 @ 124.58,
    last 2024-01-02 @ 123.48, all BRL/sc60kg."""
    df = read_indicador(spark, GOLDEN_HTML, produto="soja")
    rows = df.collect()
    assert len(rows) == 22
    assert rows[0]["data"] == dt.date(2024, 1, 31)
    assert rows[0]["valor"] == pytest.approx(124.58)
    assert rows[-1]["data"] == dt.date(2024, 1, 2)
    assert rows[-1]["valor"] == pytest.approx(123.48)
    assert {r["unidade"] for r in rows} == {"BRL/sc60kg"}
    assert {r["fonte"] for r in rows} == {"cepea"}


def test_validity_window_excludes_parser(spark):
    with pytest.raises(ParseError):
        detect_and_parse(
            spark, GOLDEN_HTML, "soja", data_referencia=dt.date(2023, 6, 1)
        )


def test_detect_returns_version_and_confidence(spark):
    version, confidence, df = detect_and_parse(spark, GOLDEN_HTML, "soja")
    assert version == 1
    assert confidence == 1.0
    assert df.count() == 22


def test_consensus_single_version_no_divergence(spark):
    df, divergences = parse_with_consensus(spark, GOLDEN_HTML, "soja")
    assert df.count() == 22
    assert divergences == []


def test_drift_guard_breaking_layout(spark):
    baseline = fingerprint(GOLDEN_HTML)
    changed = "<html><body><div>totally different page</div></body></html>"
    with pytest.raises(ParseError, match="drift"):
        read_indicador(spark, changed, produto="soja", baseline=baseline)
    # same layout sails through
    assert read_indicador(
        spark, GOLDEN_HTML, produto="soja", baseline=baseline
    ).count() == 22


def test_unit_detection_from_headers():
    assert detect_unidade("soja", []) == "BRL/sc60kg"
    assert detect_unidade("boi_gordo", []) == "BRL/@"
    assert detect_unidade("desconhecido", ["valor (r$/sc 50kg)"]) == "BRL/sc50kg"
    assert detect_unidade("desconhecido", ["preço r$/kg"]) == "BRL/kg"


def test_preco_diario_priority1_cepea(spark):
    """D1 wiring: cepea connector as preco_diario's priority-1 source,
    contract-validated end to end (ref: datasets/preco_diario.py:65-159)."""
    ds = get_dataset(
        "preco_diario",
        [
            DatasetSource(
                "cepea",
                1,
                lambda **kw: read_indicador(spark, GOLDEN_HTML, produto="soja"),
            ),
        ],
    )
    df, meta = ds.fetch()
    assert meta.source == "cepea"
    assert meta.contract == "cepea.indicador"
    assert df.count() == 22
    # D3 normalize keeps contract columns; recency sort
    first = df.first()
    assert first["data"] == dt.date(2024, 1, 31)
