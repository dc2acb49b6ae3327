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
    assert float(rows[0]["valor"]) == pytest.approx(124.58)
    assert rows[-1]["data"] == dt.date(2024, 1, 2)
    assert float(rows[-1]["valor"]) == pytest.approx(123.48)
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


def test_consensus_old_layout_no_divergence(spark):
    """v2's can_parse declines the pre-2025 layout (no 'à vista'
    vocabulary), so only v1 votes and there is nothing to diverge."""
    df, divergences = parse_with_consensus(spark, GOLDEN_HTML, "soja")
    assert df.count() == 22
    assert divergences == []
    assert df.select("parser_version").distinct().collect()[0][0] == 1


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


# ---------------------------------------------------------------------------
# v2: the 2025 layout refresh (drifted golden) — consensus must
# discriminate, validity windows must gate (ref detector.py:39-97,
# consensus.py:41-236)
# ---------------------------------------------------------------------------

VISTA_HTML = (
    Path(__file__).parent
    / "golden_data"
    / "cepea"
    / "soja_vista_2025"
    / "response.html"
).read_text()


def test_v2_wins_on_refreshed_layout(spark):
    """Newest applicable parser wins; v2 reads the 'À vista R$' column
    (131.90 oldest), not the US$ column v1 would mis-pick (23.69)."""
    version, confidence, df = detect_and_parse(spark, VISTA_HTML, "soja")
    assert version == 2
    assert confidence == 1.0
    rows = df.orderBy("data").collect()
    assert len(rows) == 21
    assert float(rows[0]["valor"]) == pytest.approx(131.90)
    assert {r["parser_version"] for r in rows} == {2}


def test_v1_mispicks_usd_column_on_refreshed_layout(spark):
    """v1 still parses the new page with full confidence but lands on
    the US$ column — the silent-wrong-data mode consensus exists for."""
    from agrobr_spark.sources.connectors.cepea import can_parse_v1, parse_v1

    ok, confidence = can_parse_v1(VISTA_HTML)
    assert ok and confidence == 1.0
    rows = parse_v1(spark, VISTA_HTML, "soja").orderBy("data").collect()
    assert float(rows[0]["valor"]) == pytest.approx(23.69)  # US$, not R$


def test_consensus_discriminates_on_refreshed_layout(spark):
    """Both versions vote on the new page; the run-off reports the
    total divergence and pick-latest selects v2's R$ values."""
    df, divergences = parse_with_consensus(spark, VISTA_HTML, "soja")
    assert divergences == ["v1 vs v2: +21/-21 rows"]
    rows = df.orderBy("data").collect()
    assert {r["parser_version"] for r in rows} == {2}
    assert float(rows[0]["valor"]) == pytest.approx(131.90)


def test_validity_window_gates_v2_for_old_reference_dates(spark):
    """Pinning data_referencia before v2's valid_from (2025-06-01)
    excludes v2 even on the new page — the detector then falls back to
    v1 (which parses, wrongly: exactly why consensus exists alongside
    the window gate)."""
    version, _, df = detect_and_parse(
        spark, VISTA_HTML, "soja", data_referencia=dt.date(2025, 1, 15)
    )
    assert version == 1
    assert float(df.orderBy("data").first()["valor"]) == pytest.approx(23.69)


def test_drift_guard_rejects_widget_rewrite(spark):
    """A from-scratch page rewrite (no recognizable table markup) is
    breaking drift vs the old baseline fingerprint: rejected before any
    parser runs (V4 guard)."""
    baseline = fingerprint(GOLDEN_HTML)
    widget_page = (
        "<html><body><div id='app' data-widget='indicador-soja'>"
        "<script>render()</script></div></body></html>"
    )
    with pytest.raises(ParseError, match="drift"):
        read_indicador(spark, widget_page, produto="soja", baseline=baseline)


def test_refreshed_layout_is_breaking_vs_old_baseline(spark):
    """The 2025 refresh renames every header and the table class —
    breaking drift vs the v1-era baseline, so the guard rejects it
    (deploying v2 must ship an updated baseline, exactly the
    reference's structure_monitor workflow)."""
    baseline = fingerprint(GOLDEN_HTML)
    with pytest.raises(ParseError, match="drift"):
        read_indicador(spark, VISTA_HTML, produto="soja", baseline=baseline)


def test_refreshed_layout_passes_with_updated_baseline(spark):
    """With the baseline refreshed alongside the v2 rollout, the guard
    admits the new page and the detector picks v2 — guard and version
    detection compose."""
    baseline = fingerprint(VISTA_HTML)
    df = read_indicador(spark, VISTA_HTML, produto="soja", baseline=baseline)
    assert df.select("parser_version").distinct().collect()[0][0] == 2
