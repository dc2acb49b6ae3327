"""Alt-family (desmatamento / ANP / ANTT) + CONAB sub-source
connectors, pinned to the reference's golden expectations (ref:
tests/golden_data/{desmatamento,anp_diesel,antt_pedagio,conab_ceasa,
conab_progresso} in the reference suite)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from agrobr_spark.sources.connectors.antt_pedagio import read_fluxo
from agrobr_spark.sources.connectors.anp_diesel import read_precos, read_vendas
from agrobr_spark.sources.connectors.conab_ceasa import read_precos as read_ceasa
from agrobr_spark.sources.connectors.conab_progresso import read_progresso
from agrobr_spark.sources.connectors.conab_serie import read_serie_historica
from agrobr_spark.sources.connectors.desmatamento import read_deter, read_prodes

GOLDEN = Path(__file__).parent / "golden_data"
ABIOVE_XLSX_PATH = str(GOLDEN / "abiove" / "exportacao_sample" / "response.xlsx")


def test_prodes_reference_pins(spark):
    payload = (GOLDEN / "desmatamento/prodes_sample/response.csv").read_bytes()
    rows = read_prodes(spark, payload, bioma="Cerrado").collect()
    # ref golden_data/desmatamento/prodes_sample/expected.json
    assert len(rows) >= 15
    assert {r.uf for r in rows} == {"PA"}
    assert all(r.bioma == "Cerrado" and r.area_km2 > 0 for r in rows)
    assert {r.ano for r in rows} <= set(range(2017, 2026))
    assert all(r.classe == "desmatamento" for r in rows)


def test_deter_reference_pins(spark):
    payload = (GOLDEN / "desmatamento/deter_sample/response.csv").read_bytes()
    rows = read_deter(spark, payload, bioma="Amazônia").collect()
    # ref golden_data/desmatamento/deter_sample/expected.json
    assert len(rows) >= 15
    assert {r.uf for r in rows} == {"PA"}
    assert {r.classe for r in rows} == {
        "CICATRIZ_DE_QUEIMADA", "CS_DESORDENADO", "CS_GEOMETRICO",
        "DEGRADACAO", "DESMATAMENTO_CR",
    }
    assert all(r.data is not None and r.area_km2 > 0 for r in rows)
    assert all(r.municipio_id is not None for r in rows)


def test_antt_v1_aggregates_tipo_cobranca(spark):
    payload = (GOLDEN / "antt_pedagio/fluxo_v1_sample/response.csv").read_bytes()
    rows = read_fluxo(spark, payload, ano=2023).collect()
    # ref golden_data/antt_pedagio/fluxo_v1_sample/expected.json
    assert len(rows) >= 4
    assert all(r.volume > 0 for r in rows)
    assert all(r.data.day == 1 for r in rows)
    assert all(r.concessionaria == "CCR AutoBAn" for r in rows)
    # Categoria 1 Automatica(48500) + Manual(4200) collapse to one row
    cat1 = [r for r in rows if r.n_eixos == 2 and r.sentido == "Crescente"
            and r.data.month == 3]
    assert any(r.volume == 52700 for r in cat1)
    assert {r.tipo_veiculo for r in rows} <= {"Passeio", "Comercial", "Moto"}


def test_antt_v2_headerless(spark):
    payload = (GOLDEN / "antt_pedagio/fluxo_v2_sample/response.csv").read_bytes()
    rows = read_fluxo(spark, payload, ano=2024).collect()
    # ref golden_data/antt_pedagio/fluxo_v2_sample/expected.json
    assert len(rows) >= 3
    assert all(r.volume > 0 and r.data.day == 1 for r in rows)
    # numeric axle categories map 2→Passeio, 3+→Comercial
    assert all(r.tipo_veiculo == "Comercial" for r in rows if r.n_eixos >= 3)
    # Anchieta 4-eixos Jan Crescente: 28500 + 1500 aggregated
    assert any(r.volume == 30000 for r in rows)


def test_ceasa_reference_pins(spark):
    precos = json.loads((GOLDEN / "conab_ceasa/precos_sample/precos_response.json").read_text())
    ceasas = json.loads((GOLDEN / "conab_ceasa/precos_sample/ceasas_response.json").read_text())
    df = read_ceasa(spark, precos, ceasas)
    rows = df.collect()
    # ref golden_data/conab_ceasa/precos_sample/expected.json
    assert len(rows) >= 1900
    assert len({r.produto for r in rows}) == 48
    assert len({r.ceasa for r in rows}) == 43
    tomate = [r for r in rows if r.produto == "TOMATE" and r.ceasa == "CEAGESP - SAO PAULO"]
    assert tomate and tomate[0].preco == 2.24
    assert tomate[0].ceasa_uf == "SP" and tomate[0].unidade == "KG"
    assert tomate[0].categoria == "HORTALICAS"
    abacaxi = [r for r in rows if r.produto == "ABACAXI" and r.ceasa == "CEASA/CE - FORTALEZA"]
    assert abacaxi and abacaxi[0].preco == 6.0
    assert abacaxi[0].categoria == "FRUTAS" and abacaxi[0].unidade == "UN"
    assert {r.unidade for r in rows} == {"KG", "UN", "DZ"}
    assert {r.produto for r in rows if r.unidade == "DZ"} == {"ALFACE", "OVOS"}


def test_progresso_reference_pins(spark):
    rows = read_progresso(
        spark, str(GOLDEN / "conab_progresso/progresso_sample/response.xlsx")
    ).collect()
    # ref golden_data/conab_progresso/expected.json
    assert len(rows) == 8
    assert {r.cultura for r in rows} == {"Milho 2ª", "Soja"}
    assert {r.operacao for r in rows} == {"Colheita", "Semeadura"}
    assert {r.estado for r in rows} == {"GO", "MT", "PR"}
    assert {r.safra for r in rows} == {"2025/26"}
    assert {r.semana_atual for r in rows} == {"2026-02-07"}
    mt = [r for r in rows if r.estado == "MT" and r.cultura == "Soja"
          and r.operacao == "Colheita"]
    assert mt and mt[0].pct_semana_atual == 0.468


def test_anp_precos_diesel_filter_and_margin(spark):
    df = read_precos(
        spark, str(GOLDEN / "anp_diesel/precos_sample/response.xlsx")
    )
    rows = df.collect()
    assert all("DIESEL" in r.produto for r in rows)  # gasolina filtered out
    assert all(not r.produto.startswith("ÓLEO") for r in rows)
    first = rows[0]
    # mirrors the reference pin: AC DIESEL 2012-12-30, 2.659/2.35, 52 postos
    assert (first.uf, first.produto) == ("AC", "DIESEL")
    assert str(first.data) == "2012-12-30"
    assert first.preco_venda == 2.659 and first.preco_compra == 2.35
    assert first.n_postos == 52
    assert abs(first.margem - 0.309) < 1e-9
    # sentinel '-' in preco_compra → NULL margem, row kept
    s10 = [r for r in rows if r.produto == "DIESEL S10" and r.uf == "MT"]
    assert s10 and s10[0].preco_compra is None and s10[0].margem is None
    assert read_precos(
        spark, str(GOLDEN / "anp_diesel/precos_sample/response.xlsx"), uf="AC"
    ).count() == 3


def test_anp_vendas_flat_csv(spark):
    payload = (GOLDEN / "anp_diesel/vendas_sample/response.csv").read_bytes()
    rows = read_vendas(spark, payload).collect()
    # documented pin shape: MT/CENTRO-OESTE/DIESEL 500000.0 first
    assert len(rows) == 3  # gasolina + invalid month 13 dropped
    mt_jan = [r for r in rows if r.uf == "MT" and r.data.month == 1]
    assert mt_jan and mt_jan[0].regiao == "CENTRO-OESTE"
    assert mt_jan[0].produto == "DIESEL"
    assert mt_jan[0].volume_m3 == 500000.0 and str(mt_jan[0].data) == "2024-01-01"
    assert all(r.volume_m3 > 0 for r in rows)
    go = [r for r in rows if r.uf == "GO"]
    assert go and go[0].volume_m3 == 310500.5  # decimal comma parsed


def test_serie_historica_null_markers_and_merge(spark):
    rows = read_serie_historica(
        spark, str(GOLDEN / "conab_serie/soja_sample/response.xlsx"), produto="soja"
    ).collect()
    by_key = {(r.safra, r.uf): r for r in rows}
    # three metric sheets merged into wide records
    r = by_key[("2022/23", "MT")]
    assert r.area_plantada_mil_ha == 12000.3
    assert r.producao_mil_ton == 45000.8
    assert r.produtividade_kg_ha == 3750.0
    assert r.regiao == "CENTRO-OESTE"
    # null markers: '-' and '...' and zero-as-missing drop the value
    assert ("1976/77", "GO") not in by_key or by_key[("1976/77", "GO")].area_plantada_mil_ha is None
    pr77 = by_key.get(("1976/77", "PR"))
    assert pr77 is None or pr77.area_plantada_mil_ha is None  # zero → missing
    # '(1.234,5)' (footnote-paren + decimal comma) is a null marker
    # after the reference's replace chain → no 2023/24 PR record at all
    assert ("2023/24", "PR") not in by_key
    pr23 = by_key[("2022/23", "PR")]
    assert pr23.area_plantada_mil_ha == 5700.4 and pr23.regiao == "SUL"
    # BRASIL totals excluded
    assert all(r.uf in {"RO", "MT", "GO", "PR"} for r in rows)
    # uf filter
    only_mt = read_serie_historica(
        spark, str(GOLDEN / "conab_serie/soja_sample/response.xlsx"),
        produto="soja", uf="MT",
    ).collect()
    assert {r.uf for r in only_mt} == {"MT"}


def test_antt_pracas_and_enrich_join(spark):
    from agrobr_spark.sources.connectors.antt_pedagio import (
        join_fluxo_pracas,
        read_pracas,
    )

    pracas_csv = (
        "Concessionaria;Praca de Pedagio;Rodovia;UF;km m;Municipio;"
        "Latitude;Longitude;Situacao\n"
        "CCR AutoBAn;Campinas;SP-348;SP;km 94;Campinas;-22,907;-47,063;Ativa\n"
        "EcoRodovias;Anchieta;SP-150;SP;km 31;Cubatao;-23,88;-46,42;Ativa\n"
    ).encode()
    pracas = read_pracas(spark, pracas_csv)
    rows = {r.praca_de_pedagio: r for r in pracas.collect()}
    assert rows["Campinas"].uf == "SP" and rows["Campinas"].lat == -22.907
    assert rows["Anchieta"].rodovia == "SP-150"

    fluxo_csv = (GOLDEN / "antt_pedagio/fluxo_v1_sample/response.csv").read_bytes()
    fluxo = read_fluxo(spark, fluxo_csv, ano=2023)
    joined = join_fluxo_pracas(fluxo, pracas)
    out = joined.collect()
    assert all(r.rodovia == "SP-348" and r.municipio == "Campinas" for r in out)
    # plaza registry is broadcast (tiny dim), flow side un-shuffled
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_custo_producao_categories_and_totals(spark):
    from agrobr_spark.sources.connectors.conab_custo import (
        parse_planilha_rows,
        read_custo_producao,
    )
    from agrobr_spark.sources.workbook import read_sheet_rows

    path = str(GOLDEN / "conab_custo/soja_mt_sample/response.xlsx")
    df = read_custo_producao(spark, path, cultura="Soja", uf="mt", safra="2024/25")
    rows = df.collect()
    assert len(rows) == 9
    by_item = {r.item.split(" - ")[-1]: r for r in rows}
    assert by_item["Sementes"].categoria == "insumos"
    assert by_item["Operações com máquinas"].categoria == "operacoes"
    assert by_item["Mão de obra temporária"].categoria == "mao_de_obra"
    assert by_item["Depreciação de máquinas"].categoria == "custos_fixos"
    assert by_item["Arrendamento"].categoria == "outros"
    assert by_item["Defensivos"].valor_ha == 1250.5
    assert all(r.cultura == "soja" and r.uf == "MT" for r in rows)
    # COE/COT/CT totals captured separately, never as items
    _, totais = parse_planilha_rows(
        read_sheet_rows(path, 0), "soja", "MT", "2024/25"
    )
    assert totais == {"coe": 4316.5, "cot": 5052.83, "ct": 8334.83}
    assert not any("COE" in r.item or "CUSTO TOTAL" in r.item for r in rows)


def test_review_fix_deral_safra_labels_distinguished(spark):
    # full label resolves BEFORE the safra suffix is stripped
    from agrobr_spark.sources.connectors.deral import _produto_from_label

    assert _produto_from_label("Milho 1ª Safra") == "milho_1"
    assert _produto_from_label("Milho 2ª Safra") == "milho_2"
    assert _produto_from_label("Feijão 2ª Safra") == "feijao_2"
    assert _produto_from_label("Milho") == "milho"
    assert _produto_from_label("Trigo (sequeiro)") == "trigo"


def test_review_fix_progresso_pct_scale():
    from agrobr_spark.sources.connectors.conab_progresso import _safe_pct

    assert _safe_pct("46,8%") == pytest.approx(0.468)
    assert _safe_pct("0,5%") == pytest.approx(0.005)  # was 0.5 (=50%) pre-fix
    assert _safe_pct("1%") == pytest.approx(0.01)
    assert _safe_pct(0.468) == 0.468  # bare fraction passes through
    assert _safe_pct("") is None


def test_review_fix_custo_thousands_separators():
    from agrobr_spark.sources.connectors.conab_custo import _safe_float

    assert _safe_float("1.234,56") == 1234.56  # was dropped pre-fix
    assert _safe_float("1.234.567") == 1234567.0
    assert _safe_float("R$ 3.200,00") == 3200.0
    assert _safe_float("3,5") == 3.5
    assert _safe_float("-") is None


def test_review_fix_abiove_resolves_year_without_ano(spark):
    from agrobr_spark.sources.connectors.abiove import read_exportacao

    df = read_exportacao(spark, ABIOVE_XLSX_PATH)  # no ano kwarg
    anos = {r.ano for r in df.collect()}
    assert anos == {2025}  # latest year resolved from the sub-header


def test_review_fix_antt_headered_v2_dispatch(spark):
    # a 2024+ file WITH a header must route to the v2 parser even
    # when ano is omitted; v1 without a categoria column degrades to
    # NULL eixos instead of raising
    headered_v2 = (
        "Concessionaria;Praca;Mes Ano;Categoria Eixo;Tipo Cobranca;"
        "Sentido;Quantidade\n"
        "EcoRodovias;Anchieta;01/2024;4;Automatica;Crescente;100\n"
        "EcoRodovias;Anchieta;01/2024;4;Manual;Crescente;50\n"
    ).encode()
    rows = read_fluxo(spark, headered_v2).collect()
    assert len(rows) == 1 and rows[0].volume == 150 and rows[0].n_eixos == 4

    v1_sem_categoria = (
        "concessionaria;praca;mes_ano;sentido;quantidade\n"
        "CCR;Campinas;01/03/2023;Crescente;10\n"
    ).encode()
    r = read_fluxo(spark, v1_sem_categoria, ano=2023).collect()[0]
    assert r.volume == 10 and r.n_eixos is None


def test_review_fix_comtrade_backfill_types_union(spark):
    from agrobr_spark.sources.connectors.comtrade import read_trade

    full = [{"period": "202401", "cmdCode": "1201", "reporterISO": "BRA",
             "partnerISO": "CHN", "netWgt": "1000", "primaryValue": "500"}]
    partial = [{"period": "202402", "cmdCode": "1201", "reporterISO": "BRA",
                "partnerISO": "CHN"}]  # no numeric keys at all
    a, b = read_trade(spark, full), read_trade(spark, partial)
    assert dict(a.dtypes) == dict(b.dtypes)
    assert a.unionByName(b).count() == 2  # was AnalysisException pre-fix
