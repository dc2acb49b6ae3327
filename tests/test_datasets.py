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


# ---------------------------------------------------------------------------
# D2: the 11 non-price semantic datasets (real normalize stages)
# ---------------------------------------------------------------------------


def _fetch(spark, name, rows, schema, source="primary", **kwargs):
    ds = get_dataset(
        name,
        [DatasetSource(source, 1, lambda **kw: spark.createDataFrame(rows, schema))],
    )
    return ds.fetch(**kwargs)


def test_producao_anual_conab_harmonization(spark):
    # CONAB-native shape: safra label, uf, produtividade
    rows = [("2023/24", "PR", 5000.0, 4800.0, 3100.0, 14880.0, "soja")]
    schema = (
        "safra string, uf string, area_plantada double, area_colhida double, "
        "produtividade double, producao double, produto string"
    )
    df, meta = _fetch(spark, "producao_anual", rows, schema, source="conab")
    row = df.collect()[0]
    assert row["ano"] == 2023
    assert row["localidade"] == "PR"
    assert row["rendimento"] == 3100.0
    assert row["fonte"] == "conab"
    assert "safra" not in df.columns
    assert meta.contract == "ibge.pam"


def test_producao_anual_pam_passthrough_and_filter(spark):
    rows = [
        (2022, "PR", 100.0, 99.0, 5.0, 3.0, 1.0, "soja"),
        (2023, "PR", 100.0, 99.0, 5.0, 3.0, 1.0, "soja"),
    ]
    schema = (
        "ano long, localidade string, area_plantada double, area_colhida double, "
        "producao double, rendimento double, valor_producao double, produto string"
    )
    df, _ = _fetch(spark, "producao_anual", rows, schema, source="ibge_pam", ano=2023)
    assert df.count() == 1
    assert df.collect()[0]["fonte"] == "ibge_pam"


def test_estimativa_safra_lspa_fallback(spark):
    # primary CONAB source fails; IBGE-LSPA calendar shape harmonized
    lspa_rows = [(2024, 3, "soja", "PR", 100.0, 99.0, 3100.0, 30.0)]
    lspa_schema = (
        "ano long, mes long, produto string, uf string, area_plantada double, "
        "area_colhida double, rendimento double, producao double"
    )

    def failing(**kw):
        raise ConnectionError("conab down")

    ds = get_dataset(
        "estimativa_safra",
        [
            DatasetSource("conab", 1, failing),
            DatasetSource(
                "ibge_lspa",
                2,
                lambda **kw: spark.createDataFrame(lspa_rows, lspa_schema),
            ),
        ],
    )
    df, meta = ds.fetch()
    row = df.collect()[0]
    assert meta.source == "ibge_lspa"
    assert row["safra"] == "2024/25"
    assert row["levantamento"] == 3
    assert row["produtividade"] == 3100.0
    assert str(row["data_publicacao"]) == "2024-03-01"


def test_balanco_supply_identity(spark):
    rows = [("2023/24", "milho", 10.0, 120.0, 2.0, 100.0, 25.0)]
    schema = (
        "safra string, produto string, estoque_inicial double, producao double, "
        "importacao double, consumo double, exportacao double"
    )
    df, _ = _fetch(spark, "balanco", rows, schema, source="conab")
    row = df.collect()[0]
    assert row["suprimento"] == 132.0
    assert row["estoque_final"] == 7.0


def test_credito_rural_regiao_derivation(spark):
    rows = [("2023/24", "soja", "PR", "custeio", 10.0, 1e6)]
    schema = (
        "safra string, produto string, uf string, finalidade string, "
        "volume double, valor double"
    )
    df, _ = _fetch(spark, "credito_rural", rows, schema, source="bcb")
    row = df.collect()[0]
    assert row["regiao"] == "sul"
    assert row["agregacao"] == "uf"
    assert row["cd_programa"] is None


def test_exportacao_comexstat_header_map(spark):
    rows = [(2023, 5, "SP", 1000.0, 500.0, "soja")]
    schema = (
        "CO_ANO long, CO_MES long, SG_UF_NCM string, KG_LIQUIDO double, "
        "VL_FOB double, produto string"
    )
    df, _ = _fetch(spark, "exportacao", rows, schema, source="comexstat")
    row = df.collect()[0]
    assert row["ano"] == 2023 and row["uf"] == "SP"
    assert row["kg_liquido"] == 1000.0 and row["valor_fob_usd"] == 500.0


def test_custo_producao_participacao_share(spark):
    rows = [
        ("soja", "PR", "2023/24", "insumos", "semente", "kg", 60.0, 10.0, 600.0),
        ("soja", "PR", "2023/24", "insumos", "adubo", "kg", 400.0, 1.0, 400.0),
    ]
    schema = (
        "cultura string, uf string, safra string, categoria string, item string, "
        "unidade string, quantidade_ha double, preco_unitario double, valor_ha double"
    )
    df, _ = _fetch(spark, "custo_producao", rows, schema, source="conab")
    shares = {r["item"]: r["participacao_pct"] for r in df.collect()}
    assert shares["semente"] == pytest.approx(60.0)
    assert shares["adubo"] == pytest.approx(40.0)


def test_cadastro_rural_status_hygiene(spark):
    rows = [
        (
            "PR-123",
            "  ativo ",
            dt.datetime(2020, 1, 1),
            dt.datetime(2024, 1, 1),
            100.0,
            "pr",
            "Londrina",
            4113700,
            5.0,
        )
    ]
    schema = (
        "cod_imovel string, status string, data_criacao timestamp, "
        "data_atualizacao timestamp, area_ha double, uf string, municipio string, "
        "cod_municipio_ibge long, modulos_fiscais double"
    )
    df, _ = _fetch(spark, "cadastro_rural", rows, schema, source="sicar")
    row = df.collect()[0]
    assert row["status"] == "ATIVO" and row["uf"] == "PR"
    assert row["tipo"] == "IRU"


@pytest.mark.parametrize(
    "name,rows,schema,kwargs",
    [
        (
            "fertilizante",
            [(2023, 4, "PR", 1000.0)],
            "ano long, mes long, uf string, volume_ton double",
            {"produto_fertilizante": "ureia"},
        ),
        (
            "abate_trimestral",
            [("2023T1", "PR", 100.0, 2000.0)],
            "trimestre string, localidade string, animais_abatidos double, "
            "peso_carcacas double",
            {"especie": "bovinos"},
        ),
        (
            "pecuaria_municipal",
            [(2023, "PR", 1000.0, "cabeças")],
            "ano long, localidade string, valor double, unidade string",
            {"especie": "bovinos"},
        ),
        (
            "censo_agropecuario",
            [(2017, "PR", "total", "estabelecimentos", 5000.0, "unidades")],
            "ano long, localidade string, categoria string, variavel string, "
            "valor double, unidade string",
            {"tema": "estabelecimentos"},
        ),
    ],
)
def test_param_injection_datasets(spark, name, rows, schema, kwargs):
    df, meta = _fetch(spark, name, rows, schema, **kwargs)
    assert df.count() == 1
    row = df.collect()[0]
    (param, value), = kwargs.items()
    assert row[param] == value
    assert meta.contract is not None


def test_all_twelve_have_real_classes():
    from agrobr_spark.datasets.registry import DATASETS, GenericDataset

    for name in DATASETS:
        ds = get_dataset(name, [])
        assert not isinstance(ds, GenericDataset), name
        assert ds.contract_name == DATASETS[name]


def test_snapshot_pins_reads(spark):
    ds = get_dataset(
        "preco_diario", [DatasetSource("cache", 1, lambda **kw: _preco_df(spark))]
    )
    with with_snapshot(dt.date(2024, 1, 2)):
        df, meta = ds.fetch()
        assert df.count() == 2
        assert meta.snapshot == "2024-01-02"
