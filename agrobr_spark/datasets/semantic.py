"""The 11 non-price semantic datasets (D2), each with its real
normalize / source-harmonization stage.

Reference: agrobr/datasets/*.py (one module per dataset). Each
reference dataset couples three things this module re-expresses
Spark-first:

- **source adapters** — each source's native schema reshaped to the
  dataset contract (e.g. CONAB safras → IBGE-PAM shape for
  producao_anual, ref producao_anual.py:43-51);
- **normalize stage** — inject the request parameters as columns when
  the source omits them (produto/fonte/finalidade/cultura/tema…,
  ref producao_anual.py:130-137 and siblings), plus dataset-specific
  derivations (credito_rural's UF→região, custo_producao's
  participação share);
- **metadata** — products, unit, cadence, institution
  (ref: the DatasetInfo blocks).

Everything is a narrow projection/filter or a broadcast dim join —
no shuffles beyond what the derivation itself requires.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from agrobr_spark.datasets.base import BaseDataset


@dataclass(frozen=True)
class DatasetInfo:
    """Static dataset metadata (ref: agrobr/datasets/base.py
    DatasetInfo; network/url fields scoped out per SURVEY §4)."""

    name: str
    description: str
    products: tuple[str, ...] = ()
    update_frequency: str = ""
    typical_latency: str = ""
    source_institution: str = ""
    min_date: str = ""
    unit: str = ""
    contract_version: str = "1.0"


def _inject(df: DataFrame, **defaults) -> DataFrame:
    """Add each column only when missing (the reference's
    `if col not in df.columns` normalize idiom)."""
    for name, value in defaults.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(value))
    return df


class ProducaoAnualDataset(BaseDataset):
    """producao_anual: consolidated yearly production, IBGE-PAM first,
    CONAB fallback harmonized into PAM shape
    (ref: agrobr/datasets/producao_anual.py:43-137)."""

    name = "producao_anual"
    contract_name = "ibge.pam"
    date_col = "ano"
    filter_params = ("produto", "ano", "localidade")
    info = DatasetInfo(
        name="producao_anual",
        description="Produção agrícola anual consolidada por UF ou município",
        products=("soja", "milho", "arroz", "feijao", "trigo", "algodao", "cafe"),
        update_frequency="yearly",
        typical_latency="Y+1",
        source_institution="IBGE",
        min_date="1974-01-01",
        unit="ha / ton / kg/ha",
    )

    def from_conab(self, df: DataFrame) -> DataFrame:
        # CONAB safras → PAM shape: safra "2023/24" → ano 2023,
        # uf → localidade, produtividade → rendimento
        # (ref: producao_anual.py:43-51)
        out = df
        if "ano" not in out.columns and "safra" in out.columns:
            out = out.withColumn(
                "ano", F.split("safra", "/").getItem(0).cast("int")
            )
        if "localidade" not in out.columns and "uf" in out.columns:
            out = out.withColumnRenamed("uf", "localidade")
        if "rendimento" not in out.columns and "produtividade" in out.columns:
            out = out.withColumnRenamed("produtividade", "rendimento")
        out = _inject(out, valor_producao=F.lit(None).cast("double"))
        out = out.withColumn("fonte", F.lit("conab"))
        return out.drop("safra", "levantamento", "data_publicacao")

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        df = _inject(df, produto=kwargs.get("produto"), fonte="ibge_pam")
        return _inject(
            df,
            area_plantada=F.lit(None).cast("double"),
            area_colhida=F.lit(None).cast("double"),
        )


class EstimativaSafraDataset(BaseDataset):
    """estimativa_safra: current-season estimates, CONAB first, IBGE
    LSPA fallback (ref: agrobr/datasets/estimativa_safra.py:19-120)."""

    name = "estimativa_safra"
    contract_name = "conab.safras"
    date_col = "data_publicacao"
    filter_params = ("produto", "safra", "uf")
    info = DatasetInfo(
        name="estimativa_safra",
        description="Estimativas de safra corrente por UF",
        products=("soja", "milho", "arroz", "feijao", "trigo", "algodao"),
        update_frequency="monthly",
        typical_latency="M+0",
        source_institution="CONAB",
        min_date="2005-01-01",
        unit="mil ha / mil ton / kg/ha",
    )

    def from_ibge_lspa(self, df: DataFrame) -> DataFrame:
        # LSPA is calendar-year monthly: ano → safra label, mes →
        # levantamento ordinal (CONAB's "survey number" analog)
        out = df
        if "safra" not in out.columns and "ano" in out.columns:
            out = out.withColumn(
                "safra",
                F.concat(
                    F.col("ano").cast("string"),
                    F.lit("/"),
                    F.lpad(((F.col("ano") + 1) % 100).cast("string"), 2, "0"),
                ),
            )
        if "levantamento" not in out.columns and "mes" in out.columns:
            out = out.withColumn("levantamento", F.col("mes").cast("long"))
        if "produtividade" not in out.columns and "rendimento" in out.columns:
            out = out.withColumnRenamed("rendimento", "produtividade")
        out = out.withColumn("fonte", F.lit("ibge_lspa"))
        # LSPA carries no publication date; synthesize month-start so the
        # contract's NOT NULL data_publicacao holds (ref idiom:
        # estimativa_safra fallback stamps the reference month).
        if "data_publicacao" not in out.columns:
            out = out.withColumn(
                "data_publicacao",
                F.make_date(F.col("ano"), F.col("mes"), F.lit(1)),
            )
        return out.drop("ano", "mes")

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        return _inject(df, produto=kwargs.get("produto"), fonte="conab")


class BalancoDataset(BaseDataset):
    """balanco: supply/demand balance sheet; the supply identity
    (suprimento = estoque_inicial + producao + importacao) is derived
    when a source ships only the raw components
    (ref: agrobr/datasets/balanco.py normalize + conab balanco table)."""

    name = "balanco"
    contract_name = "conab.balanco"
    date_col = "safra"
    filter_params = ("produto", "safra")
    info = DatasetInfo(
        name="balanco",
        description="Balanço de oferta e demanda por produto/safra",
        products=("soja", "milho", "arroz", "algodao", "trigo"),
        update_frequency="monthly",
        typical_latency="M+0",
        source_institution="CONAB",
        min_date="1996-01-01",
        unit="mil ton",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        df = _inject(df, produto=kwargs.get("produto"), fonte="conab")
        if "suprimento" not in df.columns:
            df = df.withColumn(
                "suprimento",
                F.col("estoque_inicial") + F.col("producao") + F.col("importacao"),
            )
        if "estoque_final" not in df.columns:
            df = df.withColumn(
                "estoque_final",
                F.col("suprimento") - F.col("consumo") - F.col("exportacao"),
            )
        return df


class CreditoRuralDataset(BaseDataset):
    """credito_rural: BCB/SICOR rural-credit volumes; região derived
    from UF via the broadcast UF dim when the source omits it
    (ref: agrobr/datasets/credito_rural.py normalize)."""

    name = "credito_rural"
    contract_name = "bcb.credito_rural"
    date_col = "safra"
    filter_params = ("produto", "safra", "uf", "finalidade")
    info = DatasetInfo(
        name="credito_rural",
        description="Crédito rural contratado por safra/UF/finalidade",
        products=("soja", "milho", "cafe", "algodao", "arroz"),
        update_frequency="monthly",
        typical_latency="M+1",
        source_institution="BCB",
        min_date="2013-01-01",
        unit="BRL",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        df = _inject(
            df,
            produto=kwargs.get("produto"),
            finalidade=kwargs.get("finalidade", "custeio"),
            agregacao="uf",
        )
        if "regiao" not in df.columns and "uf" in df.columns:
            from agrobr_spark.normalize.dims import uf_dim

            dim = F.broadcast(
                uf_dim(df.sparkSession).select("uf", "regiao")
            )
            df = df.join(dim, "uf", "left")
        # optional SICOR code/name pairs → null when absent
        for c in (
            "cd_programa", "cd_fonte_recurso", "cd_tipo_seguro",
            "cd_modalidade", "cd_atividade",
        ):
            df = _inject(df, **{c: F.lit(None).cast("string")})
        for c in (
            "programa", "fonte_recurso", "tipo_seguro", "modalidade",
            "atividade",
        ):
            df = _inject(df, **{c: F.lit(None).cast("string")})
        return df


class ExportacaoDataset(BaseDataset):
    """exportacao: COMEXSTAT monthly export flows; the adapter maps the
    public CSV header (CO_ANO/CO_MES/SG_UF_NCM/KG_LIQUIDO/VL_FOB) to
    the contract shape (ref: agrobr/datasets/exportacao.py +
    agrobr/comexstat parser)."""

    name = "exportacao"
    contract_name = "comexstat.exportacao"
    date_col = "ano"
    filter_params = ("produto", "ano", "uf")
    info = DatasetInfo(
        name="exportacao",
        description="Exportações mensais por produto/UF",
        products=("soja", "milho", "cafe", "algodao", "carne_bovina"),
        update_frequency="monthly",
        typical_latency="M+1",
        source_institution="MDIC",
        min_date="1997-01-01",
        unit="kg / USD FOB",
    )

    def from_comexstat(self, df: DataFrame) -> DataFrame:
        renames = {
            "CO_ANO": "ano",
            "CO_MES": "mes",
            "SG_UF_NCM": "uf",
            "KG_LIQUIDO": "kg_liquido",
            "VL_FOB": "valor_fob_usd",
        }
        for old, new in renames.items():
            if old in df.columns and new not in df.columns:
                df = df.withColumnRenamed(old, new)
        return df

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        return _inject(df, produto=kwargs.get("produto"))


class FertilizanteDataset(BaseDataset):
    """fertilizante: ANDA deliveries (ref:
    agrobr/datasets/fertilizante.py normalize)."""

    name = "fertilizante"
    contract_name = "anda.fertilizante"
    date_col = "ano"
    filter_params = ("produto_fertilizante", "ano", "uf")
    info = DatasetInfo(
        name="fertilizante",
        description="Entregas de fertilizantes por UF",
        products=("NPK", "ureia", "MAP", "KCl", "SSP"),
        update_frequency="monthly",
        typical_latency="M+2",
        source_institution="ANDA",
        min_date="1998-01-01",
        unit="ton",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        return _inject(
            df, produto_fertilizante=kwargs.get("produto_fertilizante")
        )


class CustoProducaoDataset(BaseDataset):
    """custo_producao: CONAB per-hectare cost sheets; the share column
    (participacao_pct) is derived per cost sheet when the source ships
    only absolute values (ref: agrobr/datasets/custo_producao.py)."""

    name = "custo_producao"
    contract_name = "conab.custo_producao"
    date_col = "safra"
    filter_params = ("cultura", "uf", "safra")
    info = DatasetInfo(
        name="custo_producao",
        description="Custo de produção por cultura/UF/safra (itens)",
        products=("soja", "milho", "algodao", "arroz", "trigo"),
        update_frequency="yearly",
        typical_latency="Y+0",
        source_institution="CONAB",
        min_date="2006-01-01",
        unit="BRL/ha",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        df = _inject(
            df,
            cultura=kwargs.get("cultura"),
            tecnologia=F.lit(None).cast("string"),
        )
        if "participacao_pct" not in df.columns and "valor_ha" in df.columns:
            sheet = Window.partitionBy("cultura", "uf", "safra")
            df = df.withColumn(
                "participacao_pct",
                F.col("valor_ha") / F.sum("valor_ha").over(sheet) * 100.0,
            )
        return df


class AbateTrimestralDataset(BaseDataset):
    """abate_trimestral: IBGE quarterly slaughter
    (ref: agrobr/datasets/abate_trimestral.py)."""

    name = "abate_trimestral"
    contract_name = "ibge.abate"
    date_col = "trimestre"
    filter_params = ("especie", "trimestre", "localidade")
    info = DatasetInfo(
        name="abate_trimestral",
        description="Abate trimestral por espécie",
        products=("bovinos", "suinos", "frangos"),
        update_frequency="quarterly",
        typical_latency="Q+1",
        source_institution="IBGE",
        min_date="1997-01-01",
        unit="cabeças / kg",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        df = _inject(df, especie=kwargs.get("especie"), fonte="ibge_abate")
        return _inject(df, localidade_cod=F.lit(None).cast("long"))


class PecuariaMunicipalDataset(BaseDataset):
    """pecuaria_municipal: IBGE PPM herd/production
    (ref: agrobr/datasets/pecuaria_municipal.py; nivel param selects
    brasil/uf/municipio aggregation level)."""

    name = "pecuaria_municipal"
    contract_name = "ibge.ppm"
    date_col = "ano"
    filter_params = ("especie", "ano", "localidade")
    info = DatasetInfo(
        name="pecuaria_municipal",
        description="Pecuária municipal (rebanho/produção) por ano",
        products=("bovinos", "suinos", "galinaceos", "leite", "ovos"),
        update_frequency="yearly",
        typical_latency="Y+1",
        source_institution="IBGE",
        min_date="1974-01-01",
        unit="cabeças / mil litros / mil dúzias",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        df = _inject(df, especie=kwargs.get("especie"), fonte="ibge_ppm")
        return _inject(df, localidade_cod=F.lit(None).cast("long"))


class CensoAgropecuarioDataset(BaseDataset):
    """censo_agropecuario: IBGE agricultural census themes
    (ref: agrobr/datasets/censo_agropecuario.py — fetch is by `tema`,
    not produto)."""

    name = "censo_agropecuario"
    contract_name = "ibge.censo_agro"
    date_col = "ano"
    filter_params = ("tema", "ano", "localidade")
    info = DatasetInfo(
        name="censo_agropecuario",
        description="Censo agropecuário por tema/categoria/variável",
        products=("estabelecimentos", "area", "pessoal", "maquinas"),
        update_frequency="decennial",
        typical_latency="Y+2",
        source_institution="IBGE",
        min_date="2006-01-01",
        unit="varies",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        df = _inject(df, tema=kwargs.get("tema"), fonte="ibge_censo_agro")
        return _inject(df, localidade_cod=F.lit(None).cast("long"))


class CadastroRuralDataset(BaseDataset):
    """cadastro_rural: SICAR rural-property registry; normalize
    upper-cases status/UF codes and defaults property type
    (ref: agrobr/datasets/cadastro_rural.py + sicar parser)."""

    name = "cadastro_rural"
    contract_name = "sicar.imoveis"
    date_col = "data_atualizacao"
    filter_params = ("uf", "status", "tipo")
    info = DatasetInfo(
        name="cadastro_rural",
        description="Imóveis rurais cadastrados (CAR)",
        update_frequency="monthly",
        typical_latency="M+0",
        source_institution="SFB/SICAR",
        min_date="2014-01-01",
        unit="ha",
    )

    def normalize(self, df: DataFrame, **kwargs) -> DataFrame:
        if "status" in df.columns:
            df = df.withColumn("status", F.upper(F.trim("status")))
        if "uf" in df.columns:
            df = df.withColumn("uf", F.upper(F.trim("uf")))
        # tipo/condicao have sane defaults; modulos_fiscais and
        # cod_municipio_ibge are NOT NULL in sicar.imoveis, so the
        # source must supply them — injecting nulls would just trade a
        # missing-column failure for a null-violation failure.
        return _inject(df, tipo="IRU", condicao=F.lit(None).cast("string"))


SEMANTIC_DATASETS: dict[str, type[BaseDataset]] = {
    cls.name: cls
    for cls in (
        ProducaoAnualDataset,
        EstimativaSafraDataset,
        BalancoDataset,
        CreditoRuralDataset,
        ExportacaoDataset,
        FertilizanteDataset,
        CustoProducaoDataset,
        AbateTrimestralDataset,
        PecuariaMunicipalDataset,
        CensoAgropecuarioDataset,
        CadastroRuralDataset,
    )
}
