"""BCB/SICOR connector: rural-credit JSON records → contract shape.

Reference: agrobr/bcb/parser.py:14-130 (COLUNAS_MAP covering both the
matriz-de-dados and the olinda response vocabularies, numeric
coercions, produto de-quoting/lowercase, finalidade default) and
bcb/models.py:11-89 (SICOR code→name dimension tables, unknown code →
"Desconhecido (<cd>)").

The SICOR dimensions are tiny static dicts → broadcast map lookups
via ``F.element_at(F.create_map(...))`` stay JVM-side.
"""

from __future__ import annotations

import json
from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import (
    register_connector,
    rename_coalescing,
    rows_df,
)

COLUNAS_MAP: dict[str, str] = {
    "Safra": "safra",
    "AnoEmissao": "ano_emissao",
    "MesEmissao": "mes_emissao",
    "cdUF": "cd_uf",
    "UF": "uf",
    "cdMunicipio": "cd_municipio",
    "Municipio": "municipio",
    "Produto": "produto",
    "Finalidade": "finalidade",
    "Fonte": "fonte_recurso",
    "Programa": "programa",
    "Valor": "valor",
    "AreaFinanciada": "area_financiada",
    "QtdContratos": "qtd_contratos",
    "VlrMedio": "valor_medio",
    "nomeUF": "uf",
    "nomeRegiao": "regiao",
    "nomeProduto": "produto",
    "cdEstado": "cd_uf",
    "VlCusteio": "valor",
    "AreaCusteio": "area_financiada",
    "QtdCusteio": "qtd_contratos",
    "VlInvestimento": "valor",
    "AreaInvestimento": "area_financiada",
    "QtdInvestimento": "qtd_contratos",
    "codIbge": "cd_municipio",
    "cdPrograma": "cd_programa",
    "cdSubPrograma": "cd_sub_programa",
    "cdFonteRecurso": "cd_fonte_recurso",
    "cdTipoSeguro": "cd_tipo_seguro",
    "cdModalidade": "cd_modalidade",
    "Atividade": "cd_atividade",
}

SICOR_PROGRAMAS: dict[str, str] = {
    "0001": "Pronaf",
    "0002": "Proger Rural",
    "0050": "Pronamp",
    "0070": "Funcafe",
    "0100": "Moderfrota",
    "0102": "Moderagro",
    "0104": "Prodecoop",
    "0106": "Moderinfra",
    "0108": "ABC",
    "0110": "Inovagro",
    "0112": "PCA",
    "0114": "Pronamp Investimento",
    "0150": "Procap-Agro",
    "0152": "RenovAgro",
    "0156": "Moderagro/Moderfrota",
    "0200": "Proirriga",
    "0999": "Sem programa especifico",
}

SICOR_FONTES_RECURSO: dict[str, str] = {
    "0201": "Recursos obrigatorios (MCR 6.2)",
    "0300": "Poupanca rural livre",
    "0303": "Poupanca rural controlados",
    "0400": "BNDES equalizavel",
    "0402": "BNDES/Finame equalizavel",
    "0430": "LCA",
    "0501": "FNO",
    "0502": "FNE",
    "0503": "FCO",
    "0505": "Funcafe",
    "0800": "Recursos livres",
}

SICOR_TIPOS_SEGURO: dict[str, str] = {
    "1": "Proagro",
    "2": "Sem seguro",
    "3": "Seguro privado",
    "9": "Nao se aplica",
}

SICOR_MODALIDADES: dict[str, str] = {
    "01": "Individual",
    "02": "Coletiva com garantia individual",
    "03": "Coletiva",
}

SICOR_ATIVIDADES: dict[str, str] = {"1": "Agricola", "2": "Pecuaria"}

# cd column -> (name column, code dict)
ENRIQUECIMENTO: dict[str, tuple[str, dict[str, str]]] = {
    "cd_programa": ("programa", SICOR_PROGRAMAS),
    "cd_fonte_recurso": ("fonte_recurso", SICOR_FONTES_RECURSO),
    "cd_tipo_seguro": ("tipo_seguro", SICOR_TIPOS_SEGURO),
    "cd_modalidade": ("modalidade", SICOR_MODALIDADES),
    "cd_atividade": ("atividade", SICOR_ATIVIDADES),
}


def _code_map(d: dict[str, str]):
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])


def credito_columns(df: DataFrame, finalidade: str = "custeio") -> DataFrame:
    # COLUNAS_MAP has duplicate targets (UF/nomeUF → uf, Valor/VlCusteio/
    # VlInvestimento → valor, …): a payload carrying both vocabularies
    # must coalesce, not produce duplicate column names.
    df = rename_coalescing(df, COLUNAS_MAP)
    for c in ("valor", "area_financiada", "valor_medio"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("double"))
    for c in ("ano_emissao", "mes_emissao", "qtd_contratos"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("long"))
    if "produto" in df.columns:
        df = df.withColumn(
            "produto", F.trim(F.lower(F.trim(F.regexp_replace("produto", '"', ""))))
        )
    if "uf" in df.columns:
        df = df.withColumn("uf", F.trim(F.upper("uf")))
    if "municipio" in df.columns:
        df = df.withColumn("municipio", F.trim("municipio"))
    if "finalidade" not in df.columns:
        df = df.withColumn("finalidade", F.lit(finalidade))
    for cd_col, (nome_col, codes) in ENRIQUECIMENTO.items():
        if cd_col in df.columns:
            cd = F.col(cd_col).cast("string")
            df = df.withColumn(
                nome_col,
                F.coalesce(
                    F.element_at(_code_map(codes), cd),
                    F.concat(F.lit("Desconhecido ("), cd, F.lit(")")),
                ),
            )
    return df


@register_connector("bcb.credito_rural")
def read_credito_rural(
    spark: SparkSession,
    payload: str | bytes | list[dict],
    finalidade: str = "custeio",
) -> DataFrame:
    if isinstance(payload, (str, bytes)):
        payload = json.loads(payload)
    if not payload:
        raise ValueError("bcb: empty SICOR response")
    header = sorted({k for rec in payload for k in rec})
    rows = [[None if rec.get(k) is None else str(rec.get(k)) for k in header]
            for rec in payload]
    df = credito_columns(rows_df(spark, header, rows), finalidade=finalidade)
    sort_cols = [c for c in ("safra", "uf", "municipio", "produto") if c in df.columns]
    return df.orderBy(*sort_cols) if sort_cols else df
