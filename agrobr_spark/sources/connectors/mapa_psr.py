"""MAPA-PSR connector: rural-insurance policy/claim CSVs → typed rows.

Reference: agrobr/alt/mapa_psr/parser.py:16-100 + models.py:46-99
(encoding chain incl. latin-1 — the published CSVs are windows-1252 —
sep autodetect, PII/geo column drop, pt-BR decimal comma floats).
The F12 encoding chain (normalize/encoding.py) does the decode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.functions import parse_ptbr_number
from agrobr_spark.sources.connectors._base import (
    csv_text_rows,
    decode_csv,
    register_connector,
    rename_existing,
    rows_df,
)

COLUNAS_CSV: dict[str, str] = {
    "ANO_APOLICE": "ano_apolice",
    "NR_APOLICE": "nr_apolice",
    "SG_UF_PROPRIEDADE": "uf",
    "NM_MUNICIPIO_PROPRIEDADE": "municipio",
    "CD_GEOCMU": "cd_ibge",
    "NM_CULTURA_GLOBAL": "cultura",
    "NM_CLASSIF_PRODUTO": "classificacao",
    "NR_AREA_TOTAL": "area_total",
    "VL_PREMIO_LIQUIDO": "valor_premio",
    "VL_SUBVENCAO_FEDERAL": "valor_subvencao",
    "VL_LIMITE_GARANTIA": "valor_limite_garantia",
    "VALOR_INDENIZACAO": "valor_indenizacao",
    "VALOR_INDENIZAÇÃO": "valor_indenizacao",
    "EVENTO_PREPONDERANTE": "evento",
    "NR_PRODUTIVIDADE_ESTIMADA": "produtividade_estimada",
    "NR_PRODUTIVIDADE_SEGURADA": "produtividade_segurada",
    "NivelDeCobertura": "nivel_cobertura",
    "PE_TAXA": "taxa",
    "NM_RAZAO_SOCIAL": "seguradora",
}

COLUNAS_FLOAT = frozenset({
    "area_total", "valor_premio", "valor_subvencao",
    "valor_limite_garantia", "valor_indenizacao",
    "produtividade_estimada", "produtividade_segurada",
    "nivel_cobertura", "taxa",
})

_OUT = [
    "ano_apolice", "nr_apolice", "uf", "municipio", "cd_ibge", "cultura",
    "classificacao", "area_total", "valor_premio", "valor_subvencao",
    "valor_limite_garantia", "valor_indenizacao", "evento",
    "produtividade_estimada", "produtividade_segurada", "nivel_cobertura",
    "taxa", "seguradora",
]


def apolices_columns(
    df: DataFrame,
    cultura: str | None = None,
    uf: str | None = None,
    ano: int | None = None,
) -> DataFrame:
    df = rename_existing(df, COLUNAS_CSV)
    for c in COLUNAS_FLOAT:
        if c in df.columns:
            # '-' placeholder and pt-BR decimal comma → null/double
            # (double, not decimal: reference emits float64)
            df = df.withColumn(c, parse_ptbr_number(F.col(c)).cast("double"))
    if "ano_apolice" in df.columns:
        df = df.withColumn("ano_apolice", F.col("ano_apolice").try_cast("long"))
        if ano is not None:
            df = df.filter(F.col("ano_apolice") == ano)
    if cultura and "cultura" in df.columns:
        df = df.filter(F.lower("cultura") == cultura.lower())
    if uf and "uf" in df.columns:
        df = df.filter(F.upper("uf") == uf.upper())
    return df.select(*[c for c in _OUT if c in df.columns])


@register_connector("mapa_psr.apolices")
def read_apolices(
    spark: SparkSession,
    payload: bytes | str,
    cultura: str | None = None,
    uf: str | None = None,
    ano: int | None = None,
) -> DataFrame:
    header, rows = csv_text_rows(decode_csv(payload))
    return apolices_columns(
        rows_df(spark, header, rows), cultura=cultura, uf=uf, ano=ano
    )
