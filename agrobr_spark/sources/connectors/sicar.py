"""SICAR connector: rural-property registry CSV pages → contract shape.

Reference: agrobr/alt/sicar/parser.py:17-80 (multi-page concat,
required-column gate, rename, timestamp/numeric typing, upper-case
status/UF/tipo hygiene). Feeds the ``sicar.imoveis`` contract /
``cadastro_rural`` dataset.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import (
    csv_text_rows,
    decode_csv,
    register_connector,
    rename_existing,
    rows_df,
)

RENAME_MAP: dict[str, str] = {
    "status_imovel": "status",
    "dat_criacao": "data_criacao",
    "area": "area_ha",
    "m_fiscal": "modulos_fiscais",
    "tipo_imovel": "tipo",
}

COLUNAS_IMOVEIS = [
    "cod_imovel", "status", "data_criacao", "data_atualizacao", "area_ha",
    "condicao", "uf", "municipio", "cod_municipio_ibge", "modulos_fiscais",
    "tipo",
]

_REQUIRED = {"cod_imovel", "status_imovel", "dat_criacao", "area", "uf"}


def imoveis_columns(df: DataFrame) -> DataFrame:
    missing = _REQUIRED - set(df.columns)
    if missing:
        raise ValueError(f"sicar: required columns missing: {missing}")
    df = rename_existing(df, RENAME_MAP)
    df = (
        df.withColumn("data_criacao", F.try_to_timestamp("data_criacao"))
        .withColumn("area_ha", F.col("area_ha").try_cast("double"))
        .withColumn("uf", F.upper(F.trim(F.coalesce(F.col("uf"), F.lit("")))))
        .withColumn("status", F.upper(F.trim(F.coalesce(F.col("status"), F.lit("")))))
        .withColumn("cod_imovel", F.trim(F.coalesce(F.col("cod_imovel"), F.lit(""))))
    )
    if "data_atualizacao" in df.columns:
        df = df.withColumn("data_atualizacao", F.try_to_timestamp("data_atualizacao"))
    if "cod_municipio_ibge" in df.columns:
        df = df.withColumn("cod_municipio_ibge", F.col("cod_municipio_ibge").try_cast("long"))
    if "modulos_fiscais" in df.columns:
        df = df.withColumn("modulos_fiscais", F.col("modulos_fiscais").try_cast("double"))
    if "tipo" in df.columns:
        df = df.withColumn("tipo", F.upper(F.trim(F.coalesce(F.col("tipo"), F.lit("")))))
    if "municipio" in df.columns:
        df = df.withColumn("municipio", F.trim(F.coalesce(F.col("municipio"), F.lit(""))))
    if "condicao" in df.columns:
        df = df.withColumn("condicao", F.trim(F.coalesce(F.col("condicao"), F.lit(""))))
    return df.select(*[c for c in COLUNAS_IMOVEIS if c in df.columns])


@register_connector("sicar.imoveis")
def read_imoveis(
    spark: SparkSession, pages: list[bytes | str] | bytes | str
) -> DataFrame:
    if isinstance(pages, (bytes, str)):
        pages = [pages]
    dfs = []
    for page in pages:
        header, rows = csv_text_rows(decode_csv(page), sep=",")
        if rows:
            dfs.append(rows_df(spark, header, rows))
    if not dfs:
        raise ValueError("sicar: no rows in any page")
    df = dfs[0]
    for other in dfs[1:]:
        df = df.unionByName(other, allowMissingColumns=True)
    return imoveis_columns(df)
