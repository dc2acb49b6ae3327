"""INPE Queimadas connector: fire-focus CSV → typed rows.

Reference: agrobr/queimadas/parser.py:17-82 + queimadas/models.py
(timestamp split into data/hora_gmt, estado name → UF sigla, bioma
canonical casing, numeric coercions, fixed output column order).
"""

from __future__ import annotations

from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import (
    csv_text_rows,
    decode_csv,
    register_connector,
    rows_df,
)

BIOMAS: dict[str, str] = {
    "amazonia": "Amazônia",
    "amazônia": "Amazônia",
    "cerrado": "Cerrado",
    "mata atlantica": "Mata Atlântica",
    "mata atlântica": "Mata Atlântica",
    "caatinga": "Caatinga",
    "pampa": "Pampa",
    "pantanal": "Pantanal",
}

UF_ESTADO: dict[str, str] = {
    "ACRE": "AC", "ALAGOAS": "AL", "AMAPÁ": "AP", "AMAZONAS": "AM",
    "BAHIA": "BA", "CEARÁ": "CE", "DISTRITO FEDERAL": "DF",
    "ESPÍRITO SANTO": "ES", "GOIÁS": "GO", "MARANHÃO": "MA",
    "MATO GROSSO": "MT", "MATO GROSSO DO SUL": "MS", "MINAS GERAIS": "MG",
    "PARÁ": "PA", "PARAÍBA": "PB", "PARANÁ": "PR", "PERNAMBUCO": "PE",
    "PIAUÍ": "PI", "RIO DE JANEIRO": "RJ", "RIO GRANDE DO NORTE": "RN",
    "RIO GRANDE DO SUL": "RS", "RONDÔNIA": "RO", "RORAIMA": "RR",
    "SANTA CATARINA": "SC", "SÃO PAULO": "SP", "SERGIPE": "SE",
    "TOCANTINS": "TO",
}

COLUNAS_SAIDA = [
    "data", "hora_gmt", "lat", "lon", "satelite", "municipio",
    "municipio_id", "estado", "bioma", "numero_dias_sem_chuva",
    "precipitacao", "risco_fogo", "frp",
]

_REQUIRED = {"lat", "lon", "data_hora_gmt", "satelite"}


def _lit_map(d: dict[str, str]):
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])


def focos_columns(df: DataFrame) -> DataFrame:
    missing = _REQUIRED - set(df.columns)
    if missing:
        raise ValueError(f"queimadas: required columns missing: {missing}")
    ts = F.try_to_timestamp(F.col("data_hora_gmt"))
    df = (
        df.withColumn("data", ts.cast("date"))
        .withColumn("hora_gmt", F.date_format(ts, "HH:mm"))
        .withColumn("lat", F.col("lat").try_cast("double"))
        .withColumn("lon", F.col("lon").try_cast("double"))
    )
    if "municipio_id" in df.columns:
        df = df.withColumn("municipio_id", F.col("municipio_id").try_cast("long"))
    if "estado" in df.columns:
        est = F.trim(F.upper(F.coalesce(F.col("estado"), F.lit(""))))
        df = df.withColumn(
            "uf", F.coalesce(F.element_at(_lit_map(UF_ESTADO), est), F.trim("estado"))
        )
    else:
        df = df.withColumn("uf", F.lit(""))
    if "bioma" in df.columns:
        key = F.lower(F.trim(F.coalesce(F.col("bioma"), F.lit(""))))
        df = df.withColumn(
            "bioma", F.coalesce(F.element_at(_lit_map(BIOMAS), key), F.trim("bioma"))
        )
    for c in ("numero_dias_sem_chuva", "precipitacao", "risco_fogo", "frp"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("double"))
    out = [c for c in COLUNAS_SAIDA if c in df.columns] + ["uf"]
    return df.select(*out)


@register_connector("queimadas.focos")
def read_focos(spark: SparkSession, payload: bytes | str) -> DataFrame:
    header, rows = csv_text_rows(decode_csv(payload), sep=",")
    return focos_columns(rows_df(spark, header, rows))
