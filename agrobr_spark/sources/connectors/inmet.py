"""INMET connector: hourly station observations JSON → typed rows.

Reference: agrobr/inmet/parser.py:14-91 (COLUNAS_HORARIAS rename,
-9999 sentinel → null on every numeric, drop rows with unparseable
data, sort by estacao/data/hora).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import (
    register_connector,
    rename_existing,
    rows_df,
)

COLUNAS_HORARIAS: dict[str, str] = {
    "DT_MEDICAO": "data",
    "HR_MEDICAO": "hora_utc",
    "CD_ESTACAO": "estacao",
    "UF": "uf",
    "TEM_INS": "temperatura",
    "TEM_MAX": "temperatura_max",
    "TEM_MIN": "temperatura_min",
    "UMD_INS": "umidade",
    "UMD_MAX": "umidade_max",
    "UMD_MIN": "umidade_min",
    "CHUVA": "precipitacao_mm",
    "PRE_INS": "pressao_hpa",
    "VEN_VEL": "vento_ms",
    "VEN_DIR": "vento_dir",
    "VEN_RAJ": "vento_rajada_ms",
    "RAD_GLO": "radiacao_kj_m2",
    "PTO_INS": "ponto_orvalho",
}

COLUNAS_NUMERICAS = [
    v for k, v in COLUNAS_HORARIAS.items()
    if v not in ("data", "hora_utc", "estacao", "uf")
]

SENTINEL = -9999.0


def observacoes_columns(df: DataFrame) -> DataFrame:
    df = rename_existing(df, COLUNAS_HORARIAS)
    for c in COLUNAS_NUMERICAS:
        if c in df.columns:
            col = F.col(c).try_cast("double")
            df = df.withColumn(c, F.when(col == SENTINEL, None).otherwise(col))
    if "data" in df.columns:
        df = df.withColumn("data", F.col("data").try_cast("date")).filter(
            F.col("data").isNotNull()
        )
    return df


@register_connector("inmet.observacoes")
def read_observacoes(
    spark: SparkSession, payload: str | bytes | list[dict]
) -> DataFrame:
    if isinstance(payload, (str, bytes)):
        payload = json.loads(payload)
    if not payload:
        raise ValueError("inmet: empty observation list")
    header = sorted({k for rec in payload for k in rec})
    rows = [[None if rec.get(k) is None else str(rec.get(k)) for k in header]
            for rec in payload]
    df = observacoes_columns(rows_df(spark, header, rows))
    return df.orderBy("estacao", "data", "hora_utc")
