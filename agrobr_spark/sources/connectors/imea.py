"""IMEA connector: Mato Grosso quotation JSON → typed rows.

Reference: agrobr/imea/parser.py:15-55 (IMEA_COLUMNS_MAP rename,
cadeia_id → chain name, numeric valor/variacao, drop id noise, sort)
and imea/models.py:5-51.
"""

from __future__ import annotations

import json
from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import (
    register_connector,
    rename_existing,
    rows_df,
)

IMEA_COLUMNS_MAP: dict[str, str] = {
    "Localidade": "localidade",
    "Valor": "valor",
    "Variacao": "variacao",
    "Safra": "safra",
    "IndicadorFinalId": "indicador_id",
    "CadeiaId": "cadeia_id",
    "DataPublicacao": "data_publicacao",
    "TipoLocalidadeId": "tipo_localidade_id",
    "UnidadeSigla": "unidade",
    "UnidadeDescricao": "unidade_descricao",
}

CADEIA_NAMES: dict[str, str] = {
    "1": "algodao",
    "2": "bovinocultura",
    "3": "milho",
    "4": "soja",
    "5": "conjuntura",
    "7": "suinocultura",
    "8": "leite",
}

_DROP = ("cadeia_id", "indicador_id", "tipo_localidade_id")


def cotacoes_columns(df: DataFrame) -> DataFrame:
    df = rename_existing(df, IMEA_COLUMNS_MAP)
    if "cadeia_id" in df.columns:
        cd = F.col("cadeia_id").try_cast("long").cast("string")
        names = F.create_map(*[F.lit(x) for x in chain.from_iterable(CADEIA_NAMES.items())])
        df = df.withColumn("cadeia", F.coalesce(F.element_at(names, cd), F.lit("")))
    for c in ("valor", "variacao"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("double"))
    return df.drop(*[c for c in _DROP if c in df.columns])


@register_connector("imea.cotacoes")
def read_cotacoes(
    spark: SparkSession, payload: str | bytes | list[dict]
) -> DataFrame:
    if isinstance(payload, (str, bytes)):
        payload = json.loads(payload)
    if not payload:
        raise ValueError("imea: empty quotation response")
    header = sorted({k for rec in payload for k in rec})
    rows = [[None if rec.get(k) is None else str(rec.get(k)) for k in header]
            for rec in payload]
    df = cotacoes_columns(rows_df(spark, header, rows))
    sort_cols = [c for c in ("cadeia", "localidade", "unidade") if c in df.columns]
    return df.orderBy(*sort_cols) if sort_cols else df
