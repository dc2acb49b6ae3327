"""USDA PSD connector: production/supply/distribution JSON → rows.

Reference: agrobr/usda/parser.py:15-71 (PSD_COLUMNS_MAP rename,
attribute_id → attribute_br pt-BR label, commodity code → name, drop
calendar/unit-id noise, sort) and usda/models.py:35-102.
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

PSD_COLUMNS_MAP: dict[str, str] = {
    "CommodityCode": "commodity_code",
    "CommodityDescription": "commodity",
    "CountryCode": "country_code",
    "CountryName": "country",
    "MarketYear": "market_year",
    "CalendarYear": "calendar_year",
    "Month": "month",
    "AttributeId": "attribute_id",
    "AttributeDescription": "attribute",
    "UnitId": "unit_id",
    "UnitDescription": "unit",
    "Value": "value",
}

PSD_ATTRIBUTES: dict[str, str] = {
    "4": "area_colhida",
    "28": "estoque_inicial",
    "57": "consumo_domestico",
    "84": "estoque_final",
    "88": "exportacao",
    "125": "producao",
    "130": "importacao",
    "176": "oferta_total",
    "184": "produtividade",
}

PSD_COMMODITY_NAMES: dict[str, str] = {
    "2222000": "soja",
    "0440000": "milho",
    "0410000": "trigo",
    "0422110": "arroz",
    "2631000": "algodao",
    "0612000": "acucar",
    "4233000": "farelo_soja",
    "4232000": "oleo_soja",
}

_DROP = ("calendar_year", "month", "attribute_id", "unit_id")


def _lit_map(d: dict[str, str]):
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])


def psd_columns(df: DataFrame) -> DataFrame:
    df = rename_existing(df, PSD_COLUMNS_MAP)
    if "commodity_code" in df.columns:
        code = F.col("commodity_code").cast("string")
        df = df.withColumn(
            "commodity", F.coalesce(F.element_at(_lit_map(PSD_COMMODITY_NAMES), code), code)
        )
    if "attribute_id" in df.columns:
        df = df.withColumn(
            "attribute_br",
            F.coalesce(
                F.element_at(
                    _lit_map(PSD_ATTRIBUTES), F.col("attribute_id").cast("string")
                ),
                F.lit(""),
            ),
        )
    if "market_year" in df.columns:
        df = df.withColumn("market_year", F.col("market_year").try_cast("long"))
    if "value" in df.columns:
        df = df.withColumn("value", F.col("value").try_cast("double"))
    return df.drop(*[c for c in _DROP if c in df.columns])


@register_connector("usda.psd")
def read_psd(
    spark: SparkSession, payload: str | bytes | list[dict]
) -> DataFrame:
    if isinstance(payload, (str, bytes)):
        payload = json.loads(payload)
    if not payload:
        raise ValueError("usda: empty PSD response")
    header = sorted({k for rec in payload for k in rec})
    rows = [[None if rec.get(k) is None else str(rec.get(k)) for k in header]
            for rec in payload]
    df = psd_columns(rows_df(spark, header, rows))
    sort_cols = [c for c in ("market_year", "country_code", "attribute") if c in df.columns]
    return df.orderBy(*sort_cols) if sort_cols else df
