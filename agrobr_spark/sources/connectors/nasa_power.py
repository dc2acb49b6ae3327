"""NASA POWER connector: the daily-point JSON → long weather rows.

Reference: agrobr/nasa_power/parser.py:17-87 (properties.parameter
pivot {param: {yyyymmdd: value}} → one row per date, -999 sentinel →
null, known-parameter rename, date sort) and nasa_power/models.py:48-58
(COLUNAS_MAP, SENTINEL).

The JSON pivot is driver-side (one small payload per lat/lon request);
sentinel nulling and typing are Spark expressions so the same
``clima_columns`` applies to a pre-landed distributed table of many
station-days.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector

COLUNAS_MAP: dict[str, str] = {
    "T2M": "temp_media",
    "T2M_MAX": "temp_max",
    "T2M_MIN": "temp_min",
    "PRECTOTCORR": "precip_mm",
    "RH2M": "umidade_rel",
    "ALLSKY_SFC_SW_DWN": "radiacao_mj",
    "WS2M": "vento_ms",
}

SENTINEL = -999.0


def clima_columns(df: DataFrame) -> DataFrame:
    """Sentinel → null + double typing for every known measure."""
    for c in COLUNAS_MAP.values():
        if c in df.columns:
            col = F.col(c).try_cast("double")
            df = df.withColumn(c, F.when(col == SENTINEL, None).otherwise(col))
    return df


@register_connector("nasa_power.daily")
def read_daily(
    spark: SparkSession,
    payload: str | bytes | dict,
    lat: float = 0.0,
    lon: float = 0.0,
    uf: str = "",
) -> DataFrame:
    if isinstance(payload, (str, bytes)):
        payload = json.loads(payload)
    parameters = payload.get("properties", {}).get("parameter", {})
    if not parameters:
        raise ValueError("nasa_power: no properties.parameter in payload")

    dates: dict[str, dict[str, float | None]] = {}
    for nasa_param, daily in parameters.items():
        col = COLUNAS_MAP.get(nasa_param)
        if col is None:  # unknown parameter — reference drops it
            continue
        for date_str, value in daily.items():
            dates.setdefault(date_str, {})[col] = value

    measure_cols = [c for c in COLUNAS_MAP.values()]
    rows = []
    for date_str in sorted(dates):
        if len(date_str) != 8 or not date_str.isdigit():
            continue
        vals = dates[date_str]
        rows.append(
            (f"{date_str[:4]}-{date_str[4:6]}-{date_str[6:8]}", lat, lon, uf)
            + tuple(vals.get(c) for c in measure_cols)
        )
    schema = "data string, lat double, lon double, uf string, " + ", ".join(
        f"{c} double" for c in measure_cols
    )
    df = spark.createDataFrame(rows, schema)
    df = df.withColumn("data", F.col("data").cast("date"))
    return clima_columns(df)
