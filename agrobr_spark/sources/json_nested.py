"""S5: nested-JSON REST payload → rows.

The canonical hard case is NASA POWER's ``properties.parameter.
{PARAM}.{YYYYMMDD} -> value`` nesting (ref: agrobr/nasa_power/
parser.py:17-86); SIDRA/INMET/USDA payloads are flatter variants.

Spark-native: parse with an explicit MapType schema, then TWO explodes
(param → date→value map, then date → value) — the pivot happens on
executors, not in a driver loop. ``yyyymmdd`` keys become dates via
``to_date(key, 'yyyyMMdd')``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def param_date_value_rows(
    spark: SparkSession,
    payloads: list[str] | DataFrame,
    param_path: str = "properties.parameter",
) -> DataFrame:
    """Explode ``{param: {yyyymmdd: value}}`` into
    (parametro, data, valor) rows.

    ``payloads``: raw JSON strings (one per API response) or a
    DataFrame with a ``json`` string column. Sentinel -9999 → NULL
    (F8, ref: nasa_power/parser.py:49-52).
    """
    if isinstance(payloads, list):
        src = spark.createDataFrame([(p,) for p in payloads], ["json"])
    else:
        src = payloads
    # pull the nested object out as a map<string, map<string, double>>
    inner = F.from_json(
        F.get_json_object(F.col("json"), f"$.{param_path}"),
        "map<string, map<string, double>>",
    )
    return (
        src.select(F.explode(inner).alias("parametro", "serie"))
        .select("parametro", F.explode("serie").alias("data_raw", "valor"))
        .select(
            "parametro",
            F.to_date("data_raw", "yyyyMMdd").alias("data"),
            F.nullif(F.col("valor"), F.lit(-9999.0)).alias("valor"),
        )
    )
