"""IBGE SIDRA connector: the generic table API response → typed rows.

Reference: agrobr/ibge/client.py:237-266 (parse_sidra_response — fixed
positional rename NC/NN/MC/MN/V/D1..D4 → semantic names, valor coerced
numeric) and agrobr/ibge/api.py:63-202 (PAM/PPM/LSPA/abate/censo all
share this one response shape).

The rename map is applied blindly, exactly like the reference: which
D-slot holds year vs product depends on the SIDRA query's
classification order, and downstream dataset adapters re-map when
needed. ``valor`` is the only typed column ('..'/'-' sentinel → null
via try_cast).
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

SIDRA_RENAME: dict[str, str] = {
    "NC": "nivel_territorial_cod",
    "NN": "nivel_territorial",
    "MC": "localidade_cod",
    "MN": "localidade",
    "V": "valor",
    "D1C": "ano_cod",
    "D1N": "ano",
    "D2C": "variavel_cod",
    "D2N": "variavel",
    "D3C": "produto_cod",
    "D3N": "produto",
    "D4C": "classificacao_cod",
    "D4N": "classificacao",
}


def sidra_columns(
    df: DataFrame, rename: dict[str, str] | None = None
) -> DataFrame:
    """Native SIDRA column names → semantic names + numeric valor.
    Pure Catalyst expressions — composes with a distributed scan."""
    mapping = dict(SIDRA_RENAME)
    if rename:
        mapping.update(rename)
    df = rename_existing(df, mapping)
    if "valor" in df.columns:
        df = df.withColumn("valor", F.col("valor").try_cast("double"))
    return df


@register_connector("ibge.sidra")
def read_sidra_csv(
    spark: SparkSession,
    payload: bytes | str,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    header, rows = csv_text_rows(decode_csv(payload), sep=",")
    return sidra_columns(rows_df(spark, header, rows), rename)
