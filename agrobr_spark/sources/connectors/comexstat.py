"""COMEXSTAT connector: the bulk EXP/IMP NCM CSVs → contract shape.

Reference: agrobr/comexstat/parser.py:14-100 (COLUNAS_MAP rename, NCM
zero-pad to 8 + prefix filter, UF equality filter, numeric coercions).

Scale note: the real EXP_<year>.csv files are multi-GB — the
``exportacao_columns`` transformation applies to a distributed
``spark.read.csv`` scan unchanged; NCM-prefix and UF filters are
Catalyst predicates pushed into the scan.
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

COMEXSTAT_RENAME: dict[str, str] = {
    "CO_ANO": "ano",
    "CO_MES": "mes",
    "CO_NCM": "ncm",
    "CO_UNID": "cod_unidade",
    "CO_PAIS": "cod_pais",
    "SG_UF_NCM": "uf",
    "CO_VIA": "cod_via",
    "CO_URF": "cod_porto",
    "QT_ESTAT": "qtd_estatistica",
    "KG_LIQUIDO": "kg_liquido",
    "VL_FOB": "valor_fob_usd",
}


def exportacao_columns(
    df: DataFrame, ncm: str | None = None, uf: str | None = None
) -> DataFrame:
    df = rename_existing(df, COMEXSTAT_RENAME)
    if "ncm" in df.columns:
        df = df.withColumn("ncm", F.lpad(F.col("ncm").cast("string"), 8, "0"))
        if ncm:
            df = df.filter(F.col("ncm").startswith(ncm))
    if uf and "uf" in df.columns:
        df = df.filter(F.col("uf") == uf.upper())
    for c in ("kg_liquido", "valor_fob_usd", "qtd_estatistica"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("double"))
    for c in ("ano", "mes"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("long"))
    return df


@register_connector("comexstat.exportacao")
def read_exportacao(
    spark: SparkSession,
    payload: bytes | str,
    ncm: str | None = None,
    uf: str | None = None,
) -> DataFrame:
    header, rows = csv_text_rows(decode_csv(payload))
    return exportacao_columns(rows_df(spark, header, rows), ncm=ncm, uf=uf)
