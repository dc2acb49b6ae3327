"""UN Comtrade connector: trade records + bilateral mirror compare.

Reference: agrobr/comtrade/parser.py:14-85 (COLUNAS_MAP rename,
numeric coercion, volume_ton derivation, periodo → ano/mes split,
stable output column order) and :88-155 (parse_mirror: outer join on
(periodo, hs_code), reporter/partner diffs and ratios — the
discrepancy dataset behind the J2 full-outer mirror query);
models.py:116-160 (output column lists).

``trade_columns`` / ``mirror_columns`` are pure DataFrame
transformations: at scale they compose with a distributed JSON scan of
archived API responses; the mirror join shuffles both sides once on
(periodo, hs_code) — or broadcasts, when one flow is a single
product slice.
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

COLUNAS_MAP: dict[str, str] = {
    "period": "periodo",
    "reporterCode": "reporter_code",
    "reporterISO": "reporter_iso",
    "reporterDesc": "reporter",
    "partnerCode": "partner_code",
    "partnerISO": "partner_iso",
    "partnerDesc": "partner",
    "flowCode": "fluxo_code",
    "flowDesc": "fluxo",
    "cmdCode": "hs_code",
    "cmdDesc": "produto_desc",
    "netWgt": "peso_liquido_kg",
    "grossWgt": "peso_bruto_kg",
    "fobvalue": "valor_fob_usd",
    "cifvalue": "valor_cif_usd",
    "primaryValue": "valor_primario_usd",
    "qty": "quantidade",
    "qtyUnitAbbr": "unidade_qtd",
    "aggrLevel": "nivel_hs",
}

_NUMERIC = (
    "peso_liquido_kg",
    "peso_bruto_kg",
    "valor_fob_usd",
    "valor_cif_usd",
    "valor_primario_usd",
    "quantidade",
)

COLUNAS_SAIDA = (
    "periodo", "ano", "mes",
    "reporter_code", "reporter_iso", "reporter",
    "partner_code", "partner_iso", "partner",
    "fluxo_code", "fluxo", "hs_code", "produto_desc", "nivel_hs",
    "peso_liquido_kg", "peso_bruto_kg", "volume_ton",
    "valor_fob_usd", "valor_cif_usd", "valor_primario_usd",
    "quantidade", "unidade_qtd",
)

COLUNAS_MIRROR = (
    "periodo", "ano", "mes", "hs_code", "produto_desc",
    "reporter_iso", "partner_iso",
    "peso_liquido_kg_reporter", "valor_fob_usd_reporter", "volume_ton_reporter",
    "peso_liquido_kg_partner", "valor_fob_usd_partner",
    "valor_cif_usd_partner", "volume_ton_partner",
    "diff_peso_kg", "diff_valor_fob_usd", "ratio_valor", "ratio_peso",
)


def _ano_mes(df: DataFrame) -> DataFrame:
    periodo = F.col("periodo").cast("string")
    return df.withColumns(
        {
            "ano": F.substring(periodo, 1, 4).try_cast("int"),
            "mes": F.when(
                F.length(periodo) >= 6, F.substring(periodo, 5, 2)
            ).try_cast("int"),
        }
    )


def trade_columns(df: DataFrame) -> DataFrame:
    """Native API records → stable COLUNAS_SAIDA shape
    (ref parser.py:46-85)."""
    df = rename_existing(df, COLUNAS_MAP)
    df = df.withColumn("periodo", F.col("periodo").cast("string"))
    for c in _NUMERIC:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast("double"))
    vol = (
        (F.col("peso_liquido_kg") / 1000.0)
        if "peso_liquido_kg" in df.columns
        else F.lit(None).cast("double")
    )
    df = _ano_mes(df.withColumn("volume_ton", vol))
    # back-fill absent columns with their CONTRACT type, not string —
    # otherwise unions/parquet appends across payloads with different
    # key sets hit schema conflicts
    _types = {c: "double" for c in _NUMERIC}
    _types.update({"volume_ton": "double", "ano": "int", "mes": "int"})
    for c in COLUNAS_SAIDA:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(_types.get(c, "string")))
    return df.select(*COLUNAS_SAIDA).orderBy(
        "periodo", "hs_code", "reporter_iso", "partner_iso"
    )


def mirror_columns(
    reporter_df: DataFrame,
    partner_df: DataFrame,
    reporter_iso: str,
    partner_iso: str,
) -> DataFrame:
    """Bilateral mirror: reporter exports vs partner imports, outer
    join on (periodo, hs_code), discrepancy diffs + ratios
    (ref parser.py:88-155)."""
    keys = ["periodo", "hs_code"]
    left = reporter_df.select(
        *keys,
        F.col("peso_liquido_kg").alias("peso_liquido_kg_reporter"),
        F.col("valor_fob_usd").alias("valor_fob_usd_reporter"),
        F.col("volume_ton").alias("volume_ton_reporter"),
        "produto_desc",
    )
    right = partner_df.select(
        *keys,
        F.col("peso_liquido_kg").alias("peso_liquido_kg_partner"),
        F.col("valor_fob_usd").alias("valor_fob_usd_partner"),
        F.col("valor_cif_usd").alias("valor_cif_usd_partner"),
        F.col("volume_ton").alias("volume_ton_partner"),
    )
    df = left.join(right, on=keys, how="full_outer")
    df = _ano_mes(df).withColumns(
        {
            "reporter_iso": F.lit(reporter_iso),
            "partner_iso": F.lit(partner_iso),
            "diff_peso_kg": F.col("peso_liquido_kg_reporter")
            - F.col("peso_liquido_kg_partner"),
            "diff_valor_fob_usd": F.col("valor_fob_usd_reporter")
            - F.col("valor_fob_usd_partner"),
            "ratio_valor": F.col("valor_fob_usd_reporter")
            / F.nullif(F.col("valor_cif_usd_partner"), F.lit(0.0)),
            "ratio_peso": F.col("peso_liquido_kg_reporter")
            / F.nullif(F.col("peso_liquido_kg_partner"), F.lit(0.0)),
        }
    )
    return df.select(*COLUNAS_MIRROR).orderBy("periodo", "hs_code")


def _records_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    header = sorted({k for rec in records for k in rec})
    rows = [
        [None if rec.get(k) is None else str(rec.get(k)) for k in header]
        for rec in records
    ]
    return rows_df(spark, header, rows)


@register_connector("comtrade.comercio")
def read_trade(
    spark: SparkSession, payload: str | bytes | list[dict]
) -> DataFrame:
    """Decode one API response body (``{"data": [...]}`` or a bare
    record list) into COLUNAS_SAIDA shape."""
    if isinstance(payload, (str, bytes)):
        payload = json.loads(payload)
    if isinstance(payload, dict):
        payload = payload.get("data", [])
    if not payload:
        raise ValueError("comtrade: empty trade response")
    return trade_columns(_records_df(spark, payload))


@register_connector("comtrade.trade_mirror")
def read_mirror(
    spark: SparkSession,
    reporter_payload: str | bytes | list[dict],
    partner_payload: str | bytes | list[dict],
    reporter_iso: str = "BRA",
    partner_iso: str = "CHN",
) -> DataFrame:
    return mirror_columns(
        read_trade(spark, reporter_payload),
        read_trade(spark, partner_payload),
        reporter_iso,
        partner_iso,
    )
