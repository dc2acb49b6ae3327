"""ANTAQ connector: the yearly port-movement TXT triple → one joined
movement table.

Reference: agrobr/antaq/parser.py:19-170 + antaq/models.py:23-84
(column prune per file, pt-BR numeric peso/qt, carga ←left
atracacao ←left mercadoria join, final rename + ordering).

Spark-first: the joins ARE DataFrame joins — atracacao (~thousands of
berthing events) and mercadoria (a fixed commodity lookup) are small
relative to carga (one row per cargo item), so both get broadcast;
carga never shuffles. At the real yearly volume (millions of cargo
rows) this is exactly the plan you want.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.functions import parse_ptbr_number
from agrobr_spark.sources.connectors._base import (
    csv_text_rows,
    decode_csv,
    register_connector,
    rows_df,
)

COLUNAS_ATRACACAO = [
    "IDAtracacao",
    "Porto Atracação",
    "Complexo Portuário",
    "Tipo da Autoridade Portuária",
    "Data Atracação",
    "Data Desatracação",
    "Ano",
    "Mes",
    "Tipo de Navegação da Atracação",
    "Terminal",
    "Município",
    "UF",
    "SGUF",
    "Região Geográfica",
]

COLUNAS_CARGA = [
    "IDCarga",
    "IDAtracacao",
    "Origem",
    "Destino",
    "CDMercadoria",
    "Tipo Operação da Carga",
    "Tipo Navegação",
    "Natureza da Carga",
    "Sentido",
    "TEU",
    "QTCarga",
    "VLPesoCargaBruta",
]

COLUNAS_MERCADORIA = [
    "CDMercadoria",
    "Grupo de Mercadoria",
    "Mercadoria",
    "Nomenclatura Simplificada Mercadoria",
]

RENAME_FINAL: dict[str, str] = {
    "Ano": "ano",
    "Mes": "mes",
    "Data Atracação": "data_atracacao",
    "Porto Atracação": "porto",
    "Complexo Portuário": "complexo_portuario",
    "Terminal": "terminal",
    "Município": "municipio",
    "SGUF": "uf",
    "Região Geográfica": "regiao",
    "Tipo Navegação": "tipo_navegacao",
    "Natureza da Carga": "natureza_carga",
    "Sentido": "sentido",
    "Tipo Operação da Carga": "tipo_operacao",
    "CDMercadoria": "cd_mercadoria",
    "Nomenclatura Simplificada Mercadoria": "mercadoria",
    "Grupo de Mercadoria": "grupo_mercadoria",
    "Origem": "origem",
    "Destino": "destino",
    "VLPesoCargaBruta": "peso_bruto_ton",
    "QTCarga": "qt_carga",
    "TEU": "teu",
}

_FINAL_ORDER = [
    "ano", "mes", "data_atracacao", "tipo_navegacao", "tipo_operacao",
    "natureza_carga", "sentido", "porto", "complexo_portuario", "terminal",
    "municipio", "uf", "regiao", "cd_mercadoria", "mercadoria",
    "grupo_mercadoria", "origem", "destino", "peso_bruto_ton", "qt_carga",
    "teu",
]


def _read_txt(spark: SparkSession, payload: bytes | str, usecols: list[str]) -> DataFrame:
    header, rows = csv_text_rows(decode_csv(payload), sep=";")
    df = rows_df(spark, header, rows)
    keep = [c for c in usecols if c in df.columns]
    return df.select(*[F.col(f"`{c}`") for c in keep])


def parse_atracacao(spark: SparkSession, payload: bytes | str) -> DataFrame:
    return _read_txt(spark, payload, COLUNAS_ATRACACAO)


def parse_carga(spark: SparkSession, payload: bytes | str) -> DataFrame:
    df = _read_txt(spark, payload, COLUNAS_CARGA)
    if "VLPesoCargaBruta" in df.columns:
        # thousands '.' + decimal ',' (ref: antaq/parser.py:53-59)
        df = df.withColumn(
            "VLPesoCargaBruta",
            parse_ptbr_number(F.col("VLPesoCargaBruta")).cast("double"),
        )
    if "QTCarga" in df.columns:
        df = df.withColumn(
            "QTCarga",
            F.regexp_replace("QTCarga", ",", ".").try_cast("double"),
        )
    if "TEU" in df.columns:
        df = df.withColumn(
            "TEU", F.coalesce(F.col("TEU").try_cast("long"), F.lit(0))
        )
    return df


def parse_mercadoria(spark: SparkSession, payload: bytes | str) -> DataFrame:
    return _read_txt(spark, payload, COLUNAS_MERCADORIA)


def join_movimentacao(
    atracacao: DataFrame, carga: DataFrame, mercadoria: DataFrame
) -> DataFrame:
    atr_cols = [
        "IDAtracacao", "Porto Atracação", "Complexo Portuário", "Terminal",
        "Município", "SGUF", "Região Geográfica", "Ano", "Mes",
        "Data Atracação",
    ]
    df = carga.join(
        F.broadcast(atracacao.select(*[F.col(f"`{c}`") for c in atr_cols if c in atracacao.columns])),
        "IDAtracacao",
        "left",
    )
    merc_cols = [
        c for c in ("CDMercadoria", "Grupo de Mercadoria",
                    "Nomenclatura Simplificada Mercadoria")
        if c in mercadoria.columns
    ]
    if "CDMercadoria" in df.columns and "CDMercadoria" in mercadoria.columns:
        df = df.join(
            F.broadcast(
                mercadoria.select(*[F.col(f"`{c}`") for c in merc_cols])
                .dropDuplicates(["CDMercadoria"])
            ),
            "CDMercadoria",
            "left",
        )
    present = {k: v for k, v in RENAME_FINAL.items() if k in df.columns}
    df = df.withColumnsRenamed(present)
    for c, t in (("ano", "long"), ("mes", "long")):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).try_cast(t))
    final = [c for c in _FINAL_ORDER if c in df.columns]
    sort_cols = [c for c in ("ano", "mes", "uf", "porto") if c in final]
    return df.select(*final).orderBy(*sort_cols)


@register_connector("antaq.movimentacao")
def read_movimentacao(
    spark: SparkSession,
    atracacao_txt: bytes | str,
    carga_txt: bytes | str,
    mercadoria_txt: bytes | str,
) -> DataFrame:
    return join_movimentacao(
        parse_atracacao(spark, atracacao_txt),
        parse_carga(spark, carga_txt),
        parse_mercadoria(spark, mercadoria_txt),
    )
