"""Notícias Agrícolas connector — CEPEA's mirror fallback for daily
indicator prices (``preco_diario`` priority-2).

Reference: agrobr/noticias_agricolas/parser.py:16-60 (per-product
unit/praça maps — public market facts), :63-108 (daily + weekly-range
date parse, pt-BR decimal/variação parse), :111-225 (table filter by
header keywords, region-column layout for trigo, weekly rows flagged
``media_semanal``).

The page embeds one small table per quotation block; table selection
and cell extraction are driver-side (single page per request), all
typing/filtering/flagging is Catalyst expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.functions import parse_ptbr_number
from agrobr_spark.sources.connectors._base import register_connector, rows_df
from agrobr_spark.sources.html import extract_tables

# public NA quotation units per product (ref parser.py:16-37)
UNIDADES: dict[str, str] = {
    "soja": "BRL/sc60kg",
    "soja_parana": "BRL/sc60kg",
    "milho": "BRL/sc60kg",
    "boi": "BRL/@",
    "boi_gordo": "BRL/@",
    "cafe": "BRL/sc60kg",
    "cafe_arabica": "BRL/sc60kg",
    "algodao": "cBRL/lb",
    "trigo": "BRL/ton",
    "arroz": "BRL/sc50kg",
    "acucar": "BRL/sc50kg",
    "acucar_refinado": "BRL/sc50kg",
    "etanol_hidratado": "BRL/L",
    "etanol_anidro": "BRL/L",
    "frango_congelado": "BRL/kg",
    "frango_resfriado": "BRL/kg",
    "suino": "BRL/kg",
    "leite": "BRL/L",
    "laranja_industria": "BRL/cx40.8kg",
    "laranja_in_natura": "BRL/cx40.8kg",
}

# default quotation praça per product (ref parser.py:39-60)
PRACAS: dict[str, str | None] = {
    "soja": "Paranaguá/PR",
    "soja_parana": "Paraná",
    "milho": "Campinas/SP",
    "boi": "São Paulo/SP",
    "boi_gordo": "São Paulo/SP",
    "cafe": "São Paulo/SP",
    "cafe_arabica": "São Paulo/SP",
    "algodao": "São Paulo/SP",
    "trigo": None,
    "arroz": "Rio Grande do Sul",
    "acucar": "São Paulo/SP",
    "acucar_refinado": "São Paulo/SP",
    "etanol_hidratado": "São Paulo/SP",
    "etanol_anidro": "São Paulo/SP",
    "frango_congelado": "São Paulo/SP",
    "frango_resfriado": "São Paulo/SP",
    "suino": "São Paulo/SP",
    "leite": None,
    "laranja_industria": "São Paulo/SP",
    "laranja_in_natura": "São Paulo/SP",
}

_DAILY_PAT = r"^(\d{2}/\d{2}/\d{4})"
_WEEKLY_PAT = r"^\d{2}\s*-\s*(\d{2}/\d{2}/\d{4})"


def _data_rows(html: str, produto: str) -> tuple[list[list[str | None]], bool]:
    """Select quotation tables by header keywords and collect raw
    cells (ref parser.py:119-159). Returns (rows, has_region_col);
    each row is [data_str, regiao, valor_str, var_str]."""
    has_region_col = produto == "trigo"
    out: list[list[str | None]] = []
    for t in extract_tables(html):
        hdr = " ".join(t["headers"]).lower()
        if "data" not in hdr:
            continue
        has_valor = "valor" in hdr or "r$" in hdr
        has_region_header = "regi" in hdr
        if not has_valor and not has_region_header:
            continue
        if has_region_header:
            has_region_col = True
        for cells in t["rows"]:
            if len(cells) < 2:
                continue
            if has_region_col and len(cells) >= 3:
                row = [cells[0], cells[1], cells[2],
                       cells[3] if len(cells) > 3 else None]
            else:
                row = [cells[0], None, cells[1],
                       cells[2] if len(cells) > 2 else None]
            out.append(row)
    return out, has_region_col


def indicador_columns(df: DataFrame, produto: str) -> DataFrame:
    """Raw string rows → contract shape; daily + weekly-range date
    parse, weekly rows flagged media_semanal (ref parser.py:63-108,
    161-204)."""
    produto = produto.lower()
    daily = F.nullif(F.regexp_extract("data_str", _DAILY_PAT, 1), F.lit(""))
    weekly = F.nullif(F.regexp_extract("data_str", _WEEKLY_PAT, 1), F.lit(""))
    data = F.coalesce(
        F.try_to_timestamp(daily, F.lit("dd/MM/yyyy")),
        F.try_to_timestamp(weekly, F.lit("dd/MM/yyyy")),
    ).cast("date")
    variacao = F.replace(
        F.regexp_replace("var_str", r"[%\s]", ""), F.lit(","), F.lit(".")
    ).try_cast("double")
    out = df.select(
        data.alias("data"),
        F.lit(produto).alias("produto"),
        F.coalesce(F.col("regiao"), F.lit(PRACAS.get(produto))).alias("praca"),
        parse_ptbr_number(F.col("valor_str")).cast("double").alias("valor"),
        F.lit(UNIDADES.get(produto, "BRL/unidade")).alias("unidade"),
        F.lit("noticias_agricolas").alias("fonte"),
        F.lit("CEPEA/ESALQ via Notícias Agrícolas").alias("metodologia"),
        variacao.alias("variacao_percentual"),
        F.when(weekly.isNotNull(), F.lit("media_semanal")).alias("anomalies"),
        F.lit(2).alias("parser_version"),
    )
    return out.filter(F.col("data").isNotNull() & F.col("valor").isNotNull())


@register_connector("noticias_agricolas.indicador")
def read_indicador(
    spark: SparkSession, html: str | bytes, produto: str = "soja"
) -> DataFrame:
    if isinstance(html, bytes):
        from agrobr_spark.normalize.encoding import decode_content

        html = decode_content(html, "utf-8")[0]
    rows, _ = _data_rows(html, produto.lower())
    if not rows:
        raise ValueError(
            f"noticias_agricolas: no indicator rows for {produto!r}"
        )
    raw = rows_df(
        spark, ["data_str", "regiao", "valor_str", "var_str"], rows
    )
    return indicador_columns(raw, produto)
