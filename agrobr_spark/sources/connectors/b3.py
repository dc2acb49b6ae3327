"""B3 connector: daily settlement (ajustes) HTML + open-interest CSV.

Reference: agrobr/b3/parser.py:29-194 + b3/models.py:3-89 — the
ajustes page is one big table (``tblDadosAjustes``) where the ticker
cell is only present on its first row and carries forward; only agro
tickers are kept, the vencimento code decodes month-letter + 2-digit
year, and all numbers are pt-BR formatted. The OI CSV filters segment
AGRIBUSINESS + agro assets and classifies futuro/opção by ticker
shape.

HTML decode is regex-based (bs4-free, same as sources/html.py) and
driver-side — the page is one small payload. The OI CSV path is all
Catalyst expressions over an all-string scan.
"""

from __future__ import annotations

import re
from datetime import date, datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import (
    csv_text_rows,
    decode_csv,
    register_connector,
    rows_df,
)
from agrobr_spark.sources.html import extract_tables

B3_CONTRATOS_AGRO: dict[str, str] = {
    "boi": "BGI",
    "milho": "CCM",
    "cafe_arabica": "ICF",
    "cafe_conillon": "CNL",
    "etanol": "ETH",
    "soja_cross": "SJC",
    "soja_fob": "SOY",
}

TICKERS_AGRO = set(B3_CONTRATOS_AGRO.values())
TICKERS_AGRO_OI = {"BGI", "CCM", "ETH", "ICF", "SJC", "CNL"}
CONTRATO_POR_TICKER = {v: k for k, v in B3_CONTRATOS_AGRO.items()}

MONTH_CODES: dict[str, int] = {
    "F": 1, "G": 2, "H": 3, "J": 4, "K": 5, "M": 6,
    "N": 7, "Q": 8, "U": 9, "V": 10, "X": 11, "Z": 12,
}

UNIDADES: dict[str, str] = {
    "BGI": "BRL/@",
    "CCM": "BRL/sc60kg",
    "ICF": "USD/sc60kg",
    "CNL": "USD/ton",
    "ETH": "BRL/m3",
    "SJC": "USD/sc60kg",
    "SOY": "USD/ton",
}

_RE_ATUALIZADO = re.compile(r"ATUALIZADO EM:\s*(\d{2}/\d{2}/\d{4})")
_RE_TICKER_FUTURO = re.compile(r"^[A-Z]{2,4}[FGHJKMNQUVXZ]\d{2}$")
_RE_TICKER_OPCAO = re.compile(r"^[A-Z]{2,4}[FGHJKMNQUVXZ]\d{2}[CP]\d+$")

AJUSTES_SCHEMA = (
    "data date, ticker string, descricao string, vencimento_codigo string, "
    "vencimento_mes long, vencimento_ano long, ajuste_anterior double, "
    "ajuste_atual double, variacao double, ajuste_por_contrato double, "
    "unidade string"
)


def parse_vencimento(codigo: str) -> tuple[int, int]:
    codigo = codigo.strip()
    year_suffix = int(codigo[1:])
    year = 2000 + year_suffix if year_suffix < 100 else year_suffix
    return year, MONTH_CODES[codigo[0].upper()]


def _numero_br(texto: str | None) -> float | None:
    if texto is None:
        return None
    texto = texto.strip()
    if not texto or texto == "-":
        return None
    try:
        return float(texto.replace(".", "").replace(",", "."))
    except ValueError:
        return None


def parse_ajustes_rows(html: str) -> list[tuple]:
    """Driver-side row extraction with ticker carry-forward."""
    m = _RE_ATUALIZADO.search(html)
    if not m:  # page without a trading session — empty result
        return []
    data_ref = datetime.strptime(m.group(1), "%d/%m/%Y").date()

    table = None
    for t in extract_tables(html):
        if any("tblDadosAjustes" in a for a in t["attrs"]):
            table = t
            break
    if table is None:
        raise ValueError("b3: tblDadosAjustes table not found")

    records: list[tuple] = []
    ticker, desc, in_agro = "", "", False
    for cells in table["rows"]:
        if len(cells) < 6:
            continue
        if cells[0]:
            parts = cells[0].split("-", 1)
            ticker = parts[0].strip()
            desc = parts[1].strip() if len(parts) > 1 else ""
            in_agro = ticker in TICKERS_AGRO
        if not in_agro or not cells[1]:
            continue
        vct = cells[1].strip()
        try:
            vct_ano, vct_mes = parse_vencimento(vct)
        except (KeyError, ValueError, IndexError):
            continue
        records.append((
            data_ref, ticker, desc, vct, vct_mes, vct_ano,
            _numero_br(cells[2]), _numero_br(cells[3]),
            _numero_br(cells[4]), _numero_br(cells[5]),
            UNIDADES.get(ticker, ""),
        ))
    return records


@register_connector("b3.ajustes")
def read_ajustes(spark: SparkSession, payload: bytes | str) -> DataFrame:
    rows = parse_ajustes_rows(decode_csv(payload))
    return spark.createDataFrame(rows, AJUSTES_SCHEMA)


OI_COLS = [
    "data", "ticker", "descricao", "ticker_completo", "vencimento_codigo",
    "vencimento_mes", "vencimento_ano", "tipo", "posicoes_abertas",
    "variacao_posicoes", "unidade",
]


@register_connector("b3.posicoes")
def read_posicoes(spark: SparkSession, payload: bytes | str) -> DataFrame:
    header, rows = csv_text_rows(decode_csv(payload), sep=";")
    if "SgmtNm" not in header:
        raise ValueError("b3: SgmtNm column missing from OI CSV")
    df = rows_df(spark, header, rows)
    df = df.filter(
        (F.col("SgmtNm") == "AGRIBUSINESS")
        & F.col("Asst").isin(sorted(TICKERS_AGRO_OI))
    )
    vct = F.trim("XprtnCd")
    mes_map = F.create_map(
        *[F.lit(x) for kv in MONTH_CODES.items() for x in (kv[0], str(kv[1]))]
    )
    # whole suffix must be numeric, else (ano, mes) are both null —
    # parity with _parse_vencimento_safe (ref: b3/parser.py:134-140)
    ano2 = F.regexp_extract(vct, r"^[A-Z](\d+)$", 1).try_cast("long")
    contrato = F.create_map(
        *[F.lit(x) for kv in CONTRATO_POR_TICKER.items() for x in kv]
    )
    unidade = F.create_map(
        *[F.lit(x) for kv in UNIDADES.items() for x in kv]
    )
    tick_full = F.trim("TckrSymb")
    df = (
        df.withColumn("data", F.col("RptDt").try_cast("date"))
        .withColumn("ticker", F.col("Asst"))
        .withColumn("ticker_completo", tick_full)
        .withColumn("vencimento_codigo", vct)
        .withColumn(
            "vencimento_ano",
            F.when(ano2 < 100, ano2 + 2000).otherwise(ano2).cast("long"),
        )
        .withColumn(
            "vencimento_mes",
            F.when(
                ano2.isNotNull(),
                F.element_at(mes_map, F.substring(vct, 1, 1)).try_cast("long"),
            ),
        )
        .withColumn(
            "tipo",
            F.when(tick_full.rlike(_RE_TICKER_FUTURO.pattern), "futuro")
            .when(tick_full.rlike(_RE_TICKER_OPCAO.pattern), "opcao")
            .when(F.length(tick_full) > 6, "opcao")
            .otherwise("futuro"),
        )
        .withColumn("descricao", F.coalesce(F.element_at(contrato, F.col("ticker")), F.lit("")))
        .withColumn("unidade", F.coalesce(F.element_at(unidade, F.col("ticker")), F.lit("")))
        .withColumn("posicoes_abertas", F.col("OpnIntrst").try_cast("long"))
        .withColumn("variacao_posicoes", F.col("VartnOpnIntrst").try_cast("long"))
    )
    return df.select(*OI_COLS)
