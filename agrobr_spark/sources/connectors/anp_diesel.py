"""ANP diesel connector: weekly price workbook + monthly sales CSV.

Reference: agrobr/alt/anp_diesel/parser.py:40-58 (header-row discovery
by marker cells PRODUTO + DATA INICIAL), :62-218 (precos: diesel
filter, 'ÓLEO ' prefix strip, pt-BR decimal comma, dayfirst dates,
margem = venda − compra), :220-232 (_parse_numeric_br), :255-279 +
:330-389 (vendas: flat ;-CSV ANO;MES;GRANDE REGIAO;UNIDADE DA
FEDERACAO;PRODUTO;VENDAS → first-of-month rows, month name or number).

Feeds the ``anp_diesel.precos`` / ``anp_diesel.vendas`` contracts
(two of the six orphan contracts, VERDICT r2 'What's missing' #6).
Workbook layout discovery is driver-side (small weekly file); both
column transforms are pure Catalyst and compose with distributed scans.
"""

from __future__ import annotations

import unicodedata
from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.normalize.dims import UF_DIM
from agrobr_spark.sources.connectors._base import (
    csv_text_rows,
    decode_csv,
    register_connector,
    rows_df,
)
from agrobr_spark.sources.workbook import read_sheet_rows

MESES = {
    "JAN": 1, "FEV": 2, "MAR": 3, "ABR": 4, "MAI": 5, "JUN": 6,
    "JUL": 7, "AGO": 8, "SET": 9, "OUT": 10, "NOV": 11, "DEZ": 12,
}

_PRECOS_SAIDA = (
    "data", "uf", "municipio", "produto", "preco_venda", "preco_compra",
    "n_postos", "margem",
)
_VENDAS_SAIDA = ("data", "uf", "regiao", "produto", "volume_m3")


def _strip_accents(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
    )


def _norm_header(s: object) -> str:
    return _strip_accents(str(s).strip().upper())


def _find_col(header: list, candidates: tuple[str, ...]) -> int | None:
    normed = [_norm_header(h) for h in header]
    for cand in candidates:
        c = _strip_accents(cand.upper())
        if c in normed:
            return normed.index(c)
    return None


def _uf_sigla_map():
    """name or sigla (accent-stripped lower) → UF sigla."""
    pairs: dict[str, str] = {}
    for uf, nome, _, _ in UF_DIM:
        pairs[nome] = uf
        pairs[uf.lower()] = uf
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(pairs.items())])


def _norm_key_col(col):
    from agrobr_spark.functions import norm_key

    return norm_key(col)


def _detect_header_row(rows: list[list], markers: tuple[str, ...]) -> int:
    """First row containing every marker cell (ref parser.py:40-58)."""
    want = {_strip_accents(m.upper()) for m in markers}
    for i, row in enumerate(rows[:30]):
        cells = {_norm_header(c) for c in row if c is not None}
        if want <= cells:
            return i
    return 0


def precos_columns(df: DataFrame) -> DataFrame:
    """Weekly price rows → contract shape (ref parser.py:96-218)."""
    produto = F.regexp_replace(
        F.upper(F.trim("produto_raw")), r"^[OÓ]LEO\s+", ""
    )
    venda = F.regexp_replace(F.coalesce(F.col("preco_venda_raw"), F.lit("")), ",", ".").try_cast("double")
    compra = F.regexp_replace(F.coalesce(F.col("preco_compra_raw"), F.lit("")), ",", ".").try_cast("double")
    out = (
        df.filter(F.upper(F.trim("produto_raw")).contains("DIESEL"))
        .select(
            F.coalesce(
                F.try_to_timestamp(F.trim("data_raw"), F.lit("dd/MM/yyyy")),
                F.try_to_timestamp(F.trim("data_raw"), F.lit("yyyy-MM-dd")),
            ).cast("date").alias("data"),
            F.coalesce(
                F.element_at(_uf_sigla_map(), _norm_key_col(F.col("uf_raw"))),
                F.lit(""),
            ).alias("uf"),
            F.coalesce(F.trim("municipio_raw"), F.lit("")).alias("municipio"),
            produto.alias("produto"),
            venda.alias("preco_venda"),
            compra.alias("preco_compra"),
            F.col("n_postos_raw").try_cast("double").cast("int").alias("n_postos"),
            (venda - compra).alias("margem"),
        )
        .filter(F.col("data").isNotNull())
    )
    return out.select(*_PRECOS_SAIDA).orderBy("data", "uf", "produto")


@register_connector("anp_diesel.precos")
def read_precos(
    spark: SparkSession,
    source: str | bytes,
    produto: str | None = None,
    uf: str | None = None,
) -> DataFrame:
    rows = read_sheet_rows(source, 0)
    hdr = _detect_header_row(rows, ("PRODUTO", "DATA INICIAL"))
    header = rows[hdr]
    idx = {
        "data_raw": _find_col(header, ("DATA INICIAL", "DATA FINAL")),
        "uf_raw": _find_col(header, ("ESTADO - SIGLA", "ESTADO")),
        "municipio_raw": _find_col(header, ("MUNICÍPIO", "MUNICIPIO")),
        "produto_raw": _find_col(header, ("PRODUTO",)),
        "preco_venda_raw": _find_col(
            header, ("PREÇO MÉDIO REVENDA", "PRECO MEDIO REVENDA")
        ),
        "preco_compra_raw": _find_col(
            header, ("PREÇO MÉDIO DISTRIBUIÇÃO", "PRECO MEDIO DISTRIBUICAO")
        ),
        "n_postos_raw": _find_col(
            header, ("NÚMERO DE POSTOS PESQUISADOS", "NUMERO DE POSTOS PESQUISADOS")
        ),
    }
    if idx["produto_raw"] is None or idx["data_raw"] is None:
        raise ValueError("anp_diesel: colunas PRODUTO/DATA nao encontradas")
    names = [n for n, i in idx.items() if i is not None]
    data = [
        [
            None if idx[n] >= len(r) or r[idx[n]] is None else str(r[idx[n]])
            for n in names
        ]
        for r in rows[hdr + 1 :]
    ]
    df = precos_columns(rows_df(spark, names, data))
    if produto:
        df = df.filter(F.col("produto") == produto.upper())
    if uf:
        df = df.filter(F.col("uf") == uf.upper())
    return df


def vendas_columns(df: DataFrame) -> DataFrame:
    """Monthly sales rows → contract shape (ref parser.py:255-389)."""
    cols = set(df.columns)
    mes_raw = F.upper(F.trim("mes"))
    mes = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for x in chain.from_iterable(MESES.items())]),
            F.substring(mes_raw, 1, 3),
        ),
        mes_raw.try_cast("int"),
    )
    vol = F.regexp_replace(F.coalesce(F.col("vendas"), F.lit("")), " ", "")
    vol = F.when(
        vol.contains(",") & vol.contains("."),
        F.regexp_replace(F.regexp_replace(vol, r"\.", ""), ",", "."),
    ).otherwise(F.regexp_replace(vol, ",", "."))
    produto_col = next(
        (c for c in ("produto", "combustivel") if c in cols), None
    )
    out = (
        df.select(
            F.try_to_timestamp(
                F.concat_ws(
                    "-",
                    F.col("ano").try_cast("int"),
                    F.lpad(mes.cast("string"), 2, "0"),
                    F.lit("01"),
                ),
                F.lit("yyyy-MM-dd"),
            ).cast("date").alias("data"),
            F.coalesce(
                F.element_at(
                    _uf_sigla_map(), _norm_key_col(F.col("unidade da federacao"))
                ),
                F.lit(""),
            ).alias("uf"),
            F.coalesce(F.trim(F.col("grande regiao")), F.lit("")).alias("regiao"),
            (
                F.regexp_replace(
                    F.upper(F.trim(produto_col)), r"^[OÓ]LEO\s+", ""
                )
                if produto_col
                else F.lit("")
            ).alias("produto"),
            vol.try_cast("double").alias("volume_m3"),
        )
        .filter(F.col("data").isNotNull() & F.col("volume_m3").isNotNull())
    )
    out = out.filter(F.col("produto").contains("DIESEL") | (F.col("produto") == ""))
    return out.select(*_VENDAS_SAIDA).orderBy("data", "uf")


@register_connector("anp_diesel.vendas")
def read_vendas(
    spark: SparkSession, payload: bytes | str, uf: str | None = None
) -> DataFrame:
    text = decode_csv(payload)
    header, rows = csv_text_rows(text, sep=";")
    header = [_strip_accents(h).strip().lower() for h in header]
    df = vendas_columns(rows_df(spark, header, rows))
    if uf:
        df = df.filter(F.col("uf") == uf.upper())
    return df
