"""CEPEA indicador connector: versioned HTML parsers with layout
detection, fingerprint drift guard, and consensus voting — the
reference's flagship source, wired as ``preco_diario``'s priority-1.

Reference: agrobr/cepea/parsers/v1.py:27-71 (can_parse 5-check
confidence), :73-157 (table selection + row parse), :216-292 (pt-BR
date/decimal parse, unit detection), detector.py:17-105 (version
registry with validity windows + confidence fallback),
consensus.py:41-236 (multi-version run-off).

Spark-first split: the HTML→rows step is driver-side (one small page
per request by construction); everything after ``rows_df`` — date
parse, decimal parse, positivity filter, unit/constant columns — is
Catalyst expressions, so the same ``indicador_columns`` transformation
composes with a distributed scan over millions of archived pages.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from agrobr_spark.functions import parse_ptbr_number
from agrobr_spark.sources.connectors._base import register_connector, rows_df
from agrobr_spark.sources.fingerprint import (
    Fingerprint,
    ParserResult,
    classify_drift,
    consensus,
    fingerprint,
    similarity,
)
from agrobr_spark.sources.html import extract_tables, find_data_table

CONFIDENCE_LOW = 0.4
CONFIDENCE_HIGH = 0.8

_DATE_KW = ("data", "dia", "date")
_VALUE_KW = ("valor", "preço", "preco", "r$", "price")

# public CEPEA quotation units per product (market facts;
# ref: cepea/parsers/v1.py:260-274)
UNIDADES_PRODUTO: dict[str, str] = {
    "soja": "BRL/sc60kg",
    "milho": "BRL/sc60kg",
    "cafe": "BRL/sc60kg",
    "trigo": "BRL/sc60kg",
    "arroz": "BRL/sc50kg",
    "boi": "BRL/@",
    "algodao": "BRL/@",
    "frango": "BRL/kg",
    "suino": "BRL/kg",
    "acucar": "BRL/sc50kg",
    "etanol": "BRL/L",
}


class ParseError(ValueError):
    """All applicable parser versions failed on a payload."""


def multiformat_date(c: Column) -> Column:
    """F2 fallback chain, shape-guarded (dd/MM/yyyy first — the CEPEA
    site format; ref v1.py:216-234)."""
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("dd-MM-yyyy")),
        F.try_to_timestamp(c, F.lit("dd/MM/yy")),
    ).cast("date")


def detect_unidade(produto: str, headers: list[str]) -> str:
    """Product map first, then header-text heuristics
    (ref v1.py:257-292)."""
    p = produto.lower()
    for key, unidade in UNIDADES_PRODUTO.items():
        if key in p:
            return unidade
    hdr = " ".join(headers).lower()
    if "sc" in hdr or "saca" in hdr:
        return "BRL/sc50kg" if "50" in hdr else "BRL/sc60kg"
    if "@" in hdr or "arroba" in hdr:
        return "BRL/@"
    if "kg" in hdr:
        return "BRL/kg"
    if "litro" in hdr or "/l" in hdr:
        return "BRL/L"
    return "BRL/sc60kg"


# ---------------------------------------------------------------------------
# v1 parser
# ---------------------------------------------------------------------------

_ATTR_PAT = r"indicador|preco|cotacao|dados"
_TH_RE = re.compile(r"<th\b[^>]*>(.*?)</th>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def _header_text(html: str) -> str:
    """Lower-cased, entity-decoded text of all ``<th>`` cells — the
    same normalization ``extract_tables`` applies to header cells, so
    ``can_parse`` keyword checks and the actual parse agree on pages
    using entities (``&Agrave; vista``)."""
    import html as _html

    return _html.unescape(
        " ".join(
            _TAG_RE.sub("", m.group(1)).strip().lower()
            for m in _TH_RE.finditer(html)
        )
    )


def can_parse_v1(html: str) -> tuple[bool, float]:
    """Five structural checks → confidence in [0, 1]; parse when
    ≥ 0.4 (ref v1.py:27-71)."""
    checks = 0
    tables = extract_tables(html)
    if tables:
        checks += 1
    attr_re = re.compile(_ATTR_PAT, re.I)
    if any(attr_re.search(a) for t in tables for a in t["attrs"]):
        checks += 1
    header_text = _header_text(html)
    if any(kw in header_text for kw in _DATE_KW):
        checks += 1
    if any(kw in header_text for kw in _VALUE_KW):
        checks += 1
    if re.search(r"cepea|esalq|indicador", html, re.I):
        checks += 1
    confidence = checks / 5
    return confidence >= CONFIDENCE_LOW, confidence


def _qcol(name: str) -> Column:
    """Backtick-quoted column reference: dotted scraped headers
    (``Var./Dia``) must not be parsed as struct field paths."""
    return F.col("`" + name.replace("`", "``") + "`")


def _pick_col(headers: list[str], keywords: tuple[str, ...]) -> str | None:
    for h in headers:
        if any(kw in h.lower() for kw in keywords):
            return h
    return None


def indicador_columns(
    df: DataFrame,
    data_col: str,
    valor_col: str,
    variacao_col: str | None,
    produto: str,
    unidade: str,
    parser_version: int = 1,
) -> DataFrame:
    """Raw string table → contract shape, all Catalyst expressions.

    Column references are backtick-quoted — scraped headers may
    contain dots (``Var./Dia``) that an unquoted reference would
    mis-parse as struct field paths."""
    out = df.select(
        multiformat_date(_qcol(data_col)).alias("data"),
        F.lit(produto).alias("produto"),
        F.lit(None).cast("string").alias("praca"),
        # money stays DecimalType(18,4) end-to-end (SURVEY §7 hard
        # point; ref models.py:25, duckdb_store.py:64) — the double
        # cast is confined to oracle hash canonicalization
        parse_ptbr_number(_qcol(valor_col)).alias("valor"),
        F.lit(unidade).alias("unidade"),
        F.lit("cepea").alias("fonte"),
        F.lit("indicador_esalq").alias("metodologia"),
        (
            _qcol(variacao_col) if variacao_col else F.lit(None).cast("string")
        ).alias("variacao"),
        F.lit(parser_version).alias("parser_version"),
    )
    # the reference drops rows with unparseable dates or non-positive
    # values (v1.py:188-199, 236-255)
    return out.filter(F.col("data").isNotNull() & (F.col("valor") > 0))


def parse_v1(spark: SparkSession, html: str, produto: str) -> DataFrame:
    table = find_data_table(
        html, attr_pattern=_ATTR_PAT, header_keywords=["data"]
    )
    if table is None or not table["rows"]:
        raise ParseError("cepea v1: no data table recognized")
    headers = table["headers"]
    data_col = _pick_col(headers, _DATE_KW) or headers[0]
    valor_col = _pick_col(headers, _VALUE_KW)
    variacao_col = _pick_col(headers, ("var", "%"))
    if valor_col is None:
        # fall back to first non-date column (ref v1.py:191-196)
        rest = [h for h in headers if h != data_col]
        if not rest:
            raise ParseError("cepea v1: no value column")
        valor_col = rest[0]
    raw = rows_df(spark, headers, table["rows"])
    # rows_df de-duplicated names; re-resolve against actual columns
    cols = dict(zip(headers, raw.columns))
    return indicador_columns(
        raw,
        cols[data_col],
        cols[valor_col],
        cols.get(variacao_col) if variacao_col else None,
        produto,
        detect_unidade(produto, headers),
    )


# ---------------------------------------------------------------------------
# v2 parser — the 2025 layout refresh
# ---------------------------------------------------------------------------
#
# The refreshed indicador table carries BOTH currencies with new header
# vocabulary:  Dia | Valor US$ | À vista R$ | Var./Dia.
# v1 still parses this page with full confidence — its value-keyword
# scan ("valor" before "r$") lands on the **US$** column — which is
# precisely the silent-wrong-data failure the reference's consensus
# voting exists to catch (ref consensus.py:41-236): v1 and v2 disagree
# on every row, the run-off reports the divergence, and pick-latest
# selects v2.

_VISTA_KW = ("à vista r$", "a vista r$")


def can_parse_v2(html: str) -> tuple[bool, float]:
    """Layout-refresh marker checks: the “à vista” header vocabulary
    is the discriminator — absent from the pre-2025 layout, so v2
    cleanly declines old pages (ref detector.py can_parse contract)."""
    checks = 0
    tables = extract_tables(html)
    if tables:
        checks += 1
    header_text = _header_text(html)
    if any(kw in header_text for kw in _VISTA_KW):
        checks += 2  # the decisive marker carries double weight
    if any(kw in header_text for kw in _DATE_KW):
        checks += 1
    if re.search(r"cepea|esalq|indicador", html, re.I):
        checks += 1
    confidence = checks / 5
    return confidence >= CONFIDENCE_HIGH, confidence


def parse_v2(spark: SparkSession, html: str, produto: str) -> DataFrame:
    table = find_data_table(
        html, attr_pattern=_ATTR_PAT, header_keywords=["dia"]
    )
    if table is None or not table["rows"]:
        raise ParseError("cepea v2: no data table recognized")
    headers = table["headers"]
    data_col = _pick_col(headers, _DATE_KW) or headers[0]
    valor_col = next(
        (h for h in headers if any(kw in h.lower() for kw in _VISTA_KW)),
        None,
    )
    if valor_col is None:
        raise ParseError("cepea v2: no 'à vista R$' column")
    variacao_col = _pick_col(headers, ("var", "%"))
    raw = rows_df(spark, headers, table["rows"])
    cols = dict(zip(headers, raw.columns))
    return indicador_columns(
        raw,
        cols[data_col],
        cols[valor_col],
        cols.get(variacao_col) if variacao_col else None,
        produto,
        detect_unidade(produto, headers),
        parser_version=2,
    )


# ---------------------------------------------------------------------------
# detector: versioned parser registry (ref detector.py:17-105)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParserSpec:
    version: int
    valid_from: date
    valid_until: date | None
    can_parse: Callable[[str], tuple[bool, float]]
    parse: Callable[[SparkSession, str, str], DataFrame]


PARSERS: list[ParserSpec] = [
    ParserSpec(1, date(2024, 1, 1), None, can_parse_v1, parse_v1),
    ParserSpec(2, date(2025, 6, 1), None, can_parse_v2, parse_v2),
]


def detect_and_parse(
    spark: SparkSession,
    html: str,
    produto: str,
    data_referencia: date | None = None,
    strict: bool = False,
) -> tuple[int, float, DataFrame]:
    """Try parsers newest-first within their validity window; first
    one that can_parse AND yields rows wins (ref detector.py:39-97)."""
    errors: list[str] = []
    for spec in reversed(PARSERS):
        if data_referencia is not None:
            if spec.valid_from > data_referencia:
                continue
            if spec.valid_until and data_referencia > spec.valid_until:
                continue
        ok, confidence = spec.can_parse(html)
        if not ok:
            continue
        if strict and confidence < CONFIDENCE_LOW:
            raise ParseError(
                f"cepea v{spec.version}: confidence {confidence:.0%} "
                f"below strict threshold"
            )
        try:
            df = spec.parse(spark, html, produto)
            if df.isEmpty():
                errors.append(f"v{spec.version}: no data extracted")
                continue
            return spec.version, confidence, df
        except Exception as e:  # noqa: BLE001 — classify-and-continue
            errors.append(f"v{spec.version}: {e}")
            continue
    raise ParseError("cepea: all parsers failed: " + "; ".join(errors))


def parse_with_consensus(
    spark: SparkSession,
    html: str,
    produto: str,
    tolerance_rows: int = 0,
) -> tuple[DataFrame, list[str]]:
    """V5: run every applicable parser version and vote
    (ref consensus.py:41-236 pick-latest, report divergences)."""
    results = []
    for spec in PARSERS:
        ok, _ = spec.can_parse(html)
        if not ok:
            continue
        try:
            results.append(
                ParserResult(f"v{spec.version}", spec.parse(spark, html, produto))
            )
        except Exception:  # noqa: BLE001
            continue
    if not results:
        raise ParseError("cepea: no parser produced a result")
    winner, divergences = consensus(results, tolerance_rows=tolerance_rows)
    return winner.df, divergences


@register_connector("cepea.indicador")
def read_indicador(
    spark: SparkSession,
    html: str | bytes,
    produto: str = "soja",
    data_referencia: date | None = None,
    baseline: Fingerprint | None = None,
    strict: bool = False,
) -> DataFrame:
    """Parse a CEPEA indicador page into the ``cepea.indicador``
    contract shape, with V4 drift guard when a baseline fingerprint is
    supplied."""
    if isinstance(html, bytes):
        from agrobr_spark.normalize.encoding import decode_content

        html = decode_content(html, "utf-8")[0]
    if baseline is not None:
        drift = classify_drift(similarity(baseline, fingerprint(html)))
        if drift == "breaking":
            raise ParseError("cepea: breaking layout drift vs baseline")
    _, _, df = detect_and_parse(
        spark, html, produto, data_referencia=data_referencia, strict=strict
    )
    return df.orderBy(F.desc("data"))
