"""DERAL connector: Paraná weekly crop-condition workbook → records.

Reference: agrobr/deral/parser.py:17-33 (sentinel-aware numeric
parse), :35-54 (sheet/row product aliases), :98-183 (multi-product
sheet: locate the Ruim/Média/Boa + Plantada/Colhida header columns,
one record per product×condition), :263-273 (dd/mm/yyyy reference
date scan); models.py:5-54 (product/condition aliases — public DERAL
vocabulary).

The reference fetches a legacy ``.xls`` (OLE2/BIFF8); the
``sources.workbook`` dispatcher decodes both that and ``.xlsx``
re-saves with the stdlib readers, so the real captured PC.xls golden
payload parses end-to-end.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector
from agrobr_spark.sources.workbook import read_sheet_rows, sheet_names

# public DERAL vocabulary (ref models.py:32-54)
PRODUTO_ALIASES: dict[str, str] = {
    "soja": "soja",
    "milho": "milho",
    "milho 1ª safra": "milho_1",
    "milho 2ª safra": "milho_2",
    "milho 1a safra": "milho_1",
    "milho 2a safra": "milho_2",
    "milho verão": "milho_1",
    "milho verao": "milho_1",
    "milho safrinha": "milho_2",
    "safrinha": "milho_2",
    "trigo": "trigo",
    "feijão": "feijao",
    "feijao": "feijao",
    "feijão 1ª safra": "feijao_1",
    "feijão 2ª safra": "feijao_2",
    "mandioca": "mandioca",
    "cana-de-açúcar": "cana",
    "cana": "cana",
    "café": "cafe",
    "cafe": "cafe",
    "aveia": "aveia",
    "cevada": "cevada",
    "canola": "canola",
}

_CONDICAO_ALIASES = {"boa": "boa", "bom": "boa", "média": "media",
                     "media": "media", "ruim": "ruim", "má": "ruim",
                     "ma": "ruim"}

_SAIDA = ("produto", "data", "condicao", "pct", "plantio_pct", "colheita_pct")

_SENTINELS = ("-", "–", "...", "n.d.", "n.d", "*")


def _safe_float(value) -> float | None:
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip()
    if not s or s in _SENTINELS:
        return None
    s = s.replace("%", "").strip()
    if "," in s:
        s = s.replace(".", "").replace(",", ".")
    try:
        return float(s)
    except ValueError:
        return None


def _produto_from_label(label: str) -> str | None:
    """Row label → canonical product. The FULL label is tried first so
    '1ª/2ª safra' variants resolve to milho_1/milho_2 etc (the
    reference strips the safra suffix before its exact lookup,
    agrobr/deral/parser.py:184-200, which makes those alias keys
    unreachable from row labels and collapses first/second crops —
    deliberate divergence, fixed here)."""
    s = label.strip().lower()
    s = re.sub(r"\(.*?\)", "", s).strip()
    if s in PRODUTO_ALIASES:
        return PRODUTO_ALIASES[s]
    stripped = re.sub(r"\d+[ªa]\s*safra", "", s).strip()
    if stripped in PRODUTO_ALIASES:
        return PRODUTO_ALIASES[stripped]
    for alias, canonical in sorted(PRODUTO_ALIASES.items(), key=lambda x: -len(x[0])):
        if alias in s:
            return canonical
    return None


def _find_data_referencia(rows: list[list]) -> str:
    for row in rows[:10]:
        for cell in row[:10]:
            if cell is None:
                continue
            m = re.search(r"\d{2}/\d{2}/\d{2,4}", str(cell))
            if m:
                return m.group(0)
    return ""


def _parse_multi_produto(rows: list[list], sheet_name: str) -> list[dict]:
    """The PC.xls layout: one header row with Ruim/Média/Boa (+
    Plantada/Colhida) columns, one row per product
    (ref parser.py:109-183)."""
    header_row = col_ruim = col_media = col_boa = -1
    col_plantada = col_colhida = -1
    for i, row in enumerate(rows[:10]):
        for j, cell in enumerate(row):
            if cell is None:
                continue
            s = str(cell).strip().lower()
            if s == "ruim":
                col_ruim, header_row = j, i
            elif s in ("média", "media"):
                col_media = j
            elif s == "boa":
                col_boa = j
            elif s == "plantada":
                col_plantada = j
            elif s == "colhida":
                col_colhida = j
    if header_row < 0 or col_boa < 0:
        return []
    data_ref = _find_data_referencia(rows) or sheet_name
    records: list[dict] = []
    for row in rows[header_row + 1:]:
        if not row or row[0] is None:
            continue
        label = str(row[0]).strip()
        if not label or label.upper().startswith("SAFRA"):
            continue
        produto = _produto_from_label(label)
        if produto is None:
            continue
        for col, condicao in ((col_ruim, "ruim"), (col_media, "media"),
                              (col_boa, "boa")):
            if col < 0 or col >= len(row):
                continue
            records.append(
                {
                    "produto": produto,
                    "data": data_ref,
                    "condicao": condicao,
                    "pct": _safe_float(row[col]),
                    "plantio_pct": _safe_float(row[col_plantada])
                    if 0 <= col_plantada < len(row) else None,
                    "colheita_pct": _safe_float(row[col_colhida])
                    if 0 <= col_colhida < len(row) else None,
                }
            )
    return records


@register_connector("deral.condicao")
def read_condicao(
    spark: SparkSession,
    source: str | bytes,
    produto: str | None = None,
) -> DataFrame:
    """Parse every sheet of a DERAL plantio-e-condição workbook."""
    records: list[dict] = []
    for name in sheet_names(source):
        try:
            rows = read_sheet_rows(source, name)
        except Exception:  # noqa: BLE001 — sheet-level tolerance
            continue
        records.extend(_parse_multi_produto(rows, name))
    if not records:
        raise ValueError("deral: no condition records extracted")
    df = spark.createDataFrame(
        [tuple(r[c] for c in _SAIDA) for r in records],
        "produto string, data string, condicao string, pct double,"
        " plantio_pct double, colheita_pct double",
    )
    if produto:
        key = PRODUTO_ALIASES.get(produto.strip().lower(), produto.strip().lower())
        df = df.filter(df.produto == key)
    return df.orderBy("produto", "data", "condicao")
