"""ANDA connector: fertilizer-deliveries indicator table → rows.

Reference: agrobr/anda/parser.py:16-170 — the source is a pdfplumber
table (list-of-lists) from the yearly indicators PDF: locate the
year columns on the year header row, month labels in column 1
(pt-BR names, accumulated/total rows skipped), decimal values with
'.' thousands separators.

PDF decode itself needs pdfplumber (absent here, same gate as
sources/pdf.py); the table-shaping logic below is the real work and
runs on the extracted list-of-lists, which is what the golden case
captures.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector

MESES: dict[str, int] = {
    "janeiro": 1, "jan": 1, "fevereiro": 2, "fev": 2, "março": 3,
    "mar": 3, "marco": 3, "abril": 4, "abr": 4, "maio": 5, "mai": 5,
    "junho": 6, "jun": 6, "julho": 7, "jul": 7, "agosto": 8, "ago": 8,
    "setembro": 9, "set": 9, "outubro": 10, "out": 10, "novembro": 11,
    "nov": 11, "dezembro": 12, "dez": 12,
}

_ACUMULADO = (" a ", "/dez", "total", "acumulado", "anual", "ano")

ENTREGAS_SCHEMA = (
    "ano long, mes long, uf string, produto_fertilizante string, "
    "volume_ton double"
)


def _safe_float(value) -> float | None:
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip()
    if not s or s in ("-", "–", "—", "...", "n.d.", "n/d"):
        return None
    s = s.replace(".", "").replace(",", ".")
    try:
        return float(s)
    except ValueError:
        return None


def detect_month(text) -> int | None:
    """Month ordinal from a pt-BR label; accumulated/total rows → None
    (ref: anda/parser.py:80-106)."""
    if text is None:
        return None
    s = str(text).strip().lower()
    if any(p in s for p in _ACUMULADO):
        return None
    try:
        n = int(s)
        return n if 1 <= n <= 12 else None
    except ValueError:
        pass
    for nome, n in MESES.items():
        if s.startswith(nome):
            return n
    return None


def expand_newline_cells(table: list[list]) -> list[list[str]]:
    """pdfplumber merges whole column blocks into one cell with
    newline-separated lines; split such rows back into one row per
    line (ref: anda/parser.py:121-148, gated on ≥5 packed lines)."""
    clean = [[str(c).strip() if c else "" for c in row] for row in table]
    if len(clean) < 2:
        return clean
    max_lines = max(
        (cell.count("\n") + 1 for row in clean for cell in row), default=1
    )
    if max_lines < 5:
        return clean
    expanded: list[list[str]] = []
    for row in clean:
        splits = [cell.split("\n") for cell in row]
        n_lines = max(len(s) for s in splits)
        if n_lines < 2:
            expanded.append(row)
        else:
            for i in range(n_lines):
                expanded.append([s[i].strip() if i < len(s) else "" for s in splits])
    return expanded


def parse_entregas_rows(
    table: list[list], ano: int, produto: str = "total", uf: str = "BR"
) -> list[tuple]:
    """Indicator-table shape (ref: anda/parser.py:296-360): locate the
    requested year's header cell, the month-label column beneath it,
    then one row per recognized month until the next block starts."""
    rows = expand_newline_cells(table)
    ano_str = str(ano)

    header_idx = year_col = None
    for i, row in enumerate(rows):
        for j, cell in enumerate(row):
            if cell.strip() == ano_str:
                header_idx, year_col = i, j
                break
        if year_col is not None:
            break
    if year_col is None:
        raise ValueError(f"anda: year {ano} not found in table header")

    mes_col = None
    for row in rows[header_idx + 1 :]:
        for j, cell in enumerate(row):
            if detect_month(cell) is not None:
                mes_col = j
                break
        if mes_col is not None:
            break
    if mes_col is None:
        return []

    out: list[tuple] = []
    for row in rows[header_idx + 1 :]:
        if len(row) <= max(mes_col, year_col):
            continue
        cell_mes = row[mes_col]
        if cell_mes and len(cell_mes.strip()) > 30:
            break  # next block's merged prose cell
        if row[year_col].strip() == ano_str and cell_mes.strip() == "":
            break  # next indicator block's own year header
        mes = detect_month(cell_mes)
        if mes is None:
            continue
        volume = _safe_float(row[year_col])
        if volume is not None and volume > 0:
            out.append((ano, mes, uf, produto, volume))
    return out


@register_connector("anda.entregas")
def read_entregas(
    spark: SparkSession,
    table: list[list],
    ano: int,
    produto: str = "total",
    uf: str = "BR",
) -> DataFrame:
    rows = parse_entregas_rows(table, ano, produto, uf)
    return spark.createDataFrame(rows, ENTREGAS_SCHEMA).orderBy("mes")


@register_connector("anda.entregas_pdf")
def read_entregas_pdf(
    spark: SparkSession,
    pdf_bytes: bytes,
    ano: int,
    produto: str = "total",
    uf: str = "BR",
) -> DataFrame:
    """End-to-end PDF path (ref: anda/parser.py:382-420
    parse_entregas_pdf): decode via sources/pdf.extract_tables —
    pdfplumber when installed, else the stdlib text extractor — then
    the same table-shaping as the list-of-lists entry point."""
    from agrobr_spark.sources.pdf import extract_tables

    rows: list[tuple] = []
    for table in extract_tables(pdf_bytes):
        rows.extend(parse_entregas_rows(table, ano, produto, uf))
    if not rows:
        raise ValueError("anda: no delivery records extracted from PDF")
    return spark.createDataFrame(rows, ENTREGAS_SCHEMA).orderBy("mes")
