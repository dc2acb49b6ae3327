"""ABIOVE connector: soy-complex export workbook → monthly records.

Reference: agrobr/abiove/parser.py:18-45 (pt-BR numeric hygiene),
:48-88 (month / product detection from header text), :91-226 (the
``meses-rows`` layout: product sections, Valor FOB / Peso Líquido
column groups with one sub-column per year, latest-or-requested year
pick), :487-500 (monthly aggregate); models.py MESES_PT.

Layout discovery is driver-side (one small workbook per release);
records hand off to Spark as a typed DataFrame sorted like the
reference output (ano, mes, produto).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector
from agrobr_spark.sources.workbook import read_sheet_rows, sheet_names

MESES_PT: dict[str, int] = {
    "jan": 1, "janeiro": 1, "fev": 2, "fevereiro": 2, "mar": 3, "março": 3,
    "marco": 3, "abr": 4, "abril": 4, "mai": 5, "maio": 5, "jun": 6,
    "junho": 6, "jul": 7, "julho": 7, "ago": 8, "agosto": 8, "set": 9,
    "setembro": 9, "out": 10, "outubro": 10, "nov": 11, "novembro": 11,
    "dez": 12, "dezembro": 12,
}

_EXCEL_EPOCH = dt.date(1899, 12, 30)

_SAIDA = ("ano", "mes", "produto", "volume_ton", "receita_usd_mil")


def _safe_float(value) -> float | None:
    """pt-BR numeric hygiene incl. sentinel dashes
    (ref parser.py:18-45)."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip()
    if not s or s in ("-", "–", "—", "n.d.", "n/d", "...", "nd"):
        return None
    if "," in s:
        s = s.replace(".", "").replace(",", ".")
    elif s.count(".") > 1:
        s = s.replace(".", "")
    try:
        return float(s)
    except ValueError:
        return None


def _detect_month(value) -> int | None:
    if value is None:
        return None
    s = str(value).strip().lower()
    if any(p in s for p in ("total", "acumulad", "anual", " a ", "/")):
        return None
    if s.isdigit():
        n = int(s)
        return n if 1 <= n <= 12 else None
    return MESES_PT.get(s)


def _detect_produto(text: str) -> str | None:
    """Section title → product slug (ref parser.py:67-88)."""
    h = text.strip().lower()
    if not h:
        return None
    if (
        any(k in h for k in ("grão", "grao", "grain", "soybean"))
        and not any(k in h for k in ("farelo", "óleo", "oleo", "meal", "oil"))
    ):
        return "grao"
    if any(k in h for k in ("farelo", "meal")):
        return "farelo"
    if any(k in h for k in ("óleo", "oleo", "oil")):
        return "oleo"
    if any(k in h for k in ("milho", "corn")):
        return "milho"
    if "total" in h:
        return "total"
    return None


def _cell_year(value) -> int | None:
    """A year sub-header cell: a plain year, or an Excel date serial
    for Jan-1 of the year."""
    if isinstance(value, (int, float)):
        v = int(value)
        if 1990 <= v <= 2100:
            return v
        if 20000 <= v <= 80000:  # date serial
            return (_EXCEL_EPOCH + dt.timedelta(days=v)).year
    s = str(value or "").strip()
    return int(s) if s.isdigit() and 1990 <= int(s) <= 2100 else None


def _pick_year_col(
    rows: list[list], hdr_row: int, start: int, ano: int | None
) -> tuple[int, int | None]:
    """Within a column group, the sub-column whose year matches
    ``ano`` — else the latest — else the group's first column; returns
    (column, resolved year). Year sub-headers are Excel date serials
    in the real workbook (``_cell_year`` decodes them) and sit one OR
    two rows below the header (the 1.5.x summary sections interpose a
    blank row — ref parser.py:392-416 only checks header+1 and falls
    back to the oldest column there; deliberate divergence)."""
    candidates: list[tuple[int, int]] = []
    for sub_off in (1, 2):
        if hdr_row + sub_off >= len(rows):
            break
        sub = rows[hdr_row + sub_off]
        for idx in range(start, min(start + 4, len(sub))):
            y = _cell_year(sub[idx])
            if y is not None:
                candidates.append((idx, y))
        if candidates:
            break
    if not candidates:
        return start, None
    if ano is not None:
        exact = [(idx, y) for idx, y in candidates if y == ano]
        if exact:
            return exact[0]
    return max(candidates, key=lambda c: c[1])


def _find_month_col(rows: list[list]) -> int:
    """The column holding month names — col 0 or 1, first with ≥3
    month hits (ref parser.py:160-171)."""
    for col in (0, 1):
        hits = 0
        for row in rows:
            if col < len(row) and _detect_month(row[col]) is not None:
                hits += 1
                if hits >= 3:
                    return col
    return 0


def _detect_section_produto(
    rows: list[list], first_month_row: int, sheet_name: str
) -> str:
    """Scan up to 5 title rows above the section, leftmost 3 columns
    (ref parser.py:336-355)."""
    for offset in range(1, 6):
        r = first_month_row - offset
        if r < 0:
            break
        for c in range(min(3, len(rows[r]))):
            v = rows[r][c]
            if v is None:
                continue
            produto = _detect_produto(str(v))
            if produto:
                return produto
    return _detect_produto(sheet_name) or "total"


def _detect_data_cols(
    rows: list[list], month_col: int, first_month_row: int, ano: int | None
) -> tuple[dict[int, str], int | None]:
    """Header rows above the section name the Peso/Valor column
    groups; resolve each group to its year sub-column. Also returns
    the year the sub-column resolved to, so records carry the real
    year even when the caller passed ``ano=None``
    (ref parser.py:358-389)."""
    col_map: dict[int, str] = {}
    years: list[int] = []
    for offset in range(1, 5):
        r = first_month_row - offset
        if r < 0:
            break
        for c in range(month_col + 1, len(rows[r])):
            v = rows[r][c]
            if v is None:
                continue
            s = str(v).strip().lower()
            if any(k in s for k in ("peso", "volume", "ton", "mil t", "quantidade")):
                picked, y = _pick_year_col(rows, r, c, ano)
                col_map[picked] = "volume"
            elif any(k in s for k in ("valor", "fob", "receita", "us$", "usd")):
                picked, y = _pick_year_col(rows, r, c, ano)
                col_map[picked] = "receita"
            else:
                continue
            if y is not None:
                years.append(y)
    if not col_map:
        start = month_col + 1
        col_map[start] = "receita"
        col_map[start + 1] = "volume"
    # max over every picked sub-column: a side table sharing the header
    # rows may hit first, but the latest year is the primary group's
    return col_map, (max(years) if years else None)


def _parse_sheet_records(
    rows: list[list], ano: int | None, sheet_name: str = ""
) -> list[dict]:
    """The ``meses-rows`` layout: month rows in a single column,
    grouped into product sections wherever the row gap exceeds 4
    (ref parser.py:174-265)."""
    month_col = _find_month_col(rows)
    month_rows: list[tuple[int, int]] = []
    for i, row in enumerate(rows):
        if month_col < len(row):
            m = _detect_month(row[month_col])
            if m is not None:
                month_rows.append((i, m))
    if len(month_rows) < 3:
        return []

    groups: list[list[tuple[int, int]]] = []
    current: list[tuple[int, int]] = []
    for row_idx, month in month_rows:
        if current and row_idx - current[-1][0] > 4:
            groups.append(current)
            current = []
        current.append((row_idx, month))
    if current:
        groups.append(current)

    records: list[dict] = []
    for grp in groups:
        first_row = grp[0][0]
        produto = _detect_section_produto(rows, first_row, sheet_name)
        data_cols, resolved_year = _detect_data_cols(rows, month_col, first_row, ano)
        for row_idx, month in grp:
            row = rows[row_idx]
            rec = {
                "ano": ano or resolved_year or 0,
                "mes": month,
                "produto": produto,
                "volume_ton": 0.0,
                "receita_usd_mil": None,
            }
            for col_idx, tipo in data_cols.items():
                value = _safe_float(row[col_idx]) if col_idx < len(row) else None
                if value is None:
                    continue
                if tipo == "volume":
                    rec["volume_ton"] = value
                else:
                    rec["receita_usd_mil"] = value
            if rec["volume_ton"] != 0.0 or rec["receita_usd_mil"] is not None:
                records.append(rec)
    return records


@register_connector("abiove.exportacao")
def read_exportacao(
    spark: SparkSession, source: str | bytes, ano: int | None = None
) -> DataFrame:
    records: list[dict] = []
    for name in sheet_names(source):
        try:
            rows = read_sheet_rows(source, name)
        except Exception:  # noqa: BLE001 — sheet-level tolerance (ref :106-112)
            continue
        records.extend(_parse_sheet_records(rows, ano))
    if not records:
        raise ValueError("abiove: no records extracted from workbook")
    df = spark.createDataFrame(
        [tuple(r[c] for c in _SAIDA) for r in records],
        "ano int, mes int, produto string, volume_ton double, receita_usd_mil double",
    )
    return df.orderBy("ano", "mes", "produto")


def agregar_mensal(df: DataFrame) -> DataFrame:
    """Monthly totals across products (ref parser.py:487-500)."""
    return (
        df.filter(F.col("produto") != "total")
        .groupBy("ano", "mes")
        .agg(
            F.sum("volume_ton").alias("volume_ton"),
            F.sum("receita_usd_mil").alias("receita_usd_mil"),
        )
        .orderBy("ano", "mes")
    )
