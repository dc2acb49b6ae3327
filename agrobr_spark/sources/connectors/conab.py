"""CONAB connector: the grain-survey workbook → safra rows.

Reference: agrobr/conab/parsers/v1.py — sheet selected by product
name (constants.CONAB_PRODUTOS), header row found by REGIÃO/UF/PRODUTO
scan (:396-401), per-safra column blocks discovered from the ÁREA /
PRODUTIVIDADE / PRODUÇÃO header cells + the "Safra YY/YY" sub-row
(:403-473), data starting header+3, region subtotal rows skipped,
decimal comma values.

Workbook decode is the stdlib zip+XML reader (sources/xlsx.py) — no
openpyxl needed. Extraction is driver-side (workbooks are <1 MB); the
typed DataFrame is the Spark boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector
from agrobr_spark.sources.xlsx import read_sheet_rows

CONAB_PRODUTOS: dict[str, str] = {
    "soja": "Soja",
    "milho": "Milho Total",
    "milho_1": "Milho 1a",
    "milho_2": "Milho 2a",
    "milho_3": "Milho 3a",
    "arroz": "Arroz Total",
    "arroz_irrigado": "Arroz Irrigado",
    "arroz_sequeiro": "Arroz Sequeiro",
    "feijao": "Feijão Total",
    "feijao_1": "Feijão 1a Total",
    "feijao_2": "Feijão 2a Total",
    "feijao_3": "Feijão 3a Total",
    "algodao": "Algodao Total",
    "trigo": "Trigo",
    "sorgo": "Sorgo",
    "aveia": "Aveia",
    "girassol": "Girassol",
    "mamona": "Mamona",
    "amendoim": "Amendoim Total",
    "centeio": "Centeio",
    "cevada": "Cevada",
    "canola": "Canola",
    "gergelim": "Gergelim",
}

CONAB_UFS = {
    "AC", "AL", "AM", "AP", "BA", "CE", "DF", "ES", "GO", "MA", "MG",
    "MS", "MT", "PA", "PB", "PE", "PI", "PR", "RJ", "RN", "RO", "RR",
    "RS", "SC", "SE", "SP", "TO",
}

CONAB_REGIOES = {"NORTE", "NORDESTE", "CENTRO-OESTE", "SUDESTE", "SUL"}

SAFRA_SCHEMA = (
    "fonte string, produto string, safra string, uf string, "
    "area_plantada double, produtividade double, producao double, "
    "unidade_area string, unidade_producao string, levantamento long"
)


def _parse_decimal(value) -> float | None:
    """Decimal-comma tolerant numeric (ref: v1.py:475-491); '-'/'0'
    placeholders → null."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip().replace(",", ".").replace(" ", "")
    if not s or s in ("0", "-", "NaN", "nan"):
        return None
    try:
        return float(s)
    except ValueError:
        return None


def find_header_row(rows: list[list]) -> int | None:
    for idx, row in enumerate(rows):
        cell0 = str(row[0]).upper() if row and row[0] is not None else ""
        if "REGI" in cell0 or "UF" in cell0 or "PRODUTO" in cell0:
            return idx
    return None


def extract_safra_columns(
    rows: list[list], header_row: int
) -> dict[str, dict[str, int]]:
    """Per-safra (area, produtividade, producao) column indexes
    (ref: v1.py:403-473): block starts come from the merged header
    cells, safra labels from the sub-row beneath."""
    header_cells = rows[header_row]
    safra_cells = rows[header_row + 1] if header_row + 1 < len(rows) else []

    area_start = prod_start = producao_start = None
    for col_idx in range(1, len(header_cells)):
        cell = (
            str(header_cells[col_idx]).upper()
            if header_cells[col_idx] is not None
            else ""
        )
        if "ÁREA" in cell or "AREA" in cell:
            area_start = col_idx
        elif "PRODUTIVIDADE" in cell:
            prod_start = col_idx
        elif "PRODUÇÃO" in cell or "PRODUCAO" in cell:
            producao_start = col_idx

    safras: list[str] = []
    for col_idx in range(1, len(safra_cells)):
        cell = (
            str(safra_cells[col_idx]).strip()
            if safra_cells[col_idx] is not None
            else ""
        )
        if "Safra" in cell or ("/" in cell and "VAR" not in cell.upper()):
            label = cell.replace("Safra ", "").strip()
            if "/" in label:
                parts = label.split("/")
                if len(parts) == 2:
                    ano1 = parts[0].strip()
                    if len(ano1) == 2:
                        ano1 = "20" + ano1
                    full = f"{ano1}/{parts[1].strip()}"
                    if full not in safras:
                        safras.append(full)

    cols: dict[str, dict[str, int]] = {}
    if area_start and prod_start and producao_start and safras:
        for i, safra in enumerate(safras):
            cols[safra] = {
                "area": area_start + i,
                "produtividade": prod_start + i,
                "producao": producao_start + i,
            }
    elif safras:
        for i, safra in enumerate(safras):
            base = 1 + i * 3
            cols[safra] = {
                "area": base,
                "produtividade": base + 3 * len(safras),
                "producao": base + 6 * len(safras),
            }
    return cols


def parse_safra_rows(
    rows: list[list],
    produto: str,
    safra_ref: str | None = None,
    levantamento: int = 1,
) -> list[tuple]:
    header_row = find_header_row(rows)
    if header_row is None:
        raise ValueError(f"conab: no header row found for {produto}")
    safra_cols = extract_safra_columns(rows, header_row)
    out: list[tuple] = []
    for row in rows[header_row + 3 :]:
        uf = str(row[0]).strip() if row and row[0] is not None else None
        if not uf or uf in ("NaN", "nan"):
            continue
        if uf.upper() in CONAB_REGIOES:
            continue
        if uf.upper() not in CONAB_UFS and not any(c.isalpha() for c in uf):
            continue
        for safra, cols in safra_cols.items():
            if safra_ref and safra != safra_ref:
                continue
            get = lambda i: row[i] if i < len(row) else None  # noqa: E731
            area = _parse_decimal(get(cols["area"]))
            produtividade = _parse_decimal(get(cols["produtividade"]))
            producao = _parse_decimal(get(cols["producao"]))
            if area is None and producao is None:
                continue
            out.append((
                "conab", produto.lower(), safra,
                uf.upper() if len(uf) == 2 else None,
                area, produtividade, producao,
                "mil_ha", "mil_ton", levantamento,
            ))
    return out


@register_connector("conab.safras")
def read_safra(
    spark: SparkSession,
    workbook: str | bytes,
    produto: str,
    safra_ref: str | None = None,
    levantamento: int = 1,
) -> DataFrame:
    sheet = CONAB_PRODUTOS.get(produto.lower())
    if sheet is None:
        raise ValueError(f"conab: unsupported produto {produto!r}")
    rows = read_sheet_rows(workbook, sheet)
    data = parse_safra_rows(rows, produto, safra_ref, levantamento)
    df = spark.createDataFrame(data, SAFRA_SCHEMA)
    return df.orderBy("safra", F.asc_nulls_last("uf"))
