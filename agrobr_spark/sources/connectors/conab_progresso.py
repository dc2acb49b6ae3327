"""CONAB progresso-de-safra connector (weekly planting/harvest pct).

Reference: agrobr/conab/progresso/parser.py:50-88 (sheet pick by
'progresso' name), :97-186 (row state machine: cultura header
``<Cultura> - Safra YYYY/YY``, operação header Semeadura/Colheita,
week-date header row, then one row per estado with 4 pct columns),
models.py:61-99 (output order, header regexes, estado→UF).

Feeds the ``conab.progresso_safra`` contract. The stdlib workbook
reader returns raw date serials for the week-header cells; they are
detected by serial range and converted — pandas' datetime detection
is reproduced without any Excel style parsing.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector
from agrobr_spark.sources.workbook import read_sheet_rows, sheet_names

_RE_CULTURA = re.compile(r"^(.+?)\s*-\s*Safra\s+(\d{4}/\d{2})$")
_RE_OPERACAO = re.compile(r"^(Semeadura|Colheita)\s*\*?\s*$")

_EXCEL_EPOCH = dt.date(1899, 12, 30)

ESTADOS_UF: dict[str, str] = {
    "ACRE": "AC", "ALAGOAS": "AL", "AMAPÁ": "AP", "AMAZONAS": "AM",
    "BAHIA": "BA", "CEARÁ": "CE", "DISTRITO FEDERAL": "DF",
    "ESPÍRITO SANTO": "ES", "GOIÁS": "GO", "MARANHÃO": "MA",
    "MATO GROSSO": "MT", "MATO GROSSO DO SUL": "MS", "MINAS GERAIS": "MG",
    "PARÁ": "PA", "PARAÍBA": "PB", "PARANÁ": "PR", "PERNAMBUCO": "PE",
    "PIAUÍ": "PI", "RIO DE JANEIRO": "RJ", "RIO GRANDE DO NORTE": "RN",
    "RIO GRANDE DO SUL": "RS", "RONDÔNIA": "RO", "RORAIMA": "RR",
    "SANTA CATARINA": "SC", "SÃO PAULO": "SP", "SERGIPE": "SE",
    "TOCANTINS": "TO",
}

_SAIDA = (
    "cultura", "safra", "operacao", "estado", "semana_atual",
    "pct_ano_anterior", "pct_semana_anterior", "pct_semana_atual",
    "pct_media_5_anos",
)


def _safe_pct(val) -> float | None:
    """'%'-suffixed cells are percent units → always /100 (the
    reference divides only when v > 1, progresso/parser.py:25-38, so
    '0,5%' comes back as 0.5 = 50% — scale mixing within one column;
    deliberate divergence). Bare numbers pass through (already
    fractions in the workbook)."""
    if val is None:
        return None
    if isinstance(val, (int, float)):
        return float(val)
    s = str(val).strip().replace(",", ".").rstrip("%").strip()
    if not s:
        return None
    try:
        v = float(s)
        return v / 100.0 if "%" in str(val) else v
    except ValueError:
        return None


def _is_date_serial(v) -> bool:
    return isinstance(v, (int, float)) and 30000 <= float(v) <= 80000


def _serial_to_iso(v) -> str:
    return (_EXCEL_EPOCH + dt.timedelta(days=int(v))).strftime("%Y-%m-%d")


def _estado_uf(label: str) -> str:
    cleaned = re.sub(r"\s+", " ", label.strip())
    return ESTADOS_UF.get(cleaned.upper(), cleaned)


def parse_rows(rows: list[list]) -> list[tuple]:
    records: list[tuple] = []
    cultura = safra = operacao = None
    semana = ""
    in_data = False
    for row in rows:
        vals = list(row) + [None] * (6 - len(row))
        col1 = str(vals[1]).strip() if vals[1] is not None else ""

        m = _RE_CULTURA.match(col1)
        if m:
            cultura, safra = m.group(1).strip(), m.group(2).strip()
            operacao, in_data = None, False
            continue
        m = _RE_OPERACAO.match(col1)
        if m:
            operacao, in_data = m.group(1), False
            continue
        if col1 == "Estado" and cultura and operacao:
            in_data = False
            continue
        # year sub-header row (bare years in the date columns)
        if col1 == "" and isinstance(vals[2], int) and 2000 <= vals[2] <= 2100:
            continue
        # week-date header: columns 2..4 all date serials
        date_vals = [vals[i] for i in range(2, 5) if vals[i] is not None]
        if date_vals and all(_is_date_serial(v) for v in date_vals):
            semana = _serial_to_iso(date_vals[-1])
            in_data = True
            continue
        if not in_data or not cultura or not operacao:
            continue
        estado = col1
        if not estado or estado.startswith(("*", "(")):
            continue
        low = estado.lower()
        if "estados" in low or "brasil" in low:
            continue
        if low.startswith(("valores", "percentual")):
            in_data = False
            continue
        if low.startswith("estimativa"):
            continue
        records.append(
            (
                cultura, safra, operacao, _estado_uf(estado), semana,
                _safe_pct(vals[2]), _safe_pct(vals[3]),
                _safe_pct(vals[4]), _safe_pct(vals[5]),
            )
        )
    return records


@register_connector("conab.progresso")
def read_progresso(spark: SparkSession, source: str | bytes) -> DataFrame:
    names = sheet_names(source)
    target = next((n for n in names if "progresso" in n.lower()), names[0])
    records = parse_rows(read_sheet_rows(source, target))
    if not records:
        raise ValueError("conab_progresso: nenhum registro extraido")
    df = spark.createDataFrame(
        records,
        "cultura string, safra string, operacao string, estado string,"
        " semana_atual string, pct_ano_anterior double,"
        " pct_semana_anterior double, pct_semana_atual double,"
        " pct_media_5_anos double",
    )
    return df.select(*_SAIDA)
