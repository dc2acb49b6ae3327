"""CONAB custo-de-produção connector (per-hectare cost sheets).

Reference: agrobr/conab/custo_producao/parser.py:18-27 (COE/COT/CT
total patterns, section-header regex), :30-59 (keyword header-row
discovery), :61-94 (column identification by header vocabulary),
:96-109 (R$/% numeric hygiene), :112-240 (row walk: totals captured
separately, section headers switch the running category);
models.py:93-143 (public CONAB cost-category vocabulary).

Feeds the ``conab.custo_producao`` contract — the last CONAB
sub-source without a connector. Workbook decode is driver-side (one
small sheet per cultura×UF×safra); rows hand off to Spark typed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector
from agrobr_spark.sources.workbook import read_sheet_rows

_COE = re.compile(r"custo\s*operacional\s*efetivo|c\.?\s*o\.?\s*e\.?", re.I)
_COT = re.compile(r"custo\s*operacional\s*total|c\.?\s*o\.?\s*t\.?", re.I)
_CT = re.compile(r"custo\s*total(?!\s*operacional)|c\.?\s*t\.?\s*$", re.I)
_SECTION = re.compile(r"^(i+\s*[-–.]|[abc]\s*[-–.]|\d+\s*[-–.])\s*", re.I)

_HEADER_KEYWORDS = (
    "item", "especificação", "especificacao", "valor", "unidade",
    "quantidade", "preço", "preco", "participação", "participacao",
    "r$/ha", "total/ha",
)

# public CONAB cost-category vocabulary (ref models.py:93-136)
CATEGORIAS_MAP: dict[str, str] = {
    "sementes": "insumos", "fertilizantes": "insumos",
    "adubação de base": "insumos", "adubação de cobertura": "insumos",
    "corretivos": "insumos", "defensivos": "insumos",
    "herbicidas": "insumos", "inseticidas": "insumos",
    "fungicidas": "insumos", "adjuvantes": "insumos",
    "tratamento de sementes": "insumos", "inoculante": "insumos",
    "operações com máquinas": "operacoes", "operações mecânicas": "operacoes",
    "preparo do solo": "operacoes", "plantio": "operacoes",
    "semeadura": "operacoes", "pulverização": "operacoes",
    "pulverizações": "operacoes", "colheita": "operacoes",
    "transporte interno": "operacoes",
    "mão de obra": "mao_de_obra", "mao de obra": "mao_de_obra",
    "empreita": "mao_de_obra",
    "depreciação": "custos_fixos", "manutenção": "custos_fixos",
    "seguros": "custos_fixos", "juros sobre capital fixo": "custos_fixos",
    "assistência técnica": "outros", "arrendamento": "outros",
    "terra": "outros", "cessr": "outros", "funrural": "outros",
    "transporte externo": "outros", "armazenagem": "outros",
}

_SAIDA = (
    "cultura", "uf", "safra", "tecnologia", "categoria", "item", "unidade",
    "quantidade_ha", "preco_unitario", "valor_ha", "participacao_pct",
)


def classify_categoria(item_name: str) -> str:
    lower = item_name.lower().strip()
    for key, cat in CATEGORIAS_MAP.items():
        if key in lower:
            return cat
    return "outros"


def _safe_float(value) -> float | None:
    """pt-BR numeric hygiene incl. thousands dots — '1.234,56' → 1234.56
    (the reference's comma-only replace drops such cells,
    custo_producao/parser.py:96-109; deliberate divergence)."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    s = str(value).strip().replace("R$", "").replace("%", "").replace(" ", "")
    if not s or s == "-":
        return None
    if "," in s:
        s = s.replace(".", "").replace(",", ".")
    elif s.count(".") > 1:
        s = s.replace(".", "")
    try:
        return float(s)
    except ValueError:
        return None


def _find_header_row(rows: list[list]) -> int:
    for i, row in enumerate(rows[:20]):
        text = " ".join(str(v).lower().strip() for v in row if v is not None)
        if sum(1 for kw in _HEADER_KEYWORDS if kw in text) >= 2:
            return i
    raise ValueError("conab_custo: linha de cabeçalho não encontrada")


def _identify_columns(headers: list[str]) -> dict[str, int]:
    mapping: dict[str, int] = {}
    for i, h in enumerate(headers):
        hl = h.lower().strip()
        if any(w in hl for w in ("item", "componente", "especificação",
                                 "especificacao", "discriminação")):
            mapping.setdefault("item", i)
        elif any(w in hl for w in ("unidade", "unid")):
            mapping["unidade"] = i
        elif any(w in hl for w in ("quantidade", "qtd", "qtde", "quant")):
            mapping["quantidade_ha"] = i
        elif any(w in hl for w in ("preço unitário", "preco unitario",
                                   "preço unit", "vlr. unit")):
            mapping["preco_unitario"] = i
        elif any(w in hl for w in ("valor total", "total/ha", "valor/ha",
                                   "vlr. total", "r$/ha")):
            mapping["valor_ha"] = i
        elif any(w in hl for w in ("participação", "participacao", "part.", "%")):
            mapping["participacao_pct"] = i
    return mapping


def parse_planilha_rows(
    rows: list[list], cultura: str, uf: str, safra: str, tecnologia: str = "alta"
) -> tuple[list[dict], dict[str, float | None]]:
    """One item per cost row + the COE/COT/CT totals
    (ref parser.py:112-240)."""
    header_idx = _find_header_row(rows)
    headers = [str(v) if v is not None else "" for v in rows[header_idx]]
    col = _identify_columns(headers)
    if "item" not in col or "valor_ha" not in col:
        raise ValueError(
            f"conab_custo: colunas obrigatórias ausentes (headers={headers})"
        )

    def cell(row: list, key: str):
        i = col.get(key)
        return row[i] if i is not None and i < len(row) else None

    items: list[dict] = []
    totais: dict[str, float | None] = {"coe": None, "cot": None, "ct": None}
    categoria_atual = "outros"
    for row in rows[header_idx + 1 :]:
        nome = str(cell(row, "item") or "").strip()
        if not nome:
            continue
        valor = _safe_float(cell(row, "valor_ha"))
        if _COE.search(nome):
            totais["coe"] = valor if valor is not None else totais["coe"]
            continue
        if _COT.search(nome):
            totais["cot"] = valor if valor is not None else totais["cot"]
            continue
        if _CT.search(nome):
            totais["ct"] = valor if valor is not None else totais["ct"]
            continue
        if _SECTION.match(nome):
            categoria_atual = classify_categoria(nome)
            if valor is None or valor == 0.0:
                continue
        if valor is None:
            possivel = classify_categoria(nome)
            if possivel != "outros":
                categoria_atual = possivel
            continue
        categoria = classify_categoria(nome)
        if categoria == "outros":
            categoria = categoria_atual
        items.append(
            {
                "cultura": cultura.lower().strip(),
                "uf": uf.upper().strip(),
                "safra": safra,
                "tecnologia": tecnologia.lower().strip(),
                "categoria": categoria,
                "item": nome,
                "unidade": (str(cell(row, "unidade")).strip()
                            if cell(row, "unidade") is not None else None),
                "quantidade_ha": _safe_float(cell(row, "quantidade_ha")),
                "preco_unitario": _safe_float(cell(row, "preco_unitario")),
                "valor_ha": valor,
                "participacao_pct": _safe_float(cell(row, "participacao_pct")),
            }
        )
    return items, totais


@register_connector("conab.custo_producao")
def read_custo_producao(
    spark: SparkSession,
    source: str | bytes,
    cultura: str,
    uf: str,
    safra: str,
    tecnologia: str = "alta",
    sheet: str | int = 0,
) -> DataFrame:
    rows = read_sheet_rows(source, sheet)
    items, _ = parse_planilha_rows(rows, cultura, uf, safra, tecnologia)
    if not items:
        raise ValueError("conab_custo: nenhum item extraído")
    return spark.createDataFrame(
        [tuple(r[c] for c in _SAIDA) for r in items],
        "cultura string, uf string, safra string, tecnologia string,"
        " categoria string, item string, unidade string,"
        " quantidade_ha double, preco_unitario double, valor_ha double,"
        " participacao_pct double",
    ).select(*_SAIDA)
