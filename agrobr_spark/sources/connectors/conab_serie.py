"""CONAB série-histórica connector (per-crop area/production/yield).

Reference: agrobr/conab/serie_historica/parser.py:50-63 (header-row
discovery: first row with ≥2 safra-shaped cells), :66-90 (safra header
normalization incl. 2- and 4-digit year variants), :94-141 (row
classification UF/região/Brasil + the null-marker regime: ``-``,
``...``, ``(…)``, ``*`` and **zero-as-missing**, parser.py:117-141 —
the round-2 gap list called out exactly this handling), :204-247
(safra-column melt), :260-330 (metric merge across sheets keyed on
(safra, uf, região)).

Workbook decode is driver-side; the wide merged records hand off to
Spark typed and sorted like the reference output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import register_connector
from agrobr_spark.sources.workbook import read_sheet_rows, sheet_names

_SAFRA_PATTERN = re.compile(r"\d{4}/\d{2,4}")
_YEAR_PATTERN = re.compile(r"^\d{4}$")
_UF_RE = re.compile(
    r"\b(AC|AL|AM|AP|BA|CE|DF|ES|GO|MA|MG|MS|MT|PA|PB|PE|PI|PR|RJ|RN|RO|RR|"
    r"RS|SC|SE|SP|TO)\b"
)

UFS = set(
    "AC AL AM AP BA CE DF ES GO MA MG MS MT PA PB PE PI PR RJ RN RO RR RS SC "
    "SE SP TO".split()
)
REGIOES = ("NORTE", "NORDESTE", "CENTRO-OESTE", "SUDESTE", "SUL")
_BRASIL = {"BRASIL", "TOTAL", "TOTAL BRASIL", "TOTAL GERAL", "BRASIL/TOTAL"}

SHEET_METRIC = {
    "area": "area_plantada_mil_ha",
    "producao": "producao_mil_ton",
    "produtividade": "produtividade_kg_ha",
}

_SAIDA = (
    "produto", "safra", "regiao", "uf", "area_plantada_mil_ha",
    "producao_mil_ton", "produtividade_kg_ha",
)


def _strip_accents(s: str) -> str:
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFKD", s)
        if not unicodedata.combining(c)
    )


def _metric_for_sheet(name: str) -> str | None:
    low = _strip_accents(name).lower()
    for key, metric in SHEET_METRIC.items():
        if key in low:
            return metric
    return None


def _normalize_safra(value) -> str | None:
    """'1976/77', '1976/1977', '76/77', bare year → 'YYYY/YY'
    (ref parser.py:66-90)."""
    v = str(value).strip()
    m = re.match(r"(\d{4})/(\d{4})$", v)
    if m:
        return f"{m.group(1)}/{m.group(2)[2:]}"
    if re.match(r"(\d{4})/(\d{2})$", v):
        return v
    m = re.match(r"(\d{2})/(\d{2})$", v)
    if m:
        prefix = "20" if int(m.group(1)) < 50 else "19"
        return f"{prefix}{m.group(1)}/{m.group(2)}"
    m = re.match(r"^(\d{4})$", v)
    if m and 1970 <= int(m.group(1)) <= 2050:
        y = int(m.group(1))
        return f"{y}/{str(y + 1)[2:]}"
    return None


def _safe_valor(value) -> float | None:
    """Null-marker regime incl. zero-as-missing
    (ref parser.py:117-141)."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        v = float(value)
        return v if v != 0.0 else None
    s = (
        str(value).strip().replace(",", ".").replace(" ", "")
        .replace("(", "").replace(")", "").replace("*", "")
    )
    if not s or s in ("-", "..."):
        return None
    try:
        v = float(s)
        return v if v != 0.0 else None
    except ValueError:
        return None


def _classify(label: str) -> tuple[str, str | None, str | None]:
    upper = label.upper().strip()
    if upper in _BRASIL:
        return "brasil", None, None
    if upper in REGIOES:
        return "regiao", upper, None
    for regiao in REGIOES:
        if regiao in upper:
            return "regiao", regiao, None
    if upper in UFS:
        return "uf", None, upper
    m = _UF_RE.search(upper)
    if m:
        return "uf", None, m.group(1)
    return "unknown", None, None


def _parse_sheet(rows: list[list], metric: str) -> list[dict]:
    header_idx = None
    for i, row in enumerate(rows[:20]):
        texts = [str(v).strip() for v in row if v is not None]
        hits = sum(
            1 for t in texts if _SAFRA_PATTERN.search(t) or _YEAR_PATTERN.match(t)
        )
        if hits >= 2:
            header_idx = i
            break
    if header_idx is None:
        return []
    header = rows[header_idx]
    safra_cols = [
        (j, _normalize_safra(h))
        for j, h in enumerate(header)
        if h is not None and _normalize_safra(h)
    ]
    label_col = 0
    for j, h in enumerate(header):
        low = str(h or "").lower()
        if any(w in low for w in ("região", "regiao", "uf", "estado", "unidade")):
            label_col = j
            break
    out: list[dict] = []
    regiao_atual: str | None = None
    for row in rows[header_idx + 1 :]:
        label = (
            str(row[label_col]).strip()
            if label_col < len(row) and row[label_col] is not None
            else ""
        )
        if not label:
            continue
        kind, regiao, uf = _classify(label)
        if kind == "regiao":
            regiao_atual = regiao
            continue
        if kind in ("brasil", "unknown"):
            if kind == "brasil":
                regiao_atual = None
            continue
        for j, safra in safra_cols:
            valor = _safe_valor(row[j]) if j < len(row) else None
            if valor is None:
                continue
            out.append(
                {
                    "safra": safra,
                    "uf": uf,
                    "regiao": regiao_atual,
                    metric: valor,
                }
            )
    return out


@register_connector("conab.serie_historica")
def read_serie_historica(
    spark: SparkSession,
    source: str | bytes,
    produto: str,
    inicio: int | None = None,
    fim: int | None = None,
    uf: str | None = None,
) -> DataFrame:
    produto_norm = produto.lower().strip().replace(" ", "_")
    merged: dict[tuple, dict] = {}
    for name in sheet_names(source):
        metric = _metric_for_sheet(name)
        if metric is None:
            continue
        try:
            rows = read_sheet_rows(source, name)
        except Exception:  # noqa: BLE001 — sheet-level tolerance (ref :272-278)
            continue
        for rec in _parse_sheet(rows, metric):
            safra_year = int(rec["safra"][:4])
            if inicio is not None and safra_year < inicio:
                continue
            if fim is not None and safra_year > fim:
                continue
            if uf and (rec["uf"] or "") != uf.upper():
                continue
            key = (rec["safra"], rec["uf"] or "", rec["regiao"] or "")
            base = merged.setdefault(
                key,
                {
                    "produto": produto_norm,
                    "safra": rec["safra"],
                    "uf": rec["uf"],
                    "regiao": rec["regiao"],
                },
            )
            base[metric] = rec[metric]
    if not merged:
        raise ValueError(
            f"conab_serie_historica: nenhum registro (produto={produto})"
        )
    records = sorted(
        merged.values(), key=lambda r: (r["safra"], r["uf"] or "", r["regiao"] or "")
    )
    df = spark.createDataFrame(
        [
            tuple(r.get(c) for c in _SAIDA)
            for r in records
        ],
        "produto string, safra string, regiao string, uf string,"
        " area_plantada_mil_ha double, producao_mil_ton double,"
        " produtividade_kg_ha double",
    )
    return df.select(*_SAIDA)
