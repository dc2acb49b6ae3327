"""S1: HTML table scan — find the data table, extract rows.

Reference: agrobr/cepea/parsers/v1.py:73-157 (_find_data_table: by
id/class regex, largest-table heuristic, header-keyword match),
noticias_agricolas/parser.py:120-160, b3/parser.py:49-123.

bs4 is absent here, so extraction is a small regex-based parser —
adequate for the reference's well-formed gov/exchange tables and
dependency-free. Driver-side by design (payloads are single HTML
pages); the output list feeds ``spark.createDataFrame``.
"""

from __future__ import annotations

import html as _html
import re

_TABLE_RE = re.compile(r"<table\b[^>]*>.*?</table>", re.S | re.I)
_ROW_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr>", re.S | re.I)
_CELL_RE = re.compile(r"<t[hd]\b[^>]*>(.*?)</t[hd]>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_ATTR_RE = re.compile(r'(?:id|class)\s*=\s*["\']([^"\']*)["\']', re.I)


def _clean(cell: str) -> str:
    txt = _TAG_RE.sub("", cell)
    # full entity decode (&ccedil; &atilde; &nbsp; …) — bs4-equivalent
    txt = _html.unescape(txt)
    return re.sub(r"\s+", " ", txt, flags=re.UNICODE).strip()


def extract_tables(html: str) -> list[dict]:
    """All tables as dicts: {attrs, headers, rows(list[list[str]])}."""
    out = []
    for m in _TABLE_RE.finditer(html):
        block = m.group(0)
        attrs = _ATTR_RE.findall(block.split(">", 1)[0])
        rows = []
        for rm in _ROW_RE.finditer(block):
            cells = [_clean(c) for c in _CELL_RE.findall(rm.group(1))]
            if cells:
                rows.append(cells)
        if not rows:
            continue
        out.append({"attrs": attrs, "headers": rows[0], "rows": rows[1:]})
    return out


def find_data_table(
    html: str,
    attr_pattern: str | None = None,
    header_keywords: list[str] | None = None,
) -> dict | None:
    """The reference's selection heuristic chain
    (ref: cepea/parsers/v1.py:131-157): attr regex match first, then
    header-keyword match, then largest table."""
    tables = extract_tables(html)
    if not tables:
        return None
    if attr_pattern:
        pat = re.compile(attr_pattern, re.I)
        for t in tables:
            if any(pat.search(a) for a in t["attrs"]):
                return t
    if header_keywords:
        kws = [k.lower() for k in header_keywords]
        for t in tables:
            hdr = " ".join(t["headers"]).lower()
            if all(k in hdr for k in kws):
                return t
    return max(tables, key=lambda t: len(t["rows"]))
