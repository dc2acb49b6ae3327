"""Dependency-free XLSX sheet reader (zip + XML, stdlib only).

An .xlsx workbook is a zip archive of XML parts; cell values live in
``xl/worksheets/sheetN.xml`` with shared strings interned in
``xl/sharedStrings.xml``. This reader covers the subset the CONAB /
ABIOVE / DERAL workbooks use (shared + inline strings, numbers,
booleans) and returns plain list-of-lists rows — the same fixture
shape ``sources/excel.py``'s layout-discovery helpers consume.

Replaces the earlier openpyxl capability gate (ref behavior:
agrobr/conab/parsers/v1.py:39 pd.read_excel(header=None)). Files are
small (<1 MB) so decode is driver-side; the DataFrame handoff after
layout discovery is the Spark boundary.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'B'->1, ..., 'AA'->26."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    # numeric: int when exact, else float
    try:
        f = float(v.text)
        return int(f) if f.is_integer() and "e" not in v.text.lower() else f
    except ValueError:  # malformed numeric cell — keep raw text
        return v.text


def sheet_names(source: str | bytes) -> list[str]:
    with zipfile.ZipFile(_as_file(source)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        return [s.get("name", "") for s in wb.iter(f"{_NS}sheet")]


def _as_file(source: str | bytes):
    return io.BytesIO(source) if isinstance(source, bytes) else source


def read_sheet_rows(
    source: str | bytes, sheet: str | int = 0
) -> list[list]:
    """Read one sheet as dense list-of-lists (None for empty cells).

    ``sheet`` is an index, an exact name, or a regex pattern matched
    case-insensitively against sheet names (the reference selects
    CONAB sheets by product-name pattern, conab/parsers/v1.py:30-39).
    """
    with zipfile.ZipFile(_as_file(source)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = list(wb.iter(f"{_NS}sheet"))
        names = [s.get("name", "") for s in sheets]
        if isinstance(sheet, int):
            target = sheets[sheet]
        else:
            exact = [s for s in sheets if s.get("name") == sheet]
            if exact:
                target = exact[0]
            else:
                pat = re.compile(sheet, re.I)
                matches = [s for s in sheets if pat.search(s.get("name", ""))]
                if not matches:
                    raise KeyError(f"no sheet matching {sheet!r} in {names}")
                target = matches[0]

        # rId -> part path via workbook rels
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_map = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(
                "{http://schemas.openxmlformats.org/package/2006/relationships}"
                "Relationship"
            )
        }
        part = rel_map[target.get(_REL_NS)].lstrip("/")
        part = part if part.startswith("xl/") else f"xl/{part}"

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        sheet_xml = ET.fromstring(zf.read(part))
        rows: list[list] = []
        max_width = 0
        for row_el in sheet_xml.iter(f"{_NS}row"):
            # Excel omits fully-empty <row> elements; place each row at
            # its true 1-based ``r`` index so fixed-offset layouts (the
            # CONAB header_row+N convention) don't shift — matches
            # pd.read_excel(header=None), which preserves row gaps.
            r_attr = row_el.get("r")
            if r_attr and r_attr.isdigit():
                target_idx = int(r_attr) - 1
                while len(rows) < target_idx:
                    rows.append([])
            cells: dict[int, object] = {}
            for cell in row_el.iter(f"{_NS}c"):
                ref = cell.get("r", "")
                m = _CELL_REF_RE.match(ref)
                idx = _col_index(m.group(1)) if m else len(cells)
                cells[idx] = _cell_value(cell, shared)
            width = max(cells) + 1 if cells else 0
            max_width = max(max_width, width)
            row = [None] * width
            for i, v in cells.items():
                row[i] = v
            rows.append(row)
        return [r + [None] * (max_width - len(r)) for r in rows]
