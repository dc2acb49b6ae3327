"""S3: Excel scan with layout discovery.

Reference: agrobr/conab/parsers/v1.py:24-115,396-473 — pick sheet by
name pattern, locate the header row by content scan, read wide
multi-safra column blocks. Files are small (a CONAB workbook is <1 MB)
so decode is driver-side; the DataFrame handoff is the Spark boundary.

openpyxl is absent in this environment: the workbook decode gates its
import, while the header-discovery logic (the hard part) is pure and
tested against list-of-lists fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def find_header_row(
    rows: list[list], keywords: list[str], search_limit: int = 20
) -> int | None:
    """Locate the header row: first row (within ``search_limit``) whose
    cells contain every keyword, case/space-insensitively
    (ref: conab/parsers/v1.py:396-401, conab/serie_historica/
    parser.py:49-62)."""
    kws = [k.strip().lower() for k in keywords]
    for i, row in enumerate(rows[:search_limit]):
        cells = [str(c).strip().lower() for c in row if c is not None]
        if all(any(kw in cell for cell in cells) for kw in kws):
            return i
    return None


def rows_to_records(
    rows: list[list], header_idx: int
) -> tuple[list[str], list[list]]:
    """Split discovered-header sheet rows into (columns, data_rows),
    dropping fully-empty trailing rows."""
    header = [str(c).strip() if c is not None else "" for c in rows[header_idx]]
    data = [
        r
        for r in rows[header_idx + 1 :]
        if any(c is not None and str(c).strip() != "" for c in r)
    ]
    width = len(header)
    data = [list(r[:width]) + [None] * (width - len(r)) for r in data]
    return header, data


def read_excel_table(
    spark: SparkSession,
    path: str,
    sheet_pattern: str,
    header_keywords: list[str],
) -> DataFrame:
    """Open a workbook, discover the layout, return a DataFrame.

    Requires openpyxl; raises a clear error when absent (decode is the
    only gated step — discovery + DataFrame assembly are exercised via
    ``find_header_row``/``rows_to_records`` directly in tests).
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover — absent in this env
        raise NotImplementedError(
            "read_excel_table needs openpyxl (not installed here); "
            "decode the sheet to rows and use rows_to_records instead"
        ) from e
    import re

    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    sheet = next(s for s in wb.sheetnames if re.search(sheet_pattern, s, re.I))
    rows = [list(r) for r in wb[sheet].iter_rows(values_only=True)]
    idx = find_header_row(rows, header_keywords)
    if idx is None:
        raise ValueError(f"no header row matching {header_keywords} in {path}")
    header, data = rows_to_records(rows, idx)
    return spark.createDataFrame(
        [tuple(str(c) if c is not None else None for c in r) for r in data],
        ", ".join(f"`{h or f'col{i}'}` string" for i, h in enumerate(header)),
    )
