"""S4: PDF table extraction.

Reference: agrobr/anda/parser.py:382-420 — pdfplumber table extraction
from fertilizer bulletins → records. Bulletins are a few pages, so the
decode is driver-side; the DataFrame handoff is the Spark boundary.

pdfplumber is absent in this environment: the page decode gates its
import, while the table→records shaping (header detection, cell
hygiene, empty-row drop) is pure and tested against list-of-lists
fixtures — the same split the Excel reader (S3) uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.excel import find_header_row, rows_to_records


def extract_tables(path: str | bytes) -> list[list[list]]:
    """Decode every table on every page of a PDF (driver-side).

    pdfplumber when available (full layout analysis); otherwise the
    stdlib extractor (``sources/pdf_text.py``) handles the common
    digitally-produced text PDFs — FlateDecode streams + positioned
    text runs grouped geometrically. Scanned/exotic PDFs still raise
    (ValueError) so callers can fall back to fixture-driven parsing.
    """
    try:
        import pdfplumber  # noqa: PLC0415
    except ImportError:
        from agrobr_spark.sources.pdf_text import extract_tables_stdlib

        if isinstance(path, bytes):
            data = path
        else:
            with open(path, "rb") as f:
                data = f.read()
        return extract_tables_stdlib(data)
    tables: list[list[list]] = []
    with pdfplumber.open(path) as pdf:  # pragma: no cover
        for page in pdf.pages:
            tables.extend(page.extract_tables() or [])
    return tables


def pdf_tables_to_df(
    spark: SparkSession,
    tables: list[list[list]],
    header_keywords: list[str],
) -> DataFrame:
    """Shape raw extracted tables into one DataFrame: pick the first
    table containing a header row matching ``header_keywords``, split
    header/data, and hand off to Spark (all-string columns — casts are
    the caller's contract concern, as in the reference's parsers)."""
    for table in tables:
        idx = find_header_row(table, header_keywords)
        if idx is None:
            continue
        cols, data = rows_to_records(table, idx)
        rows = [[None if c is None else str(c) for c in r] for r in data]
        return spark.createDataFrame(rows, schema=", ".join(f"`{c}` string" for c in cols))
    raise ValueError("no table with the expected header found")
