"""Ingestion connectors (SURVEY §2.1 S1-S9).

Network fetch / file decode happen driver-side (the reference's
regime: agrobr fetches small-to-medium payloads per request); the
moment data is tabular it becomes a DataFrame and everything after is
Catalyst-planned. Heavy formats (CSV/JSON) go straight through
``spark.read`` so scans scale out; layout-discovery formats
(Excel/HTML/PDF) are inherently driver-side extractions from small
files.

Optional decode libs (openpyxl, bs4, pdfplumber) are absent in this
environment: those connectors gate their import and keep the
layout-discovery logic + Spark plumbing real and tested.
"""

from agrobr_spark.sources.csv_ptbr import read_csv_ptbr
from agrobr_spark.sources.json_nested import param_date_value_rows
from agrobr_spark.sources.excel import find_header_row, read_excel_table
from agrobr_spark.sources.html import extract_tables
from agrobr_spark.sources.wfs import build_getfeature_url
from agrobr_spark.sources.sinks import read_verified, write_with_provenance

__all__ = [
    "read_csv_ptbr",
    "param_date_value_rows",
    "find_header_row",
    "read_excel_table",
    "extract_tables",
    "build_getfeature_url",
    "read_verified",
    "write_with_provenance",
]

# S7: BigQuery fallback scan (ref: agrobr/bcb/bigquery_client.py:60-120)
# — full option-plumbing + credit-dataset semantics in
# sources/bigquery.py; the connector jar is absent here, so load()
# stays env-gated while everything else is unit-tested.
from agrobr_spark.sources.bigquery import read_bigquery  # noqa: E402

__all__.append("read_bigquery")
