"""Format-dispatching Excel workbook reader (xlsx zip or legacy xls).

Brazilian gov sources mix OOXML ``.xlsx`` (CONAB, ABIOVE, MapBiomas)
and legacy BIFF8 ``.xls`` (DERAL PC.xls) — often with misleading file
extensions, so dispatch is by magic bytes, never by name. Both
backends return identical dense list-of-lists rows.
"""

from __future__ import annotations

from agrobr_spark.sources import xls_biff, xlsx

_ZIP_MAGIC = b"PK\x03\x04"


def _head(source: str | bytes) -> bytes:
    if isinstance(source, (bytes, bytearray)):
        return bytes(source[:8])
    with open(source, "rb") as f:
        return f.read(8)


def _backend(source: str | bytes):
    head = _head(source)
    if head[:4] == _ZIP_MAGIC:
        return xlsx
    if head == xls_biff.OLE_MAGIC:
        return xls_biff
    raise ValueError(
        "unrecognized workbook format (expected xlsx zip or OLE2 xls)"
    )


def sheet_names(source: str | bytes) -> list[str]:
    return _backend(source).sheet_names(source)


def read_sheet_rows(source: str | bytes, sheet: str | int = 0) -> list[list]:
    return _backend(source).read_sheet_rows(source, sheet)
