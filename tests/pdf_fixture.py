"""Minimal stdlib PDF writer for test fixtures.

Builds a one-page text PDF (Helvetica, FlateDecode content stream)
from a positioned-cell table — enough to exercise the stdlib PDF text
extractor against a realistic digitally-produced bulletin layout.
"""

from __future__ import annotations

import zlib


def _escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf_table(
    rows: list[list[str]],
    col_x: list[float] | None = None,
    top_y: float = 780.0,
    row_h: float = 16.0,
) -> bytes:
    """One text run per cell at a fixed grid position."""
    ops = ["BT", "/F1 10 Tf"]
    for r, row in enumerate(rows):
        y = top_y - r * row_h
        for c, cell in enumerate(row):
            if cell is None or cell == "":
                continue
            x = (col_x or [50 + 110 * i for i in range(len(row))])[c]
            ops.append(f"1 0 0 1 {x} {y} Tm ({_escape(str(cell))}) Tj")
    ops.append("ET")
    content = zlib.compress("\n".join(ops).encode("latin-1"))

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
        + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
