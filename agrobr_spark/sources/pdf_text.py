"""Dependency-free text/table extraction for simple text-based PDFs.

pdfplumber is absent from this environment, but the ANDA-style
bulletins (ref agrobr/anda/parser.py:382-420) are digitally-produced
text PDFs: every cell is a positioned text run in a FlateDecode
content stream. The PDF graphics model is publicly specified
(ISO 32000); this module implements the minimal subset such documents
use:

- object scan (``N 0 obj … endobj``) without a cross-reference table,
- ``FlateDecode`` stream decompression (stdlib zlib),
- text operators ``BT/ET  Tm Td TD T* Tj TJ '`` with the text matrix
  tracked for run positions,
- literal ``(…)`` (with escapes) and hex ``<…>`` string arguments,

then recovers tables by grouping runs into rows on the y coordinate
and splitting columns on x gaps — the same geometric heuristic
pdfplumber's text strategy applies to ruled-less tables. Scanned or
exotically-encoded PDFs are out of scope and raise ``ValueError``
(the honest gate stays honest).
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _decode_streams(pdf: bytes) -> list[bytes]:
    """All decodable content streams in document order."""
    out: list[bytes] = []
    for m in _OBJ_RE.finditer(pdf):
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        raw = sm.group(1)
        if b"FlateDecode" in body:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        out.append(raw)
    return out


def _parse_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a literal string starting at ``(``; returns (text, next)."""
    depth = 1
    i += 1
    chars: list[str] = []
    while i < len(data) and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(data)) and data[j : j + 1].isdigit():
                    j += 1
                chars.append(chr(int(data[i + 1 : j], 8)))
                i = j
                continue
            chars.append(_ESCAPES.get(nxt, nxt.decode("latin-1")))
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                i += 1
                break
        if depth:
            chars.append(c.decode("latin-1"))
        i += 1
    return "".join(chars), i


_TOKEN_RE = re.compile(
    rb"\(|<[0-9A-Fa-f\s]*>|[-+]?\d*\.?\d+|/[^\s/\[\]()<>]+|\[|\]|[A-Za-z'\"*]+"
)


def extract_text_runs(pdf: bytes) -> list[tuple[float, float, str]]:
    """(y, x, text) for every shown string, in stream order."""
    runs: list[tuple[float, float, str]] = []
    for stream in _decode_streams(pdf):
        x = y = 0.0
        leading = 0.0
        stack: list[float] = []
        i = 0
        pending: list[str] = []  # numeric operand stack (as floats)
        nums: list[float] = []
        in_array: list[str] | None = None
        while i < len(stream):
            c = stream[i : i + 1]
            if c == b"(":
                text, i = _parse_string(stream, i)
                if in_array is not None:
                    in_array.append(text)
                else:
                    pending.append(text)
                continue
            m = _TOKEN_RE.match(stream, i)
            if not m:
                i += 1
                continue
            tok = m.group(0)
            i = m.end()
            if tok == b"[":
                in_array = []
                continue
            if tok == b"]":
                pending.append("".join(in_array or []))
                in_array = None
                continue
            if tok.startswith(b"<") and tok.endswith(b">"):
                hx = re.sub(rb"\s", b"", tok[1:-1])
                if len(hx) % 2:
                    hx += b"0"
                text = bytes.fromhex(hx.decode()).decode("latin-1")
                (in_array if in_array is not None else pending).append(text)
                continue
            if re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
                if in_array is None:  # array numbers are kerning — ignore
                    nums.append(float(tok))
                continue
            op = tok.decode("latin-1", errors="replace")
            if op == "Tm" and len(nums) >= 6:
                x, y = nums[-2], nums[-1]
            elif op in ("Td", "TD") and len(nums) >= 2:
                x += nums[-2]
                y += nums[-1]
                if op == "TD":
                    leading = -nums[-1]
            elif op == "TL" and nums:
                leading = nums[-1]
            elif op == "T*":
                y -= leading
            elif op in ("Tj", "'") :
                if op == "'":
                    y -= leading
                for t in pending:
                    runs.append((y, x, t))
            elif op == "TJ":
                for t in pending:
                    runs.append((y, x, t))
            elif op == "BT":
                x = y = 0.0
            elif op == "q":
                stack.append(y)
            elif op == "Q" and stack:
                stack.pop()
            if op in ("Tj", "TJ", "'"):
                pending = []
            if op.isalpha() or op in ("'", '"', "T*"):
                nums = []
        # stream done
    return runs


def runs_to_table(
    runs: list[tuple[float, float, str]],
    y_tol: float = 2.0,
    min_col_gap: float = 10.0,
) -> list[list[str]]:
    """Group positioned runs into a row/column grid.

    Rows cluster on y within ``y_tol``. Columns are binned **globally**
    — distinct x starts across the whole table cluster into column
    positions — so a row that skips its leading cell (the classic
    year-header row above month labels) still lands its values under
    the right columns instead of shifting left.
    """
    if not runs:
        return []
    rows: list[tuple[float, list[tuple[float, str]]]] = []
    for y, x, text in sorted(runs, key=lambda r: (-r[0], r[1])):
        if not text.strip():
            continue
        if rows and abs(rows[-1][0] - y) <= y_tol:
            rows[-1][1].append((x, text))
        else:
            rows.append((y, [(x, text)]))

    # global column bins from all x starts
    xs = sorted({x for _, cells in rows for x, _ in cells})
    bins: list[float] = []
    for x in xs:
        if not bins or x - bins[-1] >= min_col_gap:
            bins.append(x)

    def bin_of(x: float) -> int:
        best = 0
        for i, b in enumerate(bins):
            if x >= b - min_col_gap / 2:
                best = i
        return best

    # header-only columns (e.g. a wide title run) would force empty
    # cells everywhere; keep only bins used by >1 row or by most rows
    table: list[list[str]] = []
    width = len(bins)
    for _, cells in rows:
        cells.sort()
        out = [""] * width
        for x, text in cells:
            i = bin_of(x)
            out[i] = (out[i] + text) if out[i] else text
        table.append([c.strip() for c in out])
    # drop fully-empty trailing columns, then strip per-row trailing
    # empties so single-cell title rows stay single-cell
    used = [any(r[i] for r in table) for i in range(width)]
    table = [[c for i, c in enumerate(r) if used[i]] for r in table]
    trimmed: list[list[str]] = []
    for r in table:
        while r and r[-1] == "":
            r = r[:-1]
        trimmed.append(r)
    return trimmed


def extract_tables_stdlib(pdf: bytes) -> list[list[list[str]]]:
    """One recovered table per PDF (simple-layout documents)."""
    runs = extract_text_runs(pdf)
    if not runs:
        raise ValueError(
            "no text runs decoded — scanned or unsupported PDF encoding"
        )
    table = runs_to_table(runs)
    return [table] if table else []
