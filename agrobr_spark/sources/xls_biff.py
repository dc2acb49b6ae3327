"""Dependency-free legacy ``.xls`` (OLE2 + BIFF8) sheet reader.

The DERAL weekly crop-condition workbook (and other Brazilian gov
publications) still ship as BIFF8 ``.xls`` inside an OLE2 compound
document — a format pandas only reads via the optional ``xlrd``
package, absent from this environment. Both container and record
formats are publicly documented (MS-CFB and MS-XLS open
specifications), so this module implements the minimal subset those
workbooks use: the compound-file FAT/miniFAT, the SST shared-string
table (including strings spanning CONTINUE records), and the cell
records NUMBER / RK / MULRK / LABELSST / LABEL / FORMULA+STRING /
BOOLERR.

Same interface and row shape as ``sources/xlsx.py`` (dense
list-of-lists, None for empty cells) so the Excel-family connectors
dispatch on magic bytes and share all layout-discovery logic.
Ref behavior: agrobr/deral/parser.py:58-64 (pd.ExcelFile over xls
bytes, header=None).
"""

from __future__ import annotations

import re
import struct

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = -1
_ENDOFCHAIN = -2

# BIFF8 record ids
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_FORMULA = 0x0006
_STRING = 0x0207
_BOOLERR = 0x0205


def _u16(b: bytes, off: int = 0) -> int:
    return int.from_bytes(b[off : off + 2], "little")


def _i32(b: bytes, off: int = 0) -> int:
    return int.from_bytes(b[off : off + 4], "little", signed=True)


def ole_stream(data: bytes, names: tuple[str, ...] = ("Workbook", "Book")) -> bytes:
    """Extract a named stream from an OLE2 compound document (MS-CFB)."""
    if data[:8] != OLE_MAGIC:
        raise ValueError("not an OLE2 compound document")
    sec_shift = _u16(data, 30)
    mini_shift = _u16(data, 32)
    ssz = 1 << sec_shift
    mssz = 1 << mini_shift
    dir_start = _i32(data, 48)
    mini_cutoff = _i32(data, 56)
    minifat_start = _i32(data, 60)
    difat_start = _i32(data, 68)
    num_difat = _i32(data, 72)

    # DIFAT: 109 header entries + chained DIFAT sectors (last int = next)
    difat = [_i32(data, 76 + 4 * i) for i in range(109)]
    s = difat_start
    for _ in range(num_difat):
        if s < 0:
            break
        off = 512 + s * ssz
        ints = [_i32(data, off + 4 * i) for i in range(ssz // 4)]
        difat.extend(ints[:-1])
        s = ints[-1]

    fat: list[int] = []
    for s in difat:
        if s < 0:
            continue
        off = 512 + s * ssz
        fat.extend(_i32(data, off + 4 * i) for i in range(ssz // 4))

    def chain(start: int) -> list[int]:
        out: list[int] = []
        s = start
        seen = set()
        while s >= 0 and s not in seen and s < len(fat):
            seen.add(s)
            out.append(s)
            s = fat[s]
        return out

    def read_chain(start: int, size: int | None = None) -> bytes:
        buf = b"".join(data[512 + s * ssz : 512 + (s + 1) * ssz] for s in chain(start))
        return buf if size is None else buf[:size]

    # directory entries: 128 bytes each
    dirdata = read_chain(dir_start)
    entries: list[tuple[str, int, int, int]] = []
    for i in range(0, len(dirdata) - 127, 128):
        e = dirdata[i : i + 128]
        nlen = _u16(e, 64)
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", errors="ignore")
        entries.append((name, e[66], _i32(e, 116), _i32(e, 120)))

    root = next(e for e in entries if e[1] == 5)
    target = next((e for e in entries if e[0] in names and e[1] == 2), None)
    if target is None:
        raise ValueError(f"no stream named {names} in compound document")
    _, _, start, size = target

    if size >= mini_cutoff:
        return read_chain(start, size)

    # small stream: lives in the root entry's mini stream, chained via miniFAT
    ministream = read_chain(root[2], root[3])
    minifat: list[int] = []
    for s2 in chain(minifat_start):
        off = 512 + s2 * ssz
        minifat.extend(_i32(data, off + 4 * i) for i in range(ssz // 4))
    out = b""
    s = start
    seen: set[int] = set()
    while s >= 0 and s not in seen and s < len(minifat):
        seen.add(s)
        out += ministream[s * mssz : (s + 1) * mssz]
        s = minifat[s]
    return out[:size]


def _rk_value(rk: int) -> float:
    """Decode a 32-bit RK number (MS-XLS 2.5.276)."""
    div100 = rk & 1
    if rk & 2:
        x = rk >> 2
        if x & 0x20000000:
            x -= 0x40000000
        val = float(x)
    else:
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return val / 100.0 if div100 else val


def _records(stream: bytes, start: int = 0):
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        rid = _u16(stream, pos)
        ln = _u16(stream, pos + 2)
        yield rid, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


class _Cursor:
    """Byte cursor over the SST record + its CONTINUE parts.

    Fixed-width fields may be read across part boundaries; character
    data restarts with a fresh option-flags byte at each new part
    (MS-XLS 2.5.293 XLUnicodeRichExtendedString continuation rule).
    """

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.ip = 0
        self.pos = 0

    def _remaining_in_part(self) -> int:
        return len(self.parts[self.ip]) - self.pos

    def _advance_part(self) -> None:
        self.ip += 1
        self.pos = 0

    def at_end(self) -> bool:
        while self.ip < len(self.parts) and self._remaining_in_part() == 0:
            self._advance_part()
        return self.ip >= len(self.parts)

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0 and not self.at_end():
            take = min(n, self._remaining_in_part())
            out += self.parts[self.ip][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return out

    def read_chars(self, cch: int, high: bool) -> str:
        """Read cch characters, re-reading the grbit byte whenever the
        character run crosses into a new CONTINUE part."""
        text = ""
        while cch > 0:
            if self.at_end():
                break
            avail = self._remaining_in_part()
            if avail == 0:
                continue
            width = 2 if high else 1
            n_here = min(cch, avail // width)
            if n_here == 0:
                # char data continues in the next part: new flags byte
                self._advance_part()
                if self.at_end():
                    break
                high = bool(self.parts[self.ip][self.pos] & 1)
                self.pos += 1
                continue
            raw = self.parts[self.ip][self.pos : self.pos + n_here * width]
            self.pos += n_here * width
            text += raw.decode("utf-16-le" if high else "latin-1", errors="replace")
            cch -= n_here
            if cch > 0:
                self._advance_part()
                if self.at_end():
                    break
                high = bool(self.parts[self.ip][self.pos] & 1)
                self.pos += 1
        return text


def _parse_sst(parts: list[bytes]) -> list[str]:
    cur = _Cursor(parts)
    header = cur.read(8)
    unique = _i32(header, 4)
    out: list[str] = []
    for _ in range(unique):
        if cur.at_end():
            break
        cch = _u16(cur.read(2))
        flags = cur.read(1)[0]
        high = bool(flags & 1)
        n_rich = _u16(cur.read(2)) if flags & 8 else 0
        n_ext = _i32(cur.read(4)) if flags & 4 else 0
        out.append(cur.read_chars(cch, high))
        cur.read(4 * n_rich + n_ext)
    return out


def _short_unicode(data: bytes, off: int, cch_width: int = 1) -> tuple[str, int]:
    """ShortXLUnicodeString (sheet names) / XLUnicodeString."""
    if cch_width == 1:
        cch = data[off]
        off += 1
    else:
        cch = _u16(data, off)
        off += 2
    flags = data[off]
    off += 1
    if flags & 1:
        return data[off : off + 2 * cch].decode("utf-16-le", errors="replace"), off + 2 * cch
    return data[off : off + cch].decode("latin-1"), off + cch


def _workbook_parts(source: str | bytes) -> bytes:
    if isinstance(source, (bytes, bytearray)):
        data = bytes(source)
    else:
        with open(source, "rb") as f:
            data = f.read()
    return ole_stream(data)


def sheet_names(source: str | bytes) -> list[str]:
    stream = _workbook_parts(source)
    names: list[str] = []
    for rid, payload in _records(stream):
        if rid == _BOUNDSHEET:
            name, _ = _short_unicode(payload, 6)
            names.append(name)
        elif rid == _EOF:
            break
    return names


def read_sheet_rows(source: str | bytes, sheet: str | int = 0) -> list[list]:
    """Read one sheet as dense list-of-lists (None for empty cells).

    ``sheet`` selects by index, exact name, or case-insensitive regex —
    identical semantics to ``xlsx.read_sheet_rows``.
    """
    stream = _workbook_parts(source)

    sheets: list[tuple[str, int]] = []  # (name, bof offset)
    sst_parts: list[bytes] = []
    collecting_sst = False
    for rid, payload in _records(stream):
        if rid == _BOUNDSHEET:
            name, _ = _short_unicode(payload, 6)
            sheets.append((name, _i32(payload, 0)))
            collecting_sst = False
        elif rid == _SST:
            sst_parts = [payload]
            collecting_sst = True
        elif rid == _CONTINUE and collecting_sst:
            sst_parts.append(payload)
        elif rid == _EOF:
            break
        elif collecting_sst:
            collecting_sst = False
    shared = _parse_sst(sst_parts) if sst_parts else []

    names = [n for n, _ in sheets]
    if isinstance(sheet, int):
        target = sheets[sheet]
    else:
        exact = [s for s in sheets if s[0] == sheet]
        if exact:
            target = exact[0]
        else:
            pat = re.compile(sheet, re.I)
            matches = [s for s in sheets if pat.search(s[0])]
            if not matches:
                raise KeyError(f"no sheet matching {sheet!r} in {names}")
            target = matches[0]

    cells: dict[tuple[int, int], object] = {}
    pending_formula: tuple[int, int] | None = None
    for rid, payload in _records(stream, target[1]):
        if rid == _EOF:
            break
        if rid == _NUMBER:
            r, c = _u16(payload, 0), _u16(payload, 2)
            cells[(r, c)] = struct.unpack("<d", payload[6:14])[0]
        elif rid == _RK:
            r, c = _u16(payload, 0), _u16(payload, 2)
            cells[(r, c)] = _rk_value(_i32(payload, 6))
        elif rid == _MULRK:
            r, c0 = _u16(payload, 0), _u16(payload, 2)
            n = (len(payload) - 6) // 6
            for i in range(n):
                cells[(r, c0 + i)] = _rk_value(_i32(payload, 4 + 6 * i + 2))
        elif rid == _LABELSST:
            r, c = _u16(payload, 0), _u16(payload, 2)
            idx = _i32(payload, 6)
            cells[(r, c)] = shared[idx] if 0 <= idx < len(shared) else None
        elif rid == _LABEL:
            r, c = _u16(payload, 0), _u16(payload, 2)
            text, _ = _short_unicode(payload, 6, cch_width=2)
            cells[(r, c)] = text
        elif rid == _FORMULA:
            r, c = _u16(payload, 0), _u16(payload, 2)
            result = payload[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # string result arrives in next STRING record
                    pending_formula = (r, c)
                elif kind == 1:
                    cells[(r, c)] = bool(result[2])
                # kind 2 (error) / 3 (blank): leave None
            else:
                cells[(r, c)] = struct.unpack("<d", result)[0]
        elif rid == _STRING and pending_formula is not None:
            text, _ = _short_unicode(payload, 0, cch_width=2)
            cells[pending_formula] = text
            pending_formula = None
        elif rid == _BOOLERR:
            r, c = _u16(payload, 0), _u16(payload, 2)
            if payload[7] == 0:
                cells[(r, c)] = bool(payload[6])

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    rows: list[list] = [[None] * n_cols for _ in range(n_rows)]
    for (r, c), v in cells.items():
        if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
            v = int(v)
        rows[r][c] = v
    return rows
