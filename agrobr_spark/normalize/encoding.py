"""F12: encoding detection / fallback decode for legacy gov payloads.

Reference: agrobr/normalize/encoding.py:10-83 — declared encoding
first, then a fixed 5-step chain (utf-8, iso-8859-1, windows-1252,
utf-16, ascii), then a confidence-gated chardet guess (>0.7), then a
forced utf-8 decode with replacement as the never-fail floor.

Driver-side by design: encodings are sniffed once per payload/file
head, never per row — the decoded text then feeds a distributed scan
(spark.read.csv with the detected charset, or createDataFrame for
small API payloads).
"""

from __future__ import annotations

ENCODING_CHAIN: tuple[str, ...] = (
    "utf-8",
    "iso-8859-1",
    "windows-1252",
    "utf-16",
    "ascii",
)

CHARDET_CONFIDENCE_GATE = 0.7


def decode_content(
    content: bytes, declared_encoding: str | None = None
) -> tuple[str, str]:
    """Decode ``content`` -> (text, encoding_used). Never raises."""
    if declared_encoding:
        try:
            return content.decode(declared_encoding), declared_encoding
        except (UnicodeDecodeError, LookupError):
            pass

    for encoding in ENCODING_CHAIN:
        try:
            return content.decode(encoding), encoding
        except UnicodeDecodeError:
            continue

    # chardet is optional in this environment; the chain above already
    # covers every encoding Brazilian gov files actually use.
    try:  # pragma: no cover — chardet absent here
        import chardet

        detected = chardet.detect(content)
        enc = detected.get("encoding")
        if enc and detected.get("confidence", 0.0) > CHARDET_CONFIDENCE_GATE:
            try:
                return content.decode(enc), enc
            except (UnicodeDecodeError, LookupError):
                pass
    except ImportError:
        pass

    return content.decode("utf-8", errors="replace"), "utf-8-replaced"


def detect_encoding(content: bytes, declared: str | None = None) -> str:
    """The encoding ``decode_content`` would use (no decode returned)."""
    return decode_content(content, declared)[1]
