"""S2: pt-BR CSV scan — `;` separator, legacy encodings, bad-line drop,
projection, pt-BR numeric/date casts.

Reference: agrobr/comexstat/parser.py:29-62, antaq/parser.py:19-49,
alt/antt_pedagio/parser.py:183-217 (sep autodetect, dtype=str then
cast, usecols, on_bad_lines=skip, encoding fallback).

Spark-native: ``spark.read.csv`` with mode=DROPMALFORMED — the scan
distributes, predicate/projection push into the reader. Separator and
encoding detection sample only the file head driver-side (cheap,
constant work), never the full file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.normalize.expressions import parse_ptbr_number

_ENCODINGS = ("UTF-8", "ISO-8859-1")  # fallback chain head (F12)


def _sniff(path: str, encoding: str | None) -> tuple[str, str]:
    """Detect (sep, encoding) from the first KB, driver-side
    (ref: comexstat/parser.py sep autodetect; normalize/encoding.py
    fallback chain distilled to the two encodings Brazilian gov files
    actually use)."""
    raw = open(path, "rb").read(4096)
    if encoding is None:
        for enc in _ENCODINGS:
            try:
                raw.decode(enc)
                encoding = enc
                break
            except UnicodeDecodeError:
                continue
        else:
            encoding = "ISO-8859-1"  # never fails; mojibake over crash
    head = raw.decode(encoding, errors="replace").splitlines()
    first = head[0] if head else ""
    sep = ";" if first.count(";") >= first.count(",") and ";" in first else ","
    return sep, encoding


def read_csv_ptbr(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sep: str | None = None,
    encoding: str | None = None,
    usecols: list[str] | None = None,
    decimal_cols: list[str] | None = None,
    date_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Read a pt-BR CSV into a typed DataFrame.

    All columns land as strings first (the reference's dtype=str
    regime), then pt-BR casts are applied as expressions: decimal
    comma, `dd/MM/yyyy` dates — invalid values coerce to NULL.
    """
    if sep is None or encoding is None:
        s_sep, s_enc = _sniff(path, encoding)
        sep = sep or s_sep
        encoding = encoding or s_enc
    reader = (
        spark.read.option("sep", sep)
        .option("encoding", encoding)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
    )
    if schema:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if usecols:
        df = df.select(*usecols)
    for c in decimal_cols or []:
        df = df.withColumn(c, parse_ptbr_number(F.col(c)))
    for c, fmt in (date_cols or {}).items():
        df = df.withColumn(c, F.try_to_timestamp(F.col(c), F.lit(fmt)).cast("date"))
    return df
