"""S9: parquet/CSV sinks with provenance metadata + verify-on-read.

Reference: agrobr/export.py:20-129 (parquet with embedded metadata:
version, timestamp, row_count, source, content sha256; CSV with a
``.meta.json`` sidecar; verify-on-read recomputes the hash).

Spark-native: the content hash is an order-insensitive sha256 computed
DISTRIBUTED — per-row sha2 over a canonical separator-joined form,
xor-folded via bit_xor aggregate — so verification scales to tables a
driver could never hold (the reference hashes canonical CSV bytes in
memory).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

PROVENANCE_VERSION = "1.0"


def content_hash(df: DataFrame) -> str:
    """Order-insensitive distributed content hash: per-row sha2/256
    over unit-separator-joined canonical strings, folded with bit_xor
    per 16-hex-digit word."""
    canon = F.sha2(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns]), 256
    )
    # 60-bit words (15 hex digits) so conv() output fits a signed bigint
    words = [
        F.bit_xor(F.conv(F.substring(canon, 1 + 15 * i, 15), 16, 10).cast("bigint"))
        for i in range(4)
    ]
    row = df.agg(*[w.alias(f"w{i}") for i, w in enumerate(words)]).collect()[0]
    return "".join(format(int(row[i] or 0) & (2**60 - 1), "015x") for i in range(4))


def write_with_provenance(
    df: DataFrame,
    path: str,
    source: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> dict:
    """Write + sidecar ``.meta.json`` (version, timestamp, row_count,
    source, columns, content sha). Returns the metadata dict."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported sink format {fmt!r}")
    meta = {
        "provenance_version": PROVENANCE_VERSION,
        "written_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        "row_count": df.count(),
        "source": source,
        "format": fmt,
        "columns": df.columns,
        "content_sha256_xor": content_hash(df),
    }
    with open(os.path.join(path, ".meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def read_verified(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Read a provenance-stamped table and verify row count + content
    hash; raises ``ValueError`` on mismatch (verify-on-read,
    ref: agrobr/export.py:132-182)."""
    with open(os.path.join(path, ".meta.json")) as f:
        meta = json.load(f)
    fmt = meta.get("format", "parquet")
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(path)
    else:
        df = spark.read.json(path)
    df = df.select(*meta["columns"])  # canonical column order
    n = df.count()
    if n != meta["row_count"]:
        raise ValueError(f"row_count mismatch: {n} != {meta['row_count']}")
    h = content_hash(df)
    if h != meta["content_sha256_xor"]:
        raise ValueError("content hash mismatch: data was modified")
    return df, meta
