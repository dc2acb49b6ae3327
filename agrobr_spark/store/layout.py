"""Z-order data layout: multi-column clustering for scan pruning.

Partition pruning handles the partition column; row-group (parquet
min/max) pruning handles whatever the file sort order clusters. A
single-column sort clusters only that column — filters on a second
column read every row group. Z-ordering interleaves the bits of
several columns' quantized ranks into one sort key, so files become
locality rectangles in ALL the keyed dimensions and a predicate on
ANY of them skips most row groups (the Delta OPTIMIZE ZORDER /
Iceberg sort-order idea, built here from plain expressions).

Shape: one bounds aggregate (collapsed to a driver row, free from
footer stats at scale), a per-row key expression (pure Catalyst bit
arithmetic — no UDF), one range-partitioned sort on the key, a plain
parquet write. At 100 TB this is the standard compaction-time
rewrite: cost ≈ one shuffle of the rewritten partition, paid once,
after which every selective reader benefits via ``PushedFilters``
against the narrowed per-file min/max ranges.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_BITS = 8  # 2^8 buckets per dimension -> 16-bit key for 2 cols


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> Column:
    """Morton (z-curve) key over ``cols``: each column is min/max
    scaled to a ``bits``-bit integer rank (one bounds aggregate,
    broadcast as literals), and the ranks' bits are interleaved —
    column i contributes bit b of its rank at key position
    ``b * n_cols + i``. Numeric and date/timestamp columns work (the
    bound/scale math runs on ``double``); NULLs rank 0 (cluster
    together at the curve's origin)."""
    bounds = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            )
        ]
    ).collect()[0]
    n = len(cols)
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        span = (hi - lo) if (hi is not None and lo is not None) else 0.0
        if not span:
            continue  # constant column adds no information
        maxr = (1 << bits) - 1
        rank = F.least(
            F.lit(maxr),
            F.floor(
                (F.col(c).cast("double") - F.lit(lo))
                / F.lit(span)
                * F.lit(maxr + 1)
            ).cast("bigint"),
        )
        rank = F.coalesce(rank, F.lit(0))
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(rank, b).bitwiseAND(F.lit(1)),
                b * n + i,
            )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    n_files: int = 8,
) -> None:
    """Rewrite ``df`` at ``path`` clustered by the z-curve over
    ``cols``: range-repartition on the key into ``n_files`` files,
    sort within partitions, drop the key. Every written file covers a
    compact z-curve segment, i.e. a small min/max rectangle in every
    keyed column — the property ``tests/test_store.py`` measures from
    the actual parquet footers."""
    (
        df.withColumn("_zkey", zorder_key(df, cols, bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
