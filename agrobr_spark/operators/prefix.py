"""Distributed running (prefix) sums without a global-order window.

A naive running sum — ``Window.orderBy(key)`` with no partition, or
``Window.partitionBy(source)`` when a source holds millions of rows —
funnels the whole frame (or the whole source) through ONE task: the
classic single-partition window bottleneck that works at sf0.1 and
dies at 100 TB.

:func:`bucketed_prefix_sum` is the standard two-level fix. The caller
supplies a *bucket* column that is **order-aligned**: every row in
bucket ``b`` sorts before every row in bucket ``b+1`` (within a
partition group). Then

1. per-(group, bucket) partial sums — one partial+final aggregation;
2. exclusive bucket offsets — a window over the *aggregated* frame
   (one row per bucket: ~sqrt(n) rows when the bucket width is
   ~sqrt(n), small enough for a single task by construction; recurse
   with a second level if even that overflows);
3. broadcast-join the offsets back;
4. within-bucket running sum — a window partitioned by
   (group, bucket), so the largest single window is one bucket.

The result is bit-identical to the naive global window (integer sums
reassociate freely), which is exactly how the DuckDB oracles check the
consumers: the oracle runs the naive one-window form, the engine runs
this bucketed plan, and the hashes must agree.

No reference analog (the reference is single-node pandas — running
sums are free there, e.g. /root/reference/agrobr/cepea/api.py's
cumulative series); this is pure scale-out machinery.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def bucketed_prefix_sum(
    df: DataFrame,
    *,
    bucket_col: str,
    order_cols: Sequence[str],
    val_cols: Mapping[str, object],
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Append inclusive running sums of each value in ``val_cols``
    (mapping output-name -> column/Column to sum) over rows ordered by
    ``order_cols`` within ``part_cols`` groups, using the two-level
    bucketed plan described in the module docstring.

    ``bucket_col`` must be order-aligned with ``order_cols`` within
    each group; the helper cannot check that cheaply, so consumers owe
    a test proving equality with the naive window on a fixture.
    """
    part = list(part_cols)
    vals = {out: F.col(c) if isinstance(c, str) else c for out, c in val_cols.items()}
    with_vals = df.select(
        "*", *[v.alias(f"__v_{out}") for out, v in vals.items()]
    )

    # 1. per-(group, bucket) sums
    bsums = with_vals.groupBy(*part, bucket_col).agg(
        *[F.sum(f"__v_{out}").alias(f"__bs_{out}") for out in vals]
    )
    # 2. exclusive offsets: cumulative bucket sums minus own bucket
    w_off = (
        Window.partitionBy(*part)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = bsums.select(
        *part,
        bucket_col,
        *[
            (F.sum(f"__bs_{out}").over(w_off) - F.col(f"__bs_{out}")).alias(
                f"__off_{out}"
            )
            for out in vals
        ],
    )
    # 3. broadcast offsets back (one row per bucket — always small)
    joined = with_vals.join(F.broadcast(offsets), [*part, bucket_col])
    # 4. within-bucket running sums
    w_in = (
        Window.partitionBy(*part, bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.select(
        *df.columns,
        *[
            (F.col(f"__off_{out}") + F.sum(f"__v_{out}").over(w_in)).alias(out)
            for out in vals
        ],
    )
    return out
