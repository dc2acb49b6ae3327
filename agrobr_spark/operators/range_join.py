"""Range join: pair rows whose point key falls inside an interval.

Spark has no native range-join optimization (Databricks' range-join
hint is proprietary); the naive formulation
``a.join(b, (a.ts >= b.start) & (a.ts < b.end))`` plans a
BroadcastNestedLoopJoin (O(n·m) compares) — fine for a broadcast-able
interval side, catastrophic otherwise.

Scale formulation (the standard one, used by every open-source range
joiner): bucketize. Each interval is exploded to the buckets it
overlaps; each point maps to exactly one bucket; equi-join on the
bucket id co-locates candidates, and the residual interval predicate
filters exactly. Shuffle is hash(bucket) — linear, skew-safe for
interval spans ≪ bucket count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BUCKET = "__bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row with
    ``start <= point < end``. Numeric keys (cast dates/timestamps to
    epoch first). ``bucket_width`` is in key units — pick it near the
    typical interval span so each interval explodes to ~2 buckets.
    """
    if how != "inner":
        raise ValueError("range_join is inner-only; outer variants "
                         "re-add unmatched rows with a left_anti union")

    def bucket_of(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    pts = points.withColumn(_BUCKET, bucket_of(F.col(point_col)))
    ivs = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                bucket_of(F.col(start_col)),
                # end is exclusive: a span ending exactly on a bucket
                # boundary doesn't reach the next bucket
                bucket_of(
                    F.col(end_col)
                    - F.when(F.col(end_col) % bucket_width == 0, 1).otherwise(0)
                ),
            )
        ),
    )
    return (
        pts.join(ivs, _BUCKET)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop(_BUCKET)
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: int,
) -> DataFrame:
    """Join every ``a`` row to every ``b`` row whose CLOSED-OPEN
    interval overlaps it (``a_start < b_end AND b_start < a_end``) —
    the interval-interval generalization of :func:`range_join`, same
    bucketize-then-equi-join shape: both sides explode to the buckets
    they cover, candidates co-locate on the bucket id, the residual
    predicate filters exactly.

    Multi-bucket double counting is eliminated WITHOUT a distinct:
    two overlapping intervals share every bucket in the overlap span,
    so the pair is emitted only in the canonical bucket containing
    ``greatest(a_start, b_start)`` (the overlap's left edge) — a pure
    filter, no post-join aggregation. Shuffle is hash(bucket): linear
    and skew-safe for spans ≪ bucket width × partitions."""

    def bucket_of(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    def span(start: str, end: str) -> Column:
        return F.sequence(
            bucket_of(F.col(start)),
            bucket_of(
                F.col(end)
                - F.when(F.col(end) % bucket_width == 0, 1).otherwise(0)
            ),
        )

    ax = a.withColumn(_BUCKET, F.explode(span(a_start, a_end)))
    bx = b.withColumn(_BUCKET, F.explode(span(b_start, b_end)))
    return (
        ax.join(bx, _BUCKET)
        .filter(
            (F.col(a_start) < F.col(b_end))
            & (F.col(b_start) < F.col(a_end))
        )
        .filter(
            F.col(_BUCKET)
            == F.floor(
                F.greatest(F.col(a_start), F.col(b_start))
                / F.lit(bucket_width)
            ).cast("long")
        )
        .drop(_BUCKET)
    )
