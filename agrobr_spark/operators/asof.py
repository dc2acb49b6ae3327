"""As-of join: for every left row, the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB does — the oracle uses it);
the scalable formulation is union-tag + one window pass:

1. tag right rows (origin=1) and left rows (origin=0), union by the
   shared (key, ts) axis;
2. sort within key by (ts, origin DESC) — a right row at the same ts
   sorts before the left rows it should serve;
3. `last_value(right payload, ignoreNulls) OVER (... ROWS UNBOUNDED
   PRECEDING AND CURRENT ROW)` carries the latest right payload
   forward;
4. keep left rows.

One shuffle on the key (same as any join), no range explosion, no
skew beyond the key's own distribution — the standard scale-out
as-of shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    tolerance_days: int | None = None,
) -> DataFrame:
    """Left as-of join. ``right_cols`` are carried from the matched
    right row (default: all non-key/ts columns). ``tolerance_days``
    nulls matches older than the window."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    lcols = left.columns
    l = left.withColumn("_origin", F.lit(0))
    r = right.select(
        on, ts, *right_cols
    ).withColumn("_origin", F.lit(1))
    for c in right_cols:
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    r = r.select(*l.columns)
    u = l.unionByName(r)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_origin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct per matched right row, not per-column lasts: a
    # per-column carry skips legitimately-NULL payload values (the
    # struct itself is non-null whenever a right row matched) and can
    # mix columns from different right rows.  DuckDB ASOF JOIN carries
    # the whole row; so do we.
    payload = (
        F.last(
            F.when(F.col("_origin") == 1, F.struct(*right_cols)),
            ignorenulls=True,
        )
        .over(w)
        .alias("_asof_payload")
    )
    matched_ts = (
        F.last(F.when(F.col("_origin") == 1, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("_asof_ts")
    )
    out = (
        u.select(*lcols, payload, matched_ts, "_origin")
        .filter(F.col("_origin") == 0)
        .select(
            *lcols,
            *[
                F.col("_asof_payload").getField(c).alias(c)
                for c in right_cols
            ],
            "_asof_ts",
            "_origin",
        )
    )
    if tolerance_days is not None:
        keep = F.datediff(F.col(ts), F.col("_asof_ts")) <= tolerance_days
        out = out.select(
            *lcols,
            *[F.when(keep, F.col(c)).alias(c) for c in right_cols],
            "_asof_ts",
        )
    return out.drop("_origin", "_asof_ts")
