"""Pluggable semantic rules as named Column expressions.

The reference's ``SemanticRule`` ABC iterates rows in Python
(ref: agrobr/validators/semantic.py:22-381); here a rule is a
(name, violation-predicate Column, severity) triple and the runner
compiles ALL registered rules into one aggregate query — a single
scan regardless of rule count.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class SemanticRule:
    name: str
    severity: str  # "error" | "warning"
    # builds the violation predicate from the DataFrame (so rules can
    # check column presence before referencing them)
    predicate: Callable[[DataFrame], Column | None]
    description: str = ""


SEMANTIC_RULES: dict[str, SemanticRule] = {}


def register_rule(rule: SemanticRule) -> SemanticRule:
    SEMANTIC_RULES[rule.name] = rule
    return rule


def _has(df: DataFrame, *cols: str) -> bool:
    return all(c in df.columns for c in cols)


# --- the reference's built-in rules (semantic.py:22-316) ---

register_rule(
    SemanticRule(
        "price_positive",
        "error",
        lambda df: (F.col("valor") <= 0) if _has(df, "valor") else None,
        "valor must be > 0 (ref: semantic.py PricePositiveRule)",
    )
)

register_rule(
    SemanticRule(
        "productivity_range",
        "warning",
        lambda df: (
            (F.col("produtividade") < 100) | (F.col("produtividade") > 20000)
            if _has(df, "produtividade")
            else None
        ),
        "kg/ha within plausible crop range (ref: ProductivityRangeRule)",
    )
)

register_rule(
    SemanticRule(
        "daily_variation",
        "warning",
        lambda df: (
            (F.abs(F.col("variacao_pct")) > 20.0)
            if _has(df, "variacao_pct")
            else None
        ),
        "|day-over-day| <= 20% (ref: DailyVariationRule, semantic.py:144-181)",
    )
)

register_rule(
    SemanticRule(
        "area_consistency",
        "error",
        lambda df: (
            (F.col("area_colhida") > F.col("area_plantada"))
            if _has(df, "area_colhida", "area_plantada")
            else None
        ),
        "harvested <= planted area (ref: AreaConsistencyRule)",
    )
)

register_rule(
    SemanticRule(
        "safra_format",
        "error",
        lambda df: (
            ~F.col("safra").rlike(r"^\d{4}/\d{2}$") if _has(df, "safra") else None
        ),
        "safra matches ^\\d{4}/\\d{2}$ (ref: SafraFormatRule)",
    )
)


def run_rules(
    df: DataFrame, rules: dict[str, SemanticRule] | None = None
) -> DataFrame:
    """Evaluate every applicable rule in ONE aggregate pass.

    Returns (regra, severidade, violacoes, linhas) — long format, one
    row per applicable rule, built by unpivoting a single-row aggregate
    (no per-rule scans; ref runner: semantic.py:318-381).
    """
    rules = rules if rules is not None else SEMANTIC_RULES
    applicable: list[tuple[str, SemanticRule, Column]] = []
    for name, r in sorted(rules.items()):
        pred = r.predicate(df)
        if pred is not None:
            applicable.append((name, r, pred))
    if not applicable:
        return df.sparkSession.createDataFrame(
            [], "regra string, severidade string, violacoes bigint, linhas bigint"
        )
    aggs = [F.count(F.lit(1)).alias("linhas")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"v_{name}")
        for name, _, pred in applicable
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', '{r.severity}', v_{name}" for name, r, _ in applicable
    )
    return wide.selectExpr(
        f"stack({len(applicable)}, {stack_args}) AS (regra, severidade, violacoes)",
        "linhas",
    )
