"""Per-product sanity rules: absolute price bands + day-over-day change
limits (ref: agrobr/validators/sanity.py:24-105 rule table,
:232-259 batch check with previous-value tracking).

Spark shape: the rules are a broadcast dim; the previous-value check is
a `lag` window partitioned by product — one shuffle on the partition
key, no Python in the row path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# (produto, valor_min, valor_max, max_variacao_pct) — the reference's
# per-product bands (ref: agrobr/validators/sanity.py:24-105).
SANITY_RULES: list[tuple[str, float, float, float]] = [
    ("soja", 30.0, 300.0, 10.0),
    ("milho", 20.0, 150.0, 10.0),
    ("boi", 100.0, 500.0, 10.0),
    ("cafe", 500.0, 3500.0, 15.0),
    ("algodao", 50.0, 800.0, 15.0),
    ("trigo", 500.0, 2500.0, 10.0),
    ("arroz", 30.0, 200.0, 10.0),
]

RULE_COLUMNS = ["produto", "valor_min", "valor_max", "max_variacao_pct"]


def rules_dim(spark) -> DataFrame:
    return spark.createDataFrame(SANITY_RULES, RULE_COLUMNS)


def sanity_check(
    df: DataFrame,
    produto: str = "produto",
    valor: str = "valor",
    data: str = "data",
) -> DataFrame:
    """Flag each row against its product's band and day-over-day limit.

    Returns the input plus ``valor_anterior``, ``variacao_pct``,
    ``fora_banda`` and ``variacao_excessiva`` flags
    (ref: agrobr/validators/sanity.py:118-259 → lag window + dim join).
    """
    spark = df.sparkSession
    rules = F.broadcast(rules_dim(spark))
    w = Window.partitionBy(produto).orderBy(data)
    prev = F.lag(F.col(valor)).over(w)
    joined = df.join(rules, on=produto, how="left")
    variacao = F.when(
        prev.isNotNull() & (prev != 0),
        (F.col(valor) / prev - 1.0) * 100.0,
    )
    return (
        joined.withColumn("valor_anterior", prev)
        .withColumn("variacao_pct", variacao)
        .withColumn(
            "fora_banda",
            F.when(
                F.col("valor_min").isNotNull(),
                (F.col(valor) < F.col("valor_min"))
                | (F.col(valor) > F.col("valor_max")),
            ).otherwise(F.lit(False)),
        )
        .withColumn(
            "variacao_excessiva",
            F.when(
                F.col("max_variacao_pct").isNotNull() & variacao.isNotNull(),
                F.abs(variacao) > F.col("max_variacao_pct"),
            ).otherwise(F.lit(False)),
        )
    )
