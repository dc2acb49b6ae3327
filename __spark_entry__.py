"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship rollup on sf0.001; ``queries`` /
``oracle_sql`` expose the engine's operator catalog
(``agrobr_spark.queries``) for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from agrobr_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the A1 rollup
    (group-by-sum with decimal-exact money aggregation)."""
    from agrobr_spark.queries.relational import a1_rollup_sum

    return a1_rollup_sum(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for rows-only ops)."""
    return _catalog.oracle_sql()
