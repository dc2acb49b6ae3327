"""The typed ``indicadores`` analytical table (S8 scan + M1 upsert).

Reference: agrobr/cache/duckdb_store.py:19-77 (DDL: DECIMAL(18,4)
valor, UNIQUE(produto, praca, data, fonte)) and :339-400
(indicadores_query with produto/date/praca predicates, ORDER BY data
DESC). Spark-native: parquet partitioned by ``produto`` so every query
(always produto-scoped in the reference API) prunes to one partition;
date predicates push into parquet row-group min/max skipping.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.store.table import ParquetStore

SCHEMA = T.StructType(
    [
        T.StructField("produto", T.StringType(), False),
        T.StructField("praca", T.StringType(), True),
        T.StructField("data", T.DateType(), False),
        T.StructField("fonte", T.StringType(), False),
        T.StructField("valor", T.DecimalType(18, 4), True),
        T.StructField("variacao", T.DoubleType(), True),
        T.StructField("unidade", T.StringType(), True),
        T.StructField("collected_at", T.TimestampType(), True),
    ]
)

PK = ("produto", "praca", "data", "fonte")


class IndicadoresStore:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.table = ParquetStore(
            spark,
            path,
            primary_key=PK,
            partition_col="produto",
            precedence=("collected_at",),
        )
        self.spark = spark

    def upsert(self, batch: DataFrame) -> int:
        """M1 dedup-upsert: last-writer-wins on (produto, praca, data,
        fonte) with NULL praca participating in the key."""
        return self.table.merge_upsert(batch.select(*SCHEMA.fieldNames()))

    def query(
        self,
        produto: str,
        inicio: dt.date | str | None = None,
        fim: dt.date | str | None = None,
        praca: str | None = None,
    ) -> DataFrame:
        """S8 cache scan: produto partition-prune + date row-group skip,
        ORDER BY data DESC (ref: duckdb_store.py:339-400)."""
        df = self.table.read().filter(F.col("produto") == produto)
        if inicio is not None:
            df = df.filter(F.col("data") >= F.lit(inicio))
        if fim is not None:
            df = df.filter(F.col("data") <= F.lit(fim))
        if praca is not None:
            df = df.filter(F.col("praca") == praca)
        return df.orderBy(F.desc("data"), "praca", "fonte")

    def latest(self, produto: str, praca: str | None = None) -> DataFrame:
        """W4/O4 latest-per-key: top-1 by recency."""
        return self.query(produto, praca=praca).limit(1)

    def distinct_dates(self, produto: str) -> DataFrame:
        """A10 distinct-date set (gap-detection input)."""
        return (
            self.table.read()
            .filter(F.col("produto") == produto)
            .select("data")
            .distinct()
        )
