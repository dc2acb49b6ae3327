"""M1 dedup-upsert (MERGE) semantics as a deterministic query.

The reference's write path stages a batch and merges it into the typed
store with last-writer-wins on the primary key
(ref: agrobr/cache/duckdb_store.py:79-102,417-461 — staging temp table +
INSERT..SELECT ON CONFLICT DO UPDATE). Re-expressed Spark-first as
union + row_number precedence, which is exactly what Delta's MERGE
compiles to logically; the physical write-path variant lives in
``agrobr_spark.store.merge``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from agrobr_spark.io import load
from agrobr_spark.queries import register


@register(
    "m1_merge_upsert",
    oracle="""
    WITH staging AS (
      SELECT l_orderkey, l_linenumber, l_quantity * 2 AS l_quantity,
             l_extendedprice, 1 AS prioridade
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
      UNION ALL
      SELECT l_orderkey + 100000000, l_linenumber, l_quantity,
             l_extendedprice, 1 AS prioridade
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-01-15'
    ), unioned AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, 0 AS prioridade
      FROM lineitem
      UNION ALL
      SELECT * FROM staging
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY l_orderkey, l_linenumber
        ORDER BY prioridade DESC, l_quantity, l_extendedprice) AS rn
      FROM unioned)
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           prioridade AS origem_staging
    FROM ranked WHERE rn = 1
    """,
    tags=("M1", "M4"),
)
def m1_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 last-writer-wins MERGE on PK (l_orderkey, l_linenumber):
    staging batch updates overlapping keys (qty doubled) and inserts new
    synthetic keys; target rows otherwise pass through."""
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    ship = F.col("l_shipdate").cast("date")

    updates = (
        li.filter(ship.between(F.lit("1997-01-01"), F.lit("1997-03-31")))
        .select(*cols)
        .withColumn("l_quantity", F.col("l_quantity") * 2)
    )
    inserts = (
        li.filter(ship.between(F.lit("1997-01-01"), F.lit("1997-01-15")))
        .select(*cols)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(100000000))
    )
    staging = updates.unionByName(inserts).withColumn("prioridade", F.lit(1))
    target = li.select(*cols).withColumn("prioridade", F.lit(0))

    # (l_orderkey, l_linenumber) is not unique in the synthetic lineitem:
    # value-column tie-breakers keep the surviving row deterministic.
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.col("prioridade").desc(), "l_quantity", "l_extendedprice"
    )
    return (
        target.unionByName(staging)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*cols, F.col("prioridade").alias("origem_staging"))
    )
