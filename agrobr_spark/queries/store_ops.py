"""Store-facing read-path operators (SURVEY §2.1 S8, §2.9 M2, §2.11 D4)
as deterministic catalog queries.

The physical store lives in ``agrobr_spark.store`` (partitioned parquet
tables, MERGE write path, TTL policies); these queries pin the *read
semantics* of that layer — filtered typed-store scans, TTL validity
predicates, snapshot cuts — on the synthetic tables so both engines see
identical inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.io import load
from agrobr_spark.queries import register

# Synthetic indicadores-store shape from lineitem (same derivation as
# validation_ops: deterministic product/praca assignment, price-like
# valor) — stands in for the typed `indicadores` table of
# agrobr/cache/duckdb_store.py:19-77.
_STORE_SQL = """
  SELECT CAST(l_shipdate AS DATE) AS data,
         CASE l_suppkey % 4 WHEN 0 THEN 'soja' WHEN 1 THEN 'milho'
              WHEN 2 THEN 'boi' ELSE 'cafe' END AS produto,
         concat('praca_', CAST(l_partkey % 5 AS VARCHAR)) AS praca,
         l_extendedprice / 1000.0 AS valor,
         'cepea' AS fonte,
         l_orderkey, l_linenumber
  FROM lineitem
"""


def _store_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    prod = F.element_at(
        F.array(F.lit("soja"), F.lit("milho"), F.lit("boi"), F.lit("cafe")),
        (F.col("l_suppkey") % 4 + 1).cast("int"),
    )
    return li.select(
        F.col("l_shipdate").cast("date").alias("data"),
        prod.alias("produto"),
        F.concat(F.lit("praca_"), (F.col("l_partkey") % 5).cast("string")).alias(
            "praca"
        ),
        (F.col("l_extendedprice") / 1000.0).alias("valor"),
        F.lit("cepea").alias("fonte"),
        "l_orderkey",
        "l_linenumber",
    )


@register(
    "s8_store_scan",
    oracle=f"""
    WITH store AS ({_STORE_SQL})
    SELECT data, produto, praca, valor, fonte
    FROM store
    WHERE produto = 'soja'
      AND data BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      AND praca = 'praca_2'
    ORDER BY data DESC, l_orderkey DESC, l_linenumber DESC
    LIMIT 1000
    """,
    tags=("S8", "P2", "P4"),
)
def s8_store_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 cache scan (ref: agrobr/cache/duckdb_store.py:339-400):
    produto/praca/date-range predicates + ORDER BY data DESC over the
    typed store. On the partitioned store table the produto and
    year(data) predicates become partition pruning; here they reach the
    parquet scan as pushed filters."""
    s = _store_df(spark, sf_dir)
    return (
        s.filter(
            (F.col("produto") == "soja")
            & F.col("data").between("1996-01-01", "1996-12-31")
            & (F.col("praca") == "praca_2")
        )
        .orderBy(
            F.desc("data"), F.desc("l_orderkey"), F.desc("l_linenumber")
        )
        .limit(1000)
        .select("data", "produto", "praca", "valor", "fonte")
    )


@register(
    "m2_ttl_validity",
    oracle=f"""
    WITH store AS ({_STORE_SQL}),
    agora AS (SELECT max(data) AS now_ref FROM store),
    kv AS (
      SELECT produto, praca, data,
             data + INTERVAL (CASE produto WHEN 'soja' THEN 30
                              WHEN 'milho' THEN 90 ELSE 365 END) DAY
               AS expires_at
      FROM store)
    SELECT k.produto,
           count(*) AS entradas,
           CAST(sum(CASE WHEN k.expires_at > a.now_ref THEN 1 ELSE 0 END)
             AS BIGINT) AS validas,
           CAST(sum(CASE WHEN k.expires_at <= a.now_ref THEN 1 ELSE 0 END)
             AS BIGINT) AS expiradas
    FROM kv k CROSS JOIN agora a
    GROUP BY k.produto
    """,
    tags=("M2", "M3"),
)
def m2_ttl_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2/M3 TTL validity predicate (ref:
    agrobr/cache/duckdb_store.py:129-279, cache/policies.py:32-263):
    per-source TTL → expires_at column; the cache-hit set is one filter
    `expires_at > now`. `now` is pinned to max(data) so the query is
    deterministic cross-engine. The physical KV store with hit counts
    lives in ``agrobr_spark.store.kv_cache``."""
    s = _store_df(spark, sf_dir)
    now_ref = s.agg(F.max("data").alias("now_ref"))
    ttl_days = (
        F.when(F.col("produto") == "soja", 30)
        .when(F.col("produto") == "milho", 90)
        .otherwise(365)
    )
    kv = s.select(
        "produto", "praca", "data", F.date_add("data", ttl_days).alias("expires_at")
    )
    return (
        kv.crossJoin(F.broadcast(now_ref))
        .groupBy("produto")
        .agg(
            F.count(F.lit(1)).alias("entradas"),
            F.sum((F.col("expires_at") > F.col("now_ref")).cast("int")).alias(
                "validas"
            ),
            F.sum((F.col("expires_at") <= F.col("now_ref")).cast("int")).alias(
                "expiradas"
            ),
        )
    )


@register(
    "d4_snapshot_filter",
    oracle=f"""
    WITH store AS ({_STORE_SQL})
    SELECT produto,
           count(*) AS linhas,
           max(data) AS data_max,
           -- valor = price/1000 carries 5 decimals whose half-way
           -- rounding to DECIMAL(18,4) is engine-dependent; recover the
           -- exact 2-decimal price before the exact decimal sum
           CAST(sum(CAST(round(valor * 1000, 2) AS DECIMAL(18,2)))
                AS DOUBLE) / 1000.0 AS valor_total
    FROM store
    WHERE data <= DATE '1995-06-30'
    GROUP BY produto
    """,
    tags=("D4", "D3", "P4"),
)
def d4_snapshot_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 deterministic snapshot cut (ref:
    agrobr/datasets/deterministic.py:10-46, preco_diario.py:107-120):
    `data <= snapshot` applied before any aggregation — reproducible
    reads. The predicate reaches the scan (partition pruning on a
    date-partitioned store); session-scoped snapshot plumbing lives in
    ``agrobr_spark.store.snapshot``."""
    s = _store_df(spark, sf_dir)
    return (
        s.filter(F.col("data") <= F.lit("1995-06-30").cast("date"))
        .groupBy("produto")
        .agg(
            F.count(F.lit(1)).alias("linhas"),
            F.max("data").alias("data_max"),
            (
                F.sum(
                    F.round(F.col("valor") * 1000, 2).cast("decimal(18,2)")
                ).cast("double")
                / 1000.0
            ).alias("valor_total"),
        )
    )
