"""Composite-operator catalog entries: as-of join and multimodal
binary plumbing.

The as-of oracle uses DuckDB's native ASOF JOIN — the engine's
union+window formulation must reproduce it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.io import load
from agrobr_spark.operators.asof import asof_join
from agrobr_spark.operators.multimodal import binary_metadata, decode_features
from agrobr_spark.queries import register
from agrobr_spark.queries.validation_ops import _PROD_CASE

_LEFT_SQL = f"""
  SELECT l_orderkey, l_linenumber,
         {_PROD_CASE} AS produto,
         CAST(l_shipdate AS DATE) AS data
  FROM lineitem
"""

_RIGHT_SQL = f"""
  SELECT produto, data,
         CAST(sum(preco_dec) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS preco
  FROM (
    SELECT {_PROD_CASE} AS produto,
           date_trunc('month', CAST(l_shipdate AS DATE)) AS data,
           CAST(l_extendedprice AS DECIMAL(18,4)) AS preco_dec
    FROM lineitem) m
  GROUP BY produto, data
"""


@register(
    "j7_asof_join",
    oracle=f"""
    WITH esquerda AS ({_LEFT_SQL}),
    precos AS ({_RIGHT_SQL})
    SELECT e.l_orderkey, e.l_linenumber, e.produto, e.data, p.preco
    FROM esquerda e
    ASOF LEFT JOIN precos p
      ON e.produto = p.produto AND e.data >= p.data
    """,
    tags=("J7", "ASOF"),
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark primitive): every lineitem gets the
    latest monthly produto price at or before its ship date, via the
    union-tag + forward-fill window formulation — checked against
    DuckDB's native ASOF JOIN."""
    li = load(spark, sf_dir, "lineitem")
    prod = F.element_at(
        F.array(*[F.lit(p) for p in
                  ["soja", "milho", "boi", "cafe", "algodao", "trigo", "arroz", "quinoa"]]),
        (F.col("l_suppkey") % 8 + 1).cast("int"),
    )
    left = li.select(
        "l_orderkey",
        "l_linenumber",
        prod.alias("produto"),
        F.col("l_shipdate").cast("date").alias("data"),
    )
    right = (
        li.select(
            prod.alias("produto"),
            F.date_trunc("month", F.col("l_shipdate").cast("date"))
            .cast("date")
            .alias("data"),
            F.col("l_extendedprice").cast("decimal(18,4)").alias("preco_dec"),
        )
        .groupBy("produto", "data")
        .agg(
            (
                F.sum("preco_dec").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("preco")
        )
    )
    return asof_join(left, right, on="produto", ts="data", right_cols=["preco"])


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
    tags=("MULTIMODAL", "S9"),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pre-filter: pure-SQL size + digest over binary
    payloads (documents.text bytes standing in for media blobs) —
    no Python touches the blob column."""
    d = load(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("string").alias("mime"),
    )
    return binary_metadata(media).drop("mime")


@register(
    "mm_decode_features",
    oracle=None,  # Pandas-UDF pipeline with stubbed decode → rows-only
    tags=("MULTIMODAL", "UDF"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode/feature pipeline over binary
    media (decode stubbed deterministically; plumbing real)."""
    d = load(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("string").alias("mime"),
    )
    return decode_features(media)
