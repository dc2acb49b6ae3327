"""Validation operators (SURVEY §2.10 V1/V2/V3 + W2) as engine queries.

Each one runs over a synthesized "indicadores"/"safras"-shaped fact
derived deterministically from the TPC-H tables, so both engines see
identical inputs and the validation aggregates are exactly comparable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from agrobr_spark.contracts import get_contract
from agrobr_spark.io import load
from agrobr_spark.normalize.dims import values_sql
from agrobr_spark.queries import register
from agrobr_spark.validators.sanity import SANITY_RULES, sanity_check
from agrobr_spark.validators.semantic import run_rules

_PRODUTOS = ["soja", "milho", "boi", "cafe", "algodao", "trigo", "arroz", "quinoa"]
_PROD_CASE = "CASE l_suppkey % 8 " + " ".join(
    f"WHEN {i} THEN '{p}'" for i, p in enumerate(_PRODUTOS)
) + " END"

# Synthetic indicadores fact (cepea.indicador shape) from lineitem:
# valor in a price-like range, some NULL valor, natural PK duplicates
# on (data, produto).
_INDICADORES_SQL = f"""
  SELECT CAST(l_shipdate AS DATE) AS data,
         {_PROD_CASE} AS produto,
         concat('praca_', CAST(l_partkey % 5 AS VARCHAR)) AS praca,
         CASE WHEN l_linenumber = 7 THEN NULL
              ELSE l_extendedprice / 1000.0 END AS valor,
         'BRL/sc60kg' AS unidade,
         'cepea' AS fonte,
         l_orderkey, l_linenumber
  FROM lineitem
"""


def _indicadores_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    prod_array = F.array(*[F.lit(p) for p in _PRODUTOS])
    return li.select(
        F.col("l_shipdate").cast("date").alias("data"),
        F.element_at(prod_array, (F.col("l_suppkey") % 8 + 1).cast("int")).alias(
            "produto"
        ),
        F.concat(F.lit("praca_"), (F.col("l_partkey") % 5).cast("string")).alias(
            "praca"
        ),
        F.when(F.col("l_linenumber") == 7, None)
        .otherwise(F.col("l_extendedprice") / 1000.0)
        .alias("valor"),
        F.lit("BRL/sc60kg").alias("unidade"),
        F.lit("cepea").alias("fonte"),
        "l_orderkey",
        "l_linenumber",
    )


@register(
    "v1_contract_validate",
    oracle=f"""
    WITH fato AS ({_INDICADORES_SQL}),
    checks AS (
      -- CAST AS BIGINT: DuckDB sum() yields HUGEINT, which lands as
      -- float64 in the driver's pandas canonicalizer vs Spark's bigint
      SELECT count(*) AS linhas,
             CAST(sum(CASE WHEN data IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_data,
             CAST(sum(CASE WHEN produto IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_produto,
             CAST(sum(CASE WHEN valor IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_valor,
             CAST(sum(CASE WHEN valor < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fora_valor,
             CAST(sum(CASE WHEN unidade IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_unidade,
             CAST(sum(CASE WHEN fonte IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulos_fonte
      FROM fato),
    dups AS (
      SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS pk_duplicados
      FROM (SELECT count(*) AS n FROM fato GROUP BY data, produto) g
      WHERE n > 1)
    SELECT * FROM checks CROSS JOIN dups
    """,
    tags=("V1", "A9", "U3"),
)
def v1_contract_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 contract validation: the cepea.indicador contract compiled to
    one aggregate pass (null/range counts) + PK-duplicate shuffle
    (ref: agrobr/contracts/__init__.py:96-127)."""
    c = get_contract("cepea.indicador")
    df = _indicadores_df(spark, sf_dir).drop("l_orderkey", "l_linenumber")
    return c.validation_query(df)


@register(
    "v2_sanity_rules",
    oracle=f"""
    WITH fato AS ({_INDICADORES_SQL}),
    com_regra AS (
      SELECT f.*, r.valor_min, r.valor_max, r.max_variacao_pct,
             lag(f.valor) OVER (PARTITION BY f.produto
                                ORDER BY f.data, f.l_orderkey, f.l_linenumber,
                                         f.valor, f.praca)
               AS valor_anterior
      FROM fato f
      LEFT JOIN {values_sql(SANITY_RULES, ['produto', 'valor_min', 'valor_max', 'max_variacao_pct'], alias='r')}
        ON f.produto = r.produto),
    flags AS (
      SELECT produto,
        CASE WHEN valor_min IS NOT NULL
             THEN valor < valor_min OR valor > valor_max
             ELSE false END AS fora_banda,
        CASE WHEN max_variacao_pct IS NOT NULL AND valor_anterior IS NOT NULL
                  AND valor_anterior <> 0 AND valor IS NOT NULL
             THEN abs((valor / valor_anterior - 1.0) * 100.0) > max_variacao_pct
             ELSE false END AS variacao_excessiva
      FROM com_regra)
    SELECT produto,
           count(*) AS linhas,
           CAST(sum(CASE WHEN fora_banda THEN 1 ELSE 0 END) AS BIGINT) AS fora_banda_n,
           CAST(sum(CASE WHEN variacao_excessiva THEN 1 ELSE 0 END) AS BIGINT)
             AS variacao_excessiva_n
    FROM flags GROUP BY produto
    """,
    tags=("V2", "W2"),
)
def v2_sanity_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2+W2 per-product sanity bands + previous-value change check:
    broadcast rules dim + lag window with unique tie-breaker
    (ref: agrobr/validators/sanity.py:118-259)."""
    df = _indicadores_df(spark, sf_dir)
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem
    # (it carries injected PK duplicates) — extend the ordering until the
    # remaining ties cannot change the lagged valor (same valor/praca),
    # or the cross-engine lag is non-deterministic (round-1 driver red).
    w = Window.partitionBy("produto").orderBy(
        "data", "l_orderkey", "l_linenumber", "valor", "praca"
    )
    checked = (
        df.join(
            F.broadcast(
                spark.createDataFrame(
                    SANITY_RULES,
                    ["produto", "valor_min", "valor_max", "max_variacao_pct"],
                )
            ),
            "produto",
            "left",
        )
        .withColumn("valor_anterior", F.lag("valor").over(w))
    )
    fora = F.when(
        F.col("valor_min").isNotNull(),
        (F.col("valor") < F.col("valor_min")) | (F.col("valor") > F.col("valor_max")),
    ).otherwise(F.lit(False))
    var_pct = (F.col("valor") / F.col("valor_anterior") - 1.0) * 100.0
    exc = F.when(
        F.col("max_variacao_pct").isNotNull()
        & F.col("valor_anterior").isNotNull()
        & (F.col("valor_anterior") != 0)
        & F.col("valor").isNotNull(),
        F.abs(var_pct) > F.col("max_variacao_pct"),
    ).otherwise(F.lit(False))
    return checked.groupBy("produto").agg(
        F.count(F.lit(1)).alias("linhas"),
        F.sum(fora.cast("int")).alias("fora_banda_n"),
        F.sum(exc.cast("int")).alias("variacao_excessiva_n"),
    )


# Synthetic safras fact (conab.safras shape) from orders, with injected
# violations for every registered semantic rule.
_SAFRAS_SQL = """
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 11 = 0
         THEN concat(CAST(year(o_orderdate) AS VARCHAR), '-',
                     lpad(CAST((year(o_orderdate) + 1) % 100 AS VARCHAR), 2, '0'))
         ELSE concat(CAST(year(o_orderdate) AS VARCHAR), '/',
                     lpad(CAST((year(o_orderdate) + 1) % 100 AS VARCHAR), 2, '0'))
    END AS safra,
    o_totalprice - 150000.0 AS valor,
    o_totalprice / 100.0 AS area_plantada,
    (o_totalprice / 100.0) * (0.9 + (o_orderkey % 3) * 0.1) AS area_colhida,
    CAST(o_orderkey % 25000 AS DOUBLE) AS produtividade
  FROM orders
"""


def _safras_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ano = F.year("o_orderdate")
    lbl = F.lpad(((ano + 1) % 100).cast("string"), 2, "0")
    return o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 11 == 0,
            F.concat(ano.cast("string"), F.lit("-"), lbl),
        )
        .otherwise(F.concat(ano.cast("string"), F.lit("/"), lbl))
        .alias("safra"),
        (F.col("o_totalprice") - 150000.0).alias("valor"),
        (F.col("o_totalprice") / 100.0).alias("area_plantada"),
        ((F.col("o_totalprice") / 100.0) * (0.9 + (F.col("o_orderkey") % 3) * 0.1)).alias(
            "area_colhida"
        ),
        (F.col("o_orderkey") % 25000).cast("double").alias("produtividade"),
    )


@register(
    "v3_semantic_rules",
    oracle=f"""
    WITH fato AS ({_SAFRAS_SQL}),
    wide AS (
      SELECT count(*) AS linhas,
        CAST(sum(CASE WHEN area_colhida > area_plantada THEN 1 ELSE 0 END) AS BIGINT) AS v_area,
        CAST(sum(CASE WHEN valor <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_preco,
        CAST(sum(CASE WHEN produtividade < 100 OR produtividade > 20000 THEN 1 ELSE 0 END) AS BIGINT) AS v_prod,
        CAST(sum(CASE WHEN NOT regexp_matches(safra, '^\\d{{4}}/\\d{{2}}$') THEN 1 ELSE 0 END) AS BIGINT) AS v_safra
      FROM fato)
    SELECT regra, severidade, violacoes, linhas FROM (
      SELECT 'area_consistency' AS regra, 'error' AS severidade, v_area AS violacoes, linhas FROM wide
      UNION ALL SELECT 'price_positive', 'error', v_preco, linhas FROM wide
      UNION ALL SELECT 'productivity_range', 'warning', v_prod, linhas FROM wide
      UNION ALL SELECT 'safra_format', 'error', v_safra, linhas FROM wide)
    """,
    tags=("V3", "W1"),
)
def v3_semantic_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 semantic rule registry compiled to one aggregate pass +
    stack() unpivot (ref: agrobr/validators/semantic.py:22-381)."""
    return run_rules(_safras_df(spark, sf_dir).drop("o_orderkey"))


@register(
    "v6_quality_certification",
    oracle=f"""
    WITH fato AS ({_INDICADORES_SQL}),
    metricas AS (
      SELECT count(*) AS linhas,
        CAST(count(data) + count(produto) + count(praca) + count(valor)
             + count(unidade) + count(fonte) AS DOUBLE)
          / (count(*) * 6) AS completude,
        count(*) - count(DISTINCT concat_ws(CHR(31),
            CAST(data AS VARCHAR), produto, praca,
            CAST(valor AS VARCHAR))) AS linhas_duplicadas,
        CAST(sum(CASE WHEN valor IS NOT NULL
                  AND (valor < 0 OR valor > 10000) THEN 1 ELSE 0 END) AS BIGINT)
          AS fora_faixa
      FROM fato),
    pontuacao AS (
      SELECT *,
        (CASE WHEN completude >= 0.95 THEN 1.0
              WHEN completude >= 0.85 THEN 0.5 ELSE 0.0 END
         + CASE WHEN linhas_duplicadas = 0 THEN 1.0
                WHEN linhas_duplicadas <= 100 THEN 0.5 ELSE 0.0 END
         + CASE WHEN fora_faixa = 0 THEN 1.0
                WHEN fora_faixa <= 100 THEN 0.5 ELSE 0.0 END
         + CASE WHEN linhas > 0 THEN 1.0 ELSE 0.0 END) / 4.0 AS score
      FROM metricas)
    SELECT linhas, round(completude, 6) AS completude, linhas_duplicadas,
      fora_faixa, score,
      CASE WHEN score >= 0.95 THEN 'GOLD'
           WHEN score >= 0.85 THEN 'SILVER'
           WHEN score >= 0.70 THEN 'BRONZE'
           ELSE 'UNCERTIFIED' END AS certificacao
    FROM pontuacao
    """,
    tags=("V6", "A8"),
)
def v6_quality_certification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V6 quality certification (ref: agrobr/quality.py:257-307):
    completeness / duplicate / range checks scored
    (passed + 0.5*warnings)/total → GOLD/SILVER/BRONZE/UNCERTIFIED.
    The whole certification is ONE aggregate query — no driver loop;
    the reusable library form is ``agrobr_spark.validators.certify``."""
    df = _indicadores_df(spark, sf_dir)
    rowkey = F.concat_ws(
        "\x1f",
        F.col("data").cast("string"),
        "produto",
        "praca",
        F.col("valor").cast("string"),
    )
    m = df.agg(
        F.count(F.lit(1)).alias("linhas"),
        (
            sum(
                (
                    F.count(c)
                    for c in ("data", "produto", "praca", "valor", "unidade", "fonte")
                ),
                start=F.lit(0),
            ).cast("double")
            / (F.count(F.lit(1)) * 6)
        ).alias("completude"),
        (F.count(F.lit(1)) - F.countDistinct(rowkey)).alias("linhas_duplicadas"),
        F.sum(
            (
                F.col("valor").isNotNull()
                & ((F.col("valor") < 0) | (F.col("valor") > 10000))
            ).cast("int")
        ).alias("fora_faixa"),
    )

    def _band(cond_pass, cond_warn):
        return F.when(cond_pass, 1.0).when(cond_warn, 0.5).otherwise(0.0)

    score = (
        _band(F.col("completude") >= 0.95, F.col("completude") >= 0.85)
        + _band(
            F.col("linhas_duplicadas") == 0, F.col("linhas_duplicadas") <= 100
        )
        + _band(F.col("fora_faixa") == 0, F.col("fora_faixa") <= 100)
        + F.when(F.col("linhas") > 0, 1.0).otherwise(0.0)
    ) / 4.0
    return m.select(
        "linhas",
        F.round("completude", 6).alias("completude"),
        "linhas_duplicadas",
        "fora_faixa",
        score.alias("score"),
        F.when(score >= 0.95, "GOLD")
        .when(score >= 0.85, "SILVER")
        .when(score >= 0.70, "BRONZE")
        .otherwise("UNCERTIFIED")
        .alias("certificacao"),
    )
