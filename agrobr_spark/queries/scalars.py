"""Scalar-function operators (SURVEY §2.8) as engine queries.

pt-BR number/date parsing runs on small inline datasets (the canonical
edge cases from the reference parsers) so the oracle exercises the exact
expression semantics; everything else runs over the synthetic tables.
All parse failures yield NULL (the reference's errors="coerce" regime),
via try_cast/try_to_timestamp so behavior is identical under ANSI mode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.io import load
from agrobr_spark.queries import register

# Canonical pt-BR numeric forms (ref: agrobr/cepea/parsers/v1.py:236-255,
# antaq/parser.py:53-65, conab/parsers/v1.py:475-491).
PTBR_NUMBER_CASES = [
    "1.234,56",
    "R$ 2,50",
    "12.345",
    "1234.56",
    "0,75",
    " 1.234.567,89 ",
    "abc",
    "",
    "123",
    "45,0",
]

# Multi-format date forms (ref: agrobr/cepea/parsers/v1.py:216-234,
# normalize/dates.py:115-135).
DATE_CASES = [
    "31/01/2024",
    "2024-02-15",
    "01-03-2024",
    "15/07/24",
    "2024-13-99",
    "n/a",
]


def _values_clause(cases: list[str]) -> str:
    rows = ", ".join("(%s)" % ("'" + c.replace("'", "''") + "'") for c in cases)
    return f"(VALUES {rows}) t(raw)"


@register(
    "f1_ptbr_number_parse",
    oracle=f"""
    WITH base AS (SELECT raw FROM {_values_clause(PTBR_NUMBER_CASES)}),
    limpo AS (
      SELECT raw, regexp_replace(raw, '[R$\\s]', '', 'g') AS s FROM base),
    norm AS (
      SELECT raw,
             CASE WHEN contains(s, ',')
                  THEN replace(replace(s, '.', ''), ',', '.')
                  ELSE s END AS s
      FROM limpo)
    SELECT raw, CAST(TRY_CAST(s AS DECIMAL(18,4)) AS DOUBLE) AS valor FROM norm
    """,
    tags=("F1",),
)
def f1_ptbr_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 pt-BR number parse: strip currency/space, thousand-dot removal
    when a decimal comma is present, comma→dot, coerce-to-null
    (ref: agrobr/cepea/parsers/v1.py:236-255)."""
    df = spark.createDataFrame([(c,) for c in PTBR_NUMBER_CASES], ["raw"])
    s = F.regexp_replace(F.col("raw"), r"[R$\s]", "")
    s = F.when(
        s.contains(","), F.replace(F.replace(s, F.lit("."), F.lit("")), F.lit(","), F.lit("."))
    ).otherwise(s)
    return df.select("raw", s.alias("_s")).select(
        "raw",
        F.expr("CAST(TRY_CAST(_s AS DECIMAL(18,4)) AS DOUBLE)").alias("valor"),
    )


@register(
    "f2_multiformat_date_parse",
    oracle=f"""
    SELECT raw,
      -- strptime is lenient about digit counts (%Y parses '24' as year
      -- 0024) while Spark's format patterns are strict, so each branch
      -- is guarded by the exact textual shape it should accept
      CAST(coalesce(
        CASE WHEN regexp_matches(raw, '^\\d{{2}}/\\d{{2}}/\\d{{4}}$')
             THEN try_strptime(raw, '%d/%m/%Y') END,
        CASE WHEN regexp_matches(raw, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')
             THEN try_strptime(raw, '%Y-%m-%d') END,
        CASE WHEN regexp_matches(raw, '^\\d{{2}}-\\d{{2}}-\\d{{4}}$')
             THEN try_strptime(raw, '%d-%m-%Y') END,
        CASE WHEN regexp_matches(raw, '^\\d{{2}}/\\d{{2}}/\\d{{2}}$')
             THEN try_strptime(raw, '%d/%m/%y') END) AS DATE) AS data
    FROM {_values_clause(DATE_CASES)}
    """,
    tags=("F2",),
)
def f2_multiformat_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 multi-format date parse with fallback chain
    (ref: agrobr/cepea/parsers/v1.py:216-234, normalize/dates.py:115-135)."""
    df = spark.createDataFrame([(c,) for c in DATE_CASES], ["raw"])
    c = F.col("raw")
    parsed = F.coalesce(
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("dd-MM-yyyy")),
        F.try_to_timestamp(c, F.lit("dd/MM/yy")),
    )
    return df.select("raw", parsed.cast("date").alias("data"))


@register(
    "f3_safra_algebra",
    oracle="""
    SELECT o_orderkey,
      CAST(o_orderdate AS DATE) AS data,
      CASE WHEN month(o_orderdate) >= 7 THEN year(o_orderdate)
           ELSE year(o_orderdate) - 1 END AS ano_inicio,
      concat(
        CAST(CASE WHEN month(o_orderdate) >= 7 THEN year(o_orderdate)
                  ELSE year(o_orderdate) - 1 END AS VARCHAR),
        '/',
        lpad(CAST((CASE WHEN month(o_orderdate) >= 7 THEN year(o_orderdate)
                        ELSE year(o_orderdate) - 1 END + 1) % 100 AS VARCHAR),
             2, '0')) AS safra
    FROM orders
    """,
    tags=("F3",),
)
def f3_safra_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 harvest-year (safra) algebra: season starts in July; label is
    `YYYY/YY` (ref: agrobr/normalize/dates.py:11-112)."""
    o = load(spark, sf_dir, "orders")
    ano_inicio = F.when(
        F.month("o_orderdate") >= 7, F.year("o_orderdate")
    ).otherwise(F.year("o_orderdate") - 1)
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("data"),
        ano_inicio.alias("ano_inicio"),
        F.concat(
            ano_inicio.cast("string"),
            F.lit("/"),
            F.lpad(((ano_inicio + 1) % 100).cast("string"), 2, "0"),
        ).alias("safra"),
    )


@register(
    "f8f9_sentinel_and_arithmetic",
    oracle="""
    SELECT event_id,
      nullif(value, -9999.0) AS valor_limpo,
      value / 1000.0 AS valor_mil,
      value * 2.0 - 10.0 AS derivado
    FROM events
    """,
    tags=("F8", "F9"),
)
def f8f9_sentinel_and_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 sentinel→NULL + F9 derived arithmetic
    (ref: agrobr/inmet/parser.py:50,74-77, comtrade/parser.py:62)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.nullif(F.col("value"), F.lit(-9999.0)).alias("valor_limpo"),
        (F.col("value") / 1000.0).alias("valor_mil"),
        (F.col("value") * 2.0 - 10.0).alias("derivado"),
    )


@register(
    "f10_string_hygiene",
    oracle="""
    SELECT p_partkey,
      lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS ncm,
      upper(trim(p_name)) AS nome_norm,
      lower(p_brand) AS marca,
      regexp_replace(p_type, '\\s+', ' ', 'g') AS tipo_norm
    FROM part
    """,
    tags=("F10",),
)
def f10_string_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 string hygiene: zfill→lpad, trim/case, whitespace collapse
    (ref: agrobr/comexstat/parser.py:75, bcb/parser.py:102)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("ncm"),
        F.upper(F.trim(F.col("p_name"))).alias("nome_norm"),
        F.lower(F.col("p_brand")).alias("marca"),
        F.regexp_replace(F.col("p_type"), r"\s+", " ").alias("tipo_norm"),
    )


@register(
    "f11_content_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      sha256(concat_ws(chr(31), CAST(l_orderkey AS VARCHAR),
             CAST(l_linenumber AS VARCHAR), l_returnflag)) AS linha_sha,
      md5(concat_ws(chr(31), CAST(l_orderkey AS VARCHAR),
          CAST(l_linenumber AS VARCHAR), l_returnflag)) AS linha_md5
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
    """,
    tags=("F11", "S9"),
)
def f11_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 provenance content hash (ref: agrobr/models.py:177-186,
    export.py:104-116) via sha2/md5 over a canonical separator-joined form."""
    li = load(spark, sf_dir, "lineitem")
    canon = F.concat_ws(
        "\x1f",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
    )
    return li.filter(
        F.col("l_shipdate").cast("date").between(F.lit("1996-01-01"), F.lit("1996-03-31"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.sha2(canon, 256).alias("linha_sha"),
        F.md5(canon).alias("linha_md5"),
    )


@register(
    "f13_regex_classify",
    oracle="""
    SELECT c_custkey, c_name,
      TRY_CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) AS numero,
      CASE WHEN TRY_CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) % 2 = 0
           THEN 'par' ELSE 'impar' END AS classe
    FROM customer
    """,
    tags=("F13", "F5"),
)
def f13_regex_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 regex extraction + classification
    (ref: agrobr/b3/parser.py:29-47,126-139)."""
    c = load(spark, sf_dir, "customer")
    num = F.expr(r"TRY_CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT)")
    return c.select(
        "c_custkey",
        "c_name",
        num.alias("numero"),
        F.when(num % 2 == 0, F.lit("par")).otherwise(F.lit("impar")).alias("classe"),
    )
