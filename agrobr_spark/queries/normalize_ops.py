"""Normalization operators (SURVEY §2.8 F4-F7) as engine queries.

Each is a broadcast-dim lookup join: the fact side's key is normalized
in the expression layer (accent fold + case + whitespace), then hash-
probed against a tiny dim. At 100 TB the dim ships once per executor
and the probe runs inside whole-stage codegen — the Spark-native
replacement for the reference's per-value dict lookups.

Messy-input facts (F4/F5/F6) are inline VALUES — the canonical edge
cases from the reference's unit tests — so both engines see identical
bytes; F7 runs at fact scale over lineitem with a synthesized unit
column to exercise the 2-key product-dependent join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.io import load
from agrobr_spark.normalize.dims import (
    CROP_VARIANTS,
    MUNICIPALITIES,
    UF_DIM,
    UNIT_FACTORS,
    crop_dim,
    municipality_dim,
    uf_dim,
    unit_dim,
    values_sql,
)
from agrobr_spark.normalize.expressions import NORM_KEY_SQL, norm_key
from agrobr_spark.queries import register

# Messy crop-name inputs (ref: tests/test_normalize/test_crops.py
# semantics — pt/en variants, accents, spacing, unknown passthrough).
CROP_INPUTS = [
    "Soja",
    "SOYBEAN",
    "  café  ",
    "Café Arábica",
    "milho safrinha",
    "Cana-de-açúcar",
    "ALGODÃO EM PLUMA",
    "boi gordo",
    "quinoa",
    "Feijão",
]

UF_INPUTS = [
    "São Paulo",
    "SP",
    "mato grosso",
    "Paraná",
    "pr",
    "CEARA",
    "Rio Grande do Sul",
    "XX",
    "Goiás",
    "distrito federal",
]

MUNI_INPUTS = [
    "Sorriso - MT",
    "Rio Verde/GO",
    "São Paulo - SP",
    "Luís Eduardo Magalhães - BA",
    "Petrolina-PE",
    "Chapecó - SC",
    "Nowhere - ZZ",
    "Uberlândia - MG",
]


def _inline(spark: SparkSession, vals: list[str]) -> DataFrame:
    return spark.createDataFrame([(v,) for v in vals], ["bruto"])


def _inline_sql(vals: list[str]) -> str:
    rows = ", ".join("('" + v.replace("'", "''") + "')" for v in vals)
    return f"(VALUES {rows}) AS f(bruto)"


@register(
    "f4_crop_canon",
    oracle=f"""
    SELECT f.bruto,
           coalesce(d.cultura,
                    replace({NORM_KEY_SQL.format(col='f.bruto')}, ' ', '_'))
             AS cultura
    FROM {_inline_sql(CROP_INPUTS)}
    LEFT JOIN {values_sql(CROP_VARIANTS, ['variante', 'cultura'])}
      ON {NORM_KEY_SQL.format(col='f.bruto')} = d.variante
    """,
    tags=("F4",),
)
def f4_crop_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 crop-name canonicalization: accent-folded broadcast-dim join
    with `replace(' ','_')` fallback (ref: agrobr/normalize/crops.py:6-174,
    aliases.py:3-57)."""
    f = _inline(spark, CROP_INPUTS).withColumn("_k", norm_key(F.col("bruto")))
    d = F.broadcast(crop_dim(spark))
    return f.join(d, f["_k"] == d["variante"], "left").select(
        "bruto",
        F.coalesce(F.col("cultura"), F.replace(F.col("_k"), F.lit(" "), F.lit("_"))).alias(
            "cultura"
        ),
    )


@register(
    "f5_uf_normalize",
    oracle=f"""
    SELECT f.bruto, d.uf, d.regiao, d.codigo_ibge
    FROM {_inline_sql(UF_INPUTS)}
    LEFT JOIN {values_sql(UF_DIM, ['uf', 'nome', 'regiao', 'codigo_ibge'])}
      ON {NORM_KEY_SQL.format(col='f.bruto')} = d.nome
         OR upper(trim(f.bruto)) = d.uf
    """,
    tags=("F5",),
)
def f5_uf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 UF normalization: name-or-sigla, accent-insensitive, plus
    region/IBGE-code enrichment (ref: agrobr/normalize/regions.py:78-205)."""
    f = _inline(spark, UF_INPUTS)
    d = F.broadcast(uf_dim(spark))
    cond = (norm_key(f["bruto"]) == d["nome"]) | (F.upper(F.trim(f["bruto"])) == d["uf"])
    return f.join(d, cond, "left").select("bruto", "uf", "regiao", "codigo_ibge")


_MUNI_RE = r"^(.*?)\s*[-/]\s*([A-Za-z]{2})$"
_MUNI_NAME_K = NORM_KEY_SQL.format(col=f"regexp_extract(bruto, '{_MUNI_RE}', 1)")
_MUNI_UF_K = f"upper(regexp_extract(bruto, '{_MUNI_RE}', 2))"


@register(
    "f6_municipality_geocode",
    oracle=f"""
    WITH split AS (
      SELECT bruto,
        {_MUNI_NAME_K} AS nome_k,
        {_MUNI_UF_K} AS uf_k
      FROM {_inline_sql(MUNI_INPUTS)})
    SELECT s.bruto, s.uf_k AS uf, d.codigo_ibge
    FROM split s
    LEFT JOIN {values_sql(MUNICIPALITIES, ['nome', 'uf', 'codigo_ibge'])}
      ON s.nome_k = d.nome AND s.uf_k = d.uf
    """,
    tags=("F6", "F5"),
)
def f6_municipality_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 municipality geocoding: split `"Município - UF"`, 2-key
    broadcast join → 7-digit IBGE code
    (ref: agrobr/normalize/municipalities.py:21-93, regions.py:150-205)."""
    pat = r"^(.*?)\s*[-/]\s*([A-Za-z]{2})$"
    f = _inline(spark, MUNI_INPUTS).select(
        "bruto",
        norm_key(F.regexp_extract("bruto", pat, 1)).alias("nome_k"),
        F.upper(F.regexp_extract("bruto", pat, 2)).alias("uf_k"),
    )
    d = F.broadcast(municipality_dim(spark))
    return f.join(
        d, (f["nome_k"] == d["nome"]) & (f["uf_k"] == d["uf"]), "left"
    ).select("bruto", F.col("uf_k").alias("uf"), "codigo_ibge")


@register(
    "f7_unit_conversion",
    oracle=f"""
    WITH fato AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
        CASE l_partkey % 4 WHEN 0 THEN 'sc60kg' WHEN 1 THEN 'ton'
                           WHEN 2 THEN 'bushel' ELSE 'arroba' END AS unidade,
        CASE l_suppkey % 3 WHEN 0 THEN 'soja' WHEN 1 THEN 'milho'
                           ELSE 'trigo' END AS produto
      FROM lineitem)
    SELECT f.l_orderkey, f.l_linenumber, f.unidade, f.produto,
           -- exact decimal product, surfaced as DOUBLE: DECIMAL output
           -- representations diverge between engines under the driver's
           -- pandas canonicalizer (round-1 hash red)
           CAST(CAST(f.l_quantity AS DECIMAL(18,4)) * CAST(d.fator_kg AS DECIMAL(18,4))
                AS DOUBLE) AS quantidade_kg
    FROM fato f
    JOIN {values_sql(UNIT_FACTORS, ['unidade', 'produto', 'fator_kg'])}
      ON f.unidade = d.unidade AND (d.produto = '*' OR d.produto = f.produto)
    """,
    tags=("F7",),
)
def f7_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 unit conversion via kg-pivot factor dim; bushel is
    product-specific → 2-key broadcast join, Decimal arithmetic
    (ref: agrobr/normalize/units.py:25-198)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.element_at(
            F.array(F.lit("sc60kg"), F.lit("ton"), F.lit("bushel"), F.lit("arroba")),
            (F.col("l_partkey") % 4 + 1).cast("int"),
        ).alias("unidade"),
        F.element_at(
            F.array(F.lit("soja"), F.lit("milho"), F.lit("trigo")),
            (F.col("l_suppkey") % 3 + 1).cast("int"),
        ).alias("produto"),
    )
    d = F.broadcast(unit_dim(spark))
    cond = (li["unidade"] == d["unidade"]) & (
        (d["produto"] == "*") | (d["produto"] == li["produto"])
    )
    return li.join(d, cond).select(
        "l_orderkey",
        "l_linenumber",
        li["unidade"],
        li["produto"],
        (
            F.col("l_quantity").cast("decimal(18,4)")
            * F.col("fator_kg").cast("decimal(18,4)")
        )
        .cast("double")
        .alias("quantidade_kg"),
    )
