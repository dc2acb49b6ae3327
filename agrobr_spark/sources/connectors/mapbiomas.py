"""MapBiomas connector: land-cover/transition workbook → long format.

Reference: agrobr/mapbiomas/parser.py:24-82 (COVERAGE melt over
integer year columns, state→UF, class-id→legend name) and :84-144
(TRANSITION melt over ``pNNNN_NNNN`` period columns);
models.py:21-76 (collection-10 class legend + sheet names — public
MapBiomas facts).

Spark-first melt: the wide→long unpivot is one ``F.stack`` expression
(no shuffle, no Python), state and class lookups are broadcast-map
``element_at`` expressions — so ``cobertura_columns`` composes
unchanged with a distributed scan of the full 500 MB collection
workbook exported to parquet.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.functions import norm_key
from agrobr_spark.normalize.dims import UF_DIM
from agrobr_spark.sources.connectors._base import register_connector, rows_df
from agrobr_spark.sources.xlsx import read_sheet_rows

SHEET_COBERTURA = "COVERAGE_10"
SHEET_TRANSICAO = "TRANSITION_10"

# collection-10 class legend (public MapBiomas facts;
# ref models.py:21-60)
CLASSES_LEGENDA: dict[int, str] = {
    1: "Floresta",
    3: "Formação Florestal",
    4: "Formação Savânica",
    5: "Mangue",
    6: "Floresta Alagável",
    9: "Silvicultura",
    10: "Vegetação Herbácea e Arbustiva",
    11: "Campo Alagado e Área Pantanosa",
    12: "Formação Campestre",
    14: "Agropecuária",
    15: "Pastagem",
    18: "Agricultura",
    19: "Lavoura Temporária",
    20: "Cana",
    21: "Mosaico de Usos",
    22: "Área não Vegetada",
    23: "Praia, Duna e Areal",
    24: "Área Urbanizada",
    25: "Outras Áreas não Vegetadas",
    26: "Corpo D'Água",
    27: "Não observado",
    29: "Afloramento Rochoso",
    30: "Mineração",
    31: "Aquicultura",
    32: "Apicum",
    33: "Rio, Lago e Oceano",
    35: "Dendê",
    36: "Lavoura Perene",
    39: "Soja",
    40: "Arroz",
    41: "Outras Lavouras Temporárias",
    46: "Café",
    47: "Citrus",
    48: "Outras Lavouras Perenes",
    49: "Restinga Arbórea",
    50: "Restinga Herbácea",
    62: "Algodão",
    75: "Não definido",
}

_COBERTURA_SAIDA = ("bioma", "estado", "classe_id", "classe", "nivel_0",
                    "ano", "area_ha")
_TRANSICAO_SAIDA = ("bioma", "estado", "classe_de_id", "classe_de",
                    "classe_para_id", "classe_para", "periodo", "area_ha")


def _classe_nome(id_col):
    """class id → legend name, 'Classe N' fallback
    (ref models.py:143-144)."""
    legend = F.create_map(
        *[F.lit(x) for pair in CLASSES_LEGENDA.items() for x in (pair[0], str(pair[1]))]
    )
    cid = id_col.try_cast("int")
    return F.coalesce(
        F.element_at(legend, cid),
        F.concat(F.lit("Classe "), cid.cast("string")),
    )


def _estado_uf(state_col):
    """Full state name → UF sigla via the broadcast UF map, pass-through
    when unknown (ref models.py:138-140)."""
    uf_map = F.create_map(
        *[F.lit(x) for uf, nome, _, _ in UF_DIM for x in (nome, uf)]
    )
    return F.coalesce(F.element_at(uf_map, norm_key(state_col)), state_col)


def _melt(df: DataFrame, value_cols: list[str], var_name: str) -> DataFrame:
    """Wide→long as one stack() expression — Catalyst-only melt."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return df.select(
        "*",
        F.expr(
            f"stack({len(value_cols)}, {pairs}) as ({var_name}, area_raw)"
        ),
    )


def cobertura_columns(df: DataFrame, year_cols: list[str]) -> DataFrame:
    """Wide COVERAGE rows → long contract shape
    (ref parser.py:58-81)."""
    out = _melt(df, year_cols, "ano_raw").select(
        F.col("biome").alias("bioma"),
        _estado_uf(F.col("state")).alias("estado"),
        F.col("class").try_cast("int").alias("classe_id"),
        _classe_nome(F.col("class")).alias("classe"),
        F.coalesce(F.col("class_level_0"), F.lit("")).alias("nivel_0"),
        F.col("ano_raw").try_cast("int").alias("ano"),
        F.col("area_raw").try_cast("double").alias("area_ha"),
    )
    return out.filter(F.col("area_ha").isNotNull()).select(*_COBERTURA_SAIDA)


def transicao_columns(df: DataFrame, period_cols: list[str]) -> DataFrame:
    """Wide TRANSITION rows → long contract shape; ``p2000_2010`` →
    ``2000-2010`` (ref parser.py:110-141)."""
    out = _melt(df, period_cols, "periodo_raw").select(
        F.col("biome").alias("bioma"),
        _estado_uf(F.col("state")).alias("estado"),
        F.col("class_from").try_cast("int").alias("classe_de_id"),
        _classe_nome(F.col("class_from")).alias("classe_de"),
        F.col("class_to").try_cast("int").alias("classe_para_id"),
        _classe_nome(F.col("class_to")).alias("classe_para"),
        F.replace(
            F.regexp_replace("periodo_raw", r"^p", ""),
            F.lit("_"), F.lit("-"),
        ).alias("periodo"),
        F.col("area_raw").try_cast("double").alias("area_ha"),
    )
    return out.filter(F.col("area_ha").isNotNull()).select(*_TRANSICAO_SAIDA)


def _sheet_df(
    spark: SparkSession, source: str | bytes, sheet: str, required: set[str]
) -> tuple[DataFrame, list[str]]:
    rows = [r for r in read_sheet_rows(source, sheet) if any(v is not None for v in r)]
    if not rows:
        raise ValueError(f"mapbiomas: sheet {sheet} empty")
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    missing = required - set(header)
    if missing:
        raise ValueError(f"mapbiomas: missing required columns {missing}")
    data = [[None if v is None else str(v) for v in r] for r in rows[1:]]
    return rows_df(spark, header, data), header


@register_connector("mapbiomas.cobertura")
def read_cobertura(spark: SparkSession, source: str | bytes) -> DataFrame:
    df, header = _sheet_df(
        spark, source, SHEET_COBERTURA,
        {"biome", "state", "class", "class_level_0"},
    )
    year_cols = [h for h in header if h.isdigit()]
    if not year_cols:
        raise ValueError("mapbiomas: no year columns in COVERAGE sheet")
    return cobertura_columns(df, year_cols).orderBy(
        "bioma", "estado", "classe_id", "ano"
    )


@register_connector("mapbiomas.transicao")
def read_transicao(spark: SparkSession, source: str | bytes) -> DataFrame:
    df, header = _sheet_df(
        spark, source, SHEET_TRANSICAO,
        {"biome", "state", "class_from", "class_to"},
    )
    period_cols = [h for h in header if h.startswith("p") and "_" in h]
    if not period_cols:
        raise ValueError("mapbiomas: no period columns in TRANSITION sheet")
    return transicao_columns(df, period_cols).orderBy(
        "bioma", "estado", "classe_de_id", "classe_para_id", "periodo"
    )
