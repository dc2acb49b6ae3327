"""ANTT toll-plaza traffic connector (fluxo v1 + v2 schemas).

Reference: agrobr/alt/antt_pedagio/parser.py:53-79 (month/year date
variants), :86-170 (v1: headered CSV, "Categoria N" → eixos/tipo via
CATEGORIA_MAP), :172-286 (v2: 2024+ headerless CSV with fixed column
order, numeric axle counts via EIXOS_TIPO_MAP), both aggregating
tipo_cobranca away by summing volume over
(data, concessionaria, praca, sentido, n_eixos, tipo_veiculo);
models.py:13-78 (ANO_INICIO_V2=2024, the public category/axle maps).

Feeds the ``antt_pedagio.fluxo`` contract. The per-row maps and the
group-by are Catalyst expressions — the same transform runs over a
distributed scan of the full CKAN dump at scale (one shuffle on the
group key, map-side combine).
"""

from __future__ import annotations

from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.sources.connectors._base import (
    csv_text_rows,
    decode_csv,
    register_connector,
    rows_df,
)

ANO_INICIO_V2 = 2024

# public ANTT category vocabulary (ref models.py:15-25)
CATEGORIA_EIXOS: dict[str, int] = {
    "Categoria 1": 2, "Categoria 2": 2, "Categoria 3": 3, "Categoria 4": 3,
    "Categoria 5": 4, "Categoria 6": 4, "Categoria 7": 5, "Categoria 8": 6,
    "Categoria 9": 2,
}
CATEGORIA_TIPO: dict[str, str] = {
    "Categoria 1": "Passeio", "Categoria 2": "Comercial",
    "Categoria 3": "Passeio", "Categoria 4": "Comercial",
    "Categoria 5": "Passeio", "Categoria 6": "Comercial",
    "Categoria 7": "Comercial", "Categoria 8": "Comercial",
    "Categoria 9": "Moto",
}

COLUNAS_V2 = (
    "concessionaria", "praca", "mes_ano", "categoria_eixo", "tipo_cobranca",
    "sentido", "quantidade",
)

_SAIDA = (
    "data", "concessionaria", "praca", "sentido", "n_eixos", "tipo_veiculo",
    "volume",
)


def _lit_map(d: dict):
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(d.items())])


def _data_mes(col):
    """'dd/mm/yyyy' or 'mm/yyyy' → first-of-month date
    (ref parser.py:53-79)."""
    parts = F.split(F.trim(F.replace(col, F.lit('"'), F.lit(""))), "/")
    n = F.array_size(parts)
    ano = F.when(n == 3, F.element_at(parts, 3)).otherwise(F.element_at(parts, 2))
    mes = F.when(n == 3, F.element_at(parts, 2)).otherwise(F.element_at(parts, 1))
    return F.try_to_timestamp(
        F.concat_ws("-", ano, F.lpad(mes, 2, "0"), F.lit("01")),
        F.lit("yyyy-MM-dd"),
    ).cast("date")


def _fluxo_agg(df: DataFrame) -> DataFrame:
    """Sum volume over the flow key — collapses tipo_cobranca
    (ref parser.py:155-160)."""
    out = (
        df.filter(F.col("data").isNotNull())
        .groupBy("data", "concessionaria", "praca", "sentido", "n_eixos",
                 "tipo_veiculo")
        .agg(F.sum("volume").alias("volume"))
    )
    return out.select(*_SAIDA).orderBy(
        "data", "concessionaria", "praca", "sentido", "n_eixos"
    )


def fluxo_v1_columns(df: DataFrame) -> DataFrame:
    cols = {c.strip().lower().replace(" ", "_") for c in df.columns}
    df = df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])
    if "mes_ano" not in cols:
        raise ValueError(f"antt_pedagio: coluna de data ausente em {sorted(cols)}")
    # a missing categoria column degrades to NULL eixos/tipo, like the
    # reference's else-branch (ref parser.py:134-137)
    cat = F.trim("categoria") if "categoria" in cols else F.lit(None)
    vol_col = next((c for c in ("quantidade", "volume", "qtd") if c in cols), None)
    return _fluxo_agg(
        df.select(
            _data_mes(F.col("mes_ano")).alias("data"),
            F.trim("concessionaria").alias("concessionaria"),
            (F.trim("praca") if "praca" in cols else F.lit(None)).alias("praca"),
            (F.trim("sentido") if "sentido" in cols else F.lit(None)).alias("sentido"),
            F.element_at(_lit_map(CATEGORIA_EIXOS), cat).alias("n_eixos"),
            F.element_at(_lit_map(CATEGORIA_TIPO), cat).alias("tipo_veiculo"),
            (
                F.coalesce(
                    F.translate(F.col(vol_col), " ", "").try_cast("double"),
                    F.lit(0.0),
                )
                if vol_col
                else F.lit(0.0)
            ).cast("long").alias("volume"),
        )
    )


def fluxo_v2_columns(df: DataFrame) -> DataFrame:
    """2024+ schema: numeric axle-count category
    (ref parser.py:219-252)."""
    eixos = F.col("categoria_eixo").try_cast("int")
    tipo = F.when(eixos == 2, "Passeio").when(
        eixos.between(3, 18), "Comercial"
    )  # EIXOS_TIPO_MAP collapsed: 2 → Passeio, 3..18 → Comercial
    return _fluxo_agg(
        df.select(
            _data_mes(F.col("mes_ano")).alias("data"),
            F.trim("concessionaria").alias("concessionaria"),
            F.trim("praca").alias("praca"),
            F.trim("sentido").alias("sentido"),
            eixos.alias("n_eixos"),
            tipo.alias("tipo_veiculo"),
            F.coalesce(
                F.translate("quantidade", " ", "").try_cast("double"), F.lit(0.0)
            ).cast("long").alias("volume"),
        )
    )


def _has_header(text: str) -> bool:
    first = text.split("\n", 1)[0].lower()
    return "concessionaria" in first or "praca" in first


@register_connector("antt_pedagio.fluxo")
def read_fluxo(
    spark: SparkSession, payload: bytes | str, ano: int | None = None
) -> DataFrame:
    """Version dispatch: 2024+ files use the v2 headerless schema
    (ref parser.py:288-291); header presence refines the choice."""
    text = decode_csv(payload)
    headered = _has_header(text)
    if headered:
        header, rows = csv_text_rows(text, sep=";")
        df = rows_df(spark, header, rows)
        # dispatch on NORMALIZED header names (raw headers are e.g.
        # 'Categoria Eixo'); the v1 path needs its 'categoria' column
        normed = {c.strip().lower().replace(" ", "_") for c in df.columns}
        if "categoria_eixo" in normed:
            return fluxo_v2_columns(
                df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])
            )
        return fluxo_v1_columns(df)
    # headerless → fixed v2 column order (ref parser.py:196-204)
    import csv as _csv
    import io as _io

    width = len(COLUNAS_V2)
    rows = [
        [c.strip() or None for c in r[:width]] + [None] * (width - len(r))
        for r in _csv.reader(_io.StringIO(text), delimiter=";")
        if any(c.strip() for c in r)
    ]
    if not rows:
        raise ValueError("antt_pedagio: CSV v2 vazio")
    return fluxo_v2_columns(rows_df(spark, list(COLUNAS_V2), rows))


_PRACAS_SAIDA = (
    "concessionaria", "praca_de_pedagio", "rodovia", "uf", "km_m",
    "municipio", "lat", "lon", "situacao",
)


def pracas_columns(df: DataFrame) -> DataFrame:
    """Toll-plaza registry rows → contract shape
    (ref parser.py:296-353: snake-case headers, lat/lon remap, pt-BR
    numeric coords)."""
    df = df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])
    df = df.withColumnsRenamed(
        {k: v for k, v in (("latitude", "lat"), ("longitude", "lon"))
         if k in df.columns}
    )
    cols = set(df.columns)

    def _txt(name):
        return F.trim(name) if name in cols else F.lit(None).cast("string")

    def _coord(name):
        if name not in cols:
            return F.lit(None).cast("double")
        s = F.translate(F.trim(name), " ", "")
        s = F.when(
            s.contains(",") & s.contains("."),
            F.regexp_replace(F.regexp_replace(s, r"\.", ""), ",", "."),
        ).otherwise(F.regexp_replace(s, ",", "."))
        return s.try_cast("double")

    out = df.select(
        _txt("concessionaria").alias("concessionaria"),
        F.coalesce(_txt("praca_de_pedagio"), _txt("praca")).alias("praca_de_pedagio"),
        _txt("rodovia").alias("rodovia"),
        (F.upper(F.trim("uf")) if "uf" in cols else F.lit(None).cast("string")).alias("uf"),
        _txt("km_m").alias("km_m"),
        _txt("municipio").alias("municipio"),
        _coord("lat").alias("lat"),
        _coord("lon").alias("lon"),
        _txt("situacao").alias("situacao"),
    )
    return out.select(*_PRACAS_SAIDA)


@register_connector("antt_pedagio.pracas")
def read_pracas(spark: SparkSession, payload: bytes | str) -> DataFrame:
    text = decode_csv(payload)
    first = text.split("\n", 1)[0]
    sep = ";" if first.count(";") >= first.count(",") else ","
    header, rows = csv_text_rows(text, sep=sep)
    if not rows:
        raise ValueError("antt_pedagio: CSV de pracas vazio")
    return pracas_columns(rows_df(spark, header, rows))


def join_fluxo_pracas(fluxo: DataFrame, pracas: DataFrame) -> DataFrame:
    """Enrich flow rows with rodovia/uf/municipio from the plaza
    registry (ref parser.py:356-420). The registry is tiny (hundreds
    of plazas) → broadcast; the flow side never shuffles."""
    slim = (
        pracas.select(
            F.upper(F.trim("concessionaria")).alias("_jc"),
            F.upper(F.trim("praca_de_pedagio")).alias("_jp"),
            "rodovia", "uf", "municipio",
        )
        .dropDuplicates(["_jc", "_jp"])
    )
    out = fluxo.join(
        F.broadcast(slim),
        (F.upper(F.trim(fluxo["concessionaria"])) == F.col("_jc"))
        & (F.upper(F.trim(fluxo["praca"])) == F.col("_jp")),
        "left",
    ).drop("_jc", "_jp")
    return out
