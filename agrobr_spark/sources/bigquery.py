"""S7: BigQuery fallback scan — option plumbing + credit-dataset
semantics, connector env-gated.

Re-expression of the reference's BigQuery client
(ref: agrobr/bcb/bigquery_client.py:13-120): table constants, the
finalidade normalization map, the pushdown predicate set, the
column-rename map, and the contract-count aggregation. The reference
builds one SQL string and ships it to basedosdados; Spark-first the
same query is (a) connector read options — fully-qualified table,
billing project, a server-side ``filter`` the spark-bigquery
connector pushes down, pruned ``selectedFields`` — plus (b) an
ordinary Catalyst groupBy over the pruned scan. Everything except the
jar-dependent ``load()`` is a pure function, unit-tested without the
connector (r6 VERDICT next #7); the load itself raises the same
env-gated ``NotImplementedError`` convention as the other optional
connectors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# ref: agrobr/bcb/bigquery_client.py:13-14
BQ_PROJECT = "basedosdados"
BQ_DATASET = "br_bcb_sicor"
BQ_TABLE = "microdados_operacao"

# ref: agrobr/bcb/bigquery_client.py:16-25 (BQ column -> public name)
BQ_COLUMNS_MAP: dict[str, str] = {
    "ano": "ano_emissao",
    "mes": "mes_emissao",
    "sigla_uf": "uf",
    "id_municipio": "cd_municipio",
    "nome_produto": "produto",
    "nome_finalidade": "finalidade",
    "valor_parcela": "valor",
    "area_financiada": "area_financiada",
}

# ref: agrobr/bcb/bigquery_client.py:62-67
_FINALIDADE_MAP = {
    "custeio": "CUSTEIO",
    "investimento": "INVESTIMENTO",
    "comercializacao": "COMERCIALIZAÇÃO",
    "comercializacão": "COMERCIALIZAÇÃO",
}

_GROUP_COLS = (
    "ano",
    "mes",
    "sigla_uf",
    "id_municipio",
    "nome_produto",
    "nome_finalidade",
)


def credito_rural_filter(
    finalidade: str = "custeio",
    produto: str | None = None,
    safra_ano: int | None = None,
    uf: str | None = None,
) -> str:
    """The WHERE clause of the reference's query
    (ref: agrobr/bcb/bigquery_client.py:60-79), as the connector's
    server-side ``filter`` option — BigQuery evaluates it at the
    storage layer, so only matching rows cross the wire (the pushdown
    the reference gets by embedding the WHERE in its SQL string)."""
    def q(s: str) -> str:
        # the filter is interpolated into the connector's server-side
        # WHERE string. BigQuery GoogleSQL string literals use
        # BACKSLASH escapes (quote-doubling is not an escape there):
        # escape backslashes first, then single quotes, so a quoted
        # argument can neither break the predicate nor smuggle in
        # extra conditions (safra_ano is hardened via int() below)
        return s.replace("\\", "\\\\").replace("'", "\\'")

    nome = _FINALIDADE_MAP.get(finalidade.lower(), finalidade.upper())
    conditions = [f"nome_finalidade = '{q(nome)}'"]
    if produto:
        conditions.append(f"UPPER(nome_produto) LIKE '%{q(produto.upper())}%'")
    if safra_ano:
        conditions.append(f"ano = {int(safra_ano)}")
    if uf:
        uf = uf.upper()
        # UFs are exactly two ASCII letters; reject anything else
        # outright rather than relying on escaping alone
        if not (len(uf) == 2 and uf.isalpha() and uf.isascii()):
            raise ValueError(f"invalid UF: {uf!r} (expected two letters)")
        conditions.append(f"sigla_uf = '{uf}'")
    return " AND ".join(conditions)


def bigquery_read_options(
    table: str | None = None,
    billing_project: str | None = None,
    filter_expr: str | None = None,
    columns: tuple[str, ...] | None = None,
) -> dict[str, str]:
    """spark-bigquery reader options for a (possibly filtered, pruned)
    scan. ``table`` defaults to the reference's fully-qualified
    credit-operations table; ``filter`` and ``selectedFields`` are the
    connector's server-side pushdown knobs (the moral equivalent of
    Catalyst's PushedFilters/ReadSchema, executed by BigQuery)."""
    opts = {"table": table or f"{BQ_PROJECT}.{BQ_DATASET}.{BQ_TABLE}"}
    if billing_project:
        opts["parentProject"] = billing_project
    if filter_expr:
        opts["filter"] = filter_expr
    if columns:
        opts["selectedFields"] = ",".join(columns)
    return opts


def read_bigquery(
    spark: SparkSession,
    table: str | None = None,
    project: str | None = None,
    filter_expr: str | None = None,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """S7 BigQuery scan via the spark-bigquery connector. Raises a
    clear error when the connector isn't on the classpath (the jar is
    absent in this environment); the option construction is the
    unit-tested part."""
    opts = bigquery_read_options(table, project, filter_expr, columns)
    try:
        reader = spark.read.format("bigquery")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()
    except Exception as e:  # pragma: no cover — no connector jar here
        raise NotImplementedError(
            "spark-bigquery connector not available in this environment"
        ) from e


def credito_rural_aggregate(df: DataFrame) -> DataFrame:
    """The reference query's SELECT/GROUP BY + rename + int cast
    (ref: agrobr/bcb/bigquery_client.py:45-58,104-108) over an
    already-filtered scan: per (year, month, uf, municipality,
    product, purpose) — total financed value, total financed area,
    contract count. Pure Catalyst, unit-testable on any local frame
    with the BQ schema."""
    agg = df.groupBy(*_GROUP_COLS).agg(
        F.sum("valor_parcela").alias("valor_parcela"),
        F.sum("area_financiada").alias("area_financiada"),
        F.count(F.lit(1)).cast("int").alias("qtd_contratos"),
    )
    renamed = agg
    for old, new in BQ_COLUMNS_MAP.items():
        if old in renamed.columns:
            renamed = renamed.withColumnRenamed(old, new)
    return renamed


def read_credito_rural(
    spark: SparkSession,
    finalidade: str = "custeio",
    produto: str | None = None,
    safra_ano: int | None = None,
    uf: str | None = None,
    billing_project: str | None = None,
) -> DataFrame:
    """The reference's ``fetch_credito_rural_bigquery`` end-to-end:
    server-side-filtered, column-pruned connector scan -> Catalyst
    aggregation -> public column names. Env-gated on the connector
    jar like :func:`read_bigquery`."""
    scan = read_bigquery(
        spark,
        filter_expr=credito_rural_filter(finalidade, produto, safra_ano, uf),
        columns=_GROUP_COLS + ("valor_parcela", "area_financiada"),
        project=billing_project,
    )
    return credito_rural_aggregate(scan)
