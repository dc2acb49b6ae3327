"""Relational core (SURVEY §2.2–§2.7) mapped onto the synthetic star schema.

Each query re-expresses one reference operator Spark-first and carries a
DuckDB oracle. Reference citations point at the pandas code whose
semantics the query reproduces (FIXTURES.md §14 gives the table mapping:
J1 ≈ lineitem←orders←customer, A1 ≈ sum by (returnflag, linestatus),
W1 ≈ lag over shipdate, …).

Scale notes (100 TB posture):
- dim joins (region/nation/part-dims) are explicit ``broadcast()`` — no
  shuffle of the fact side;
- aggregations are expressed as single groupBy so Spark plans partial
  (map-side) aggregation before the exchange;
- window queries partition by the natural key so state stays local to a
  shuffle partition; orderings carry unique tie-breakers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from agrobr_spark.io import load
from agrobr_spark.queries import register

DEC = "decimal(18,4)"


def _dsum(c, alias: str):
    """Order-insensitive money sum: decimal-exact, surfaced as double."""
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


# ---------------------------------------------------------------- §2.2 P


@register(
    "p1_project_rename",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linha,
           l_quantity AS quantidade, l_extendedprice AS valor,
           l_extendedprice * (1 - l_discount) AS receita
    FROM lineitem
    """,
    tags=("P1", "F9"),
)
def p1_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 rename-map projection + F9 derived arithmetic
    (ref: agrobr/comtrade/parser.py:14-76, agrobr/bcb/parser.py:14-90)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linha"),
        F.col("l_quantity").alias("quantidade"),
        F.col("l_extendedprice").alias("valor"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("receita"),
    )


@register(
    "p2_eq_filter",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE upper(c_mktsegment) = 'BUILDING'
    """,
    tags=("P2",),
)
def p2_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 case-normalized equality filter (ref: agrobr/bcb/api.py:91-98)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.upper(F.col("c_mktsegment")) == F.lit("BUILDING"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "p3_string_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_name LIKE 's%' AND p_type LIKE '%ECO%'
      AND p_brand IN ('Brand#1','Brand#2','Brand#3')
    """,
    tags=("P3",),
)
def p3_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 prefix/contains/isin predicates
    (ref: agrobr/comexstat/parser.py:77-78, agrobr/b3/parser.py:158-163)."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").startswith("s")
        & F.col("p_type").contains("ECO")
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "p4_date_range",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS data, o_totalprice
    FROM orders
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    """,
    tags=("P4",),
)
def p4_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 date-range predicate (ref: agrobr/cepea/api.py:231,
    agrobr/cache/duckdb_store.py:349-364). Pushed to the parquet scan."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.filter(d.between(F.lit("1996-01-01"), F.lit("1996-12-31"))).select(
        "o_orderkey", d.alias("data"), "o_totalprice"
    )


@register(
    "p6_threshold_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE coalesce(value, 0) > 100 AND event_type <> ''
    """,
    tags=("P6",),
)
def p6_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 numeric threshold + non-empty filter
    (ref: agrobr/alt/mapa_psr/parser.py:194-200)."""
    e = load(spark, sf_dir, "events")
    return e.filter(
        (F.coalesce(F.col("value"), F.lit(0.0)) > 100) & (F.col("event_type") != "")
    ).select("event_id", "user_id", "event_type", "value")


@register(
    "p7_dedup_distinct",
    oracle="SELECT DISTINCT p_brand, p_type FROM part",
    tags=("P7",),
)
def p7_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 dedup on key columns (ref: agrobr/antaq/parser.py:117).
    Expressed as distinct-projection so survivors are deterministic."""
    return load(spark, sf_dir, "part").select("p_brand", "p_type").distinct()


@register(
    "p8_category_exclusion",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE lower(event_type) NOT IN ('error')
    """,
    tags=("P8",),
)
def p8_category_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 category-exclusion filter (drop 'total'-style rows;
    ref: agrobr/ibge/api.py:892-893, agrobr/conab/parsers/v1.py:66-72)."""
    e = load(spark, sf_dir, "events")
    return e.filter(~F.lower(F.col("event_type")).isin("error")).select(
        "event_id", "event_type", "value"
    )


# ---------------------------------------------------------------- §2.3 J


@register(
    "j1_fact_dim_enrich",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           l.l_extendedprice * (1 - l.l_discount) AS receita,
           CAST(o.o_orderdate AS DATE) AS data_pedido,
           c.c_mktsegment AS segmento, n.n_name AS nacao
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    tags=("J1", "J5"),
)
def j1_fact_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J5 fact←dim left-join enrichment chain
    (ref: agrobr/antaq/parser.py:86-120, alt/antt_pedagio/parser.py:376-399).
    customer/nation are broadcast — the 100 TB fact side never shuffles."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("receita"),
            F.col("o_orderdate").cast("date").alias("data_pedido"),
            F.col("c_mktsegment").alias("segmento"),
            F.col("n_name").alias("nacao"),
        )
    )


@register(
    "j2_full_outer_mirror",
    oracle="""
    WITH reporter AS (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS peso_rep,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS fob_rep
      FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey
    ), partner AS (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS peso_par,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS fob_par
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey
    )
    SELECT coalesce(r.l_partkey, p.l_partkey) AS partkey,
           r.peso_rep, r.fob_rep, p.peso_par, p.fob_par,
           coalesce(r.fob_rep, 0) - coalesce(p.fob_par, 0) AS diff_fob,
           r.fob_rep / nullif(p.fob_par, 0) AS ratio_fob
    FROM reporter r FULL OUTER JOIN partner p ON r.l_partkey = p.l_partkey
    """,
    tags=("J2", "F9"),
)
def j2_full_outer_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 trade-mirror full-outer join + discrepancy calc with
    divide-by-zero guard (ref: agrobr/comtrade/parser.py:88-155)."""
    li = load(spark, sf_dir, "lineitem")

    def side(flag: str, peso: str, fob: str) -> DataFrame:
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy("l_partkey")
            .agg(_dsum(F.col("l_quantity"), peso), _dsum(F.col("l_extendedprice"), fob))
        )

    r = side("A", "peso_rep", "fob_rep").alias("r")
    p = side("R", "peso_par", "fob_par").alias("p")
    return r.join(p, F.col("r.l_partkey") == F.col("p.l_partkey"), "full_outer").select(
        F.coalesce("r.l_partkey", "p.l_partkey").alias("partkey"),
        "peso_rep",
        "fob_rep",
        "peso_par",
        "fob_par",
        (F.coalesce("fob_rep", F.lit(0.0)) - F.coalesce("fob_par", F.lit(0.0))).alias(
            "diff_fob"
        ),
        (F.col("fob_rep") / F.nullif(F.col("fob_par"), F.lit(0.0))).alias("ratio_fob"),
    )


@register(
    "j3_conditional_split_agg",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
               THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qtd_a,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
               THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qtd_r
    FROM lineitem GROUP BY l_orderkey
    """,
    tags=("J3",),
)
def j3_conditional_split_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 measure-split outer join, re-expressed as conditional aggregation
    (one shuffle instead of two + join; ref: agrobr/ibge/api.py:616-633)."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(DEC)
    return li.groupBy("l_orderkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "A", q)).cast("double").alias("qtd_a"),
        F.sum(F.when(F.col("l_returnflag") == "R", q)).cast("double").alias("qtd_r"),
    )


@register(
    "j4_group_first",
    oracle="""
    SELECT c_nationkey, min(c_name) AS primeiro_nome,
           count(*) AS n_clientes, min(c_acctbal) AS min_saldo
    FROM customer GROUP BY c_nationkey
    """,
    tags=("J4",),
)
def j4_group_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 per-group representative row (ref: agrobr/nasa_power/parser.py:121-124);
    min() instead of first() so the representative is deterministic."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.min("c_name").alias("primeiro_nome"),
            F.count(F.lit(1)).alias("n_clientes"),
            F.min("c_acctbal").alias("min_saldo"),
        )
    )


@register(
    "j6_small_dim_lookup",
    oracle="""
    SELECT n.n_nationkey, n.n_name AS nacao, r.r_name AS regiao
    FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("J6",),
)
def j6_small_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 small-dimension lookup as a broadcast join
    (ref: agrobr/normalize/municipalities.py:54-69, bcb/parser.py:58-74)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left").select(
        "n_nationkey", F.col("n_name").alias("nacao"), F.col("r_name").alias("regiao")
    )


# ---------------------------------------------------------------- §2.4 A


@register(
    "a1_rollup_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
            AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1",),
)
def a1_rollup_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 group-by-sum rollup (TPC-H Q1 shape;
    ref: agrobr/bcb/parser.py:128-177). Partial aggregation happens
    map-side; only (flag,status) partials cross the exchange."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (
                F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a2_sum_derived",
    oracle="""
    SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS kg_total,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / 1000.0 AS volume_ton
    FROM lineitem GROUP BY l_partkey
    """,
    tags=("A2", "F9"),
)
def a2_sum_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 rollup + derived unit column (ref: agrobr/comexstat/parser.py:108-130)."""
    li = load(spark, sf_dir, "lineitem")
    kg = F.sum(F.col("l_quantity").cast(DEC)).cast("double")
    return li.groupBy("l_partkey").agg(
        kg.alias("kg_total"), (kg / F.lit(1000.0)).alias("volume_ton")
    )


@register(
    "a3_nullable_group_keys",
    oracle="""
    SELECT nullif(event_type, 'error') AS tipo, count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events GROUP BY nullif(event_type, 'error')
    """,
    tags=("A3", "F8"),
)
def a3_nullable_group_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 groupBy with NULL group keys kept (pandas dropna=False;
    ref: agrobr/alt/antt_pedagio/parser.py:153-156) — Spark and DuckDB
    both group NULLs; nullif() injects the NULL key."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.nullif(F.col("event_type"), F.lit("error")).alias("tipo")).agg(
        F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), "total")
    )


@register(
    "a4_daily_bucket",
    oracle="""
    SELECT CAST(ts AS DATE) AS dia, event_type,
        count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS soma,
        min(value) AS minimo, max(value) AS maximo,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
            / CAST(count(value) AS DOUBLE) AS media
    FROM events GROUP BY CAST(ts AS DATE), event_type
    """,
    tags=("A4",),
)
def a4_daily_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 daily time-bucket aggregation (ref: agrobr/inmet/parser.py:94-122,
    pd.Grouper(freq='D') → date_trunc groupBy)."""
    e = load(spark, sf_dir, "events")
    soma = F.sum(F.col("value").cast(DEC)).cast("double")
    return e.groupBy(
        F.col("ts").cast("date").alias("dia"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        soma.alias("soma"),
        F.min("value").alias("minimo"),
        F.max("value").alias("maximo"),
        (soma / F.count("value").cast("double")).alias("media"),
    )


@register(
    "a5_monthly_bucket",
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS mes,
        count(*) AS n, count(DISTINCT user_id) AS usuarios,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS soma
    FROM events GROUP BY date_trunc('month', ts)
    """,
    tags=("A5",),
)
def a5_monthly_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 monthly rollup + exact distinct (ref: agrobr/nasa_power/parser.py:89-126,
    agrobr/inmet/parser.py:125-151 nunique(estacao))."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("month", "ts").cast("date").alias("mes")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("usuarios"),
        _dsum(F.col("value"), "soma"),
    )


PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "a6_pivot",
    oracle="""
    SELECT CAST(ts AS DATE) AS dia,
        CAST(SUM(CASE WHEN event_type = 'click'
            THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click,
        CAST(SUM(CASE WHEN event_type = 'error'
            THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error,
        CAST(SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup'
            THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS signup,
        CAST(SUM(CASE WHEN event_type = 'view'
            THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view
    FROM events GROUP BY CAST(ts AS DATE)
    """,
    tags=("A6",),
)
def a6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 long→wide pivot aggregation (ref: agrobr/ibge/api.py:151-168,
    usda/parser.py:72-96). Pivot values are declared explicitly so the
    plan is deterministic and needs no extra pass (SURVEY §7 note)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").alias("dia"))
        .pivot("event_type", PIVOT_EVENT_TYPES)
        .agg(F.sum(F.col("value").cast(DEC)).cast("double"))
    )


@register(
    "a7_summary_row",
    oracle="""
    SELECT count(*) AS n_pedidos,
        count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_abertos,
        count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_fechados,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
            / CAST(count(o_totalprice) AS DOUBLE) AS medio,
        CAST(max(o_orderdate) AS DATE) AS ultimo_pedido
    FROM orders
    """,
    tags=("A7", "A8"),
)
def a7_summary_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 one-row summary with conditional counts
    (ref: agrobr/alt/sicar/parser.py:81-122)."""
    o = load(spark, sf_dir, "orders")
    total = F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
    return o.agg(
        F.count(F.lit(1)).alias("n_pedidos"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_abertos"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_fechados"),
        total.alias("total"),
        (total / F.count("o_totalprice").cast("double")).alias("medio"),
        F.max("o_orderdate").cast("date").alias("ultimo_pedido"),
    )


@register(
    "a8_quality_metrics",
    oracle="""
    SELECT count(*) AS n_linhas,
        count(value) AS value_nao_nulo,
        count(props) AS props_nao_nulo,
        count(*) - count(DISTINCT concat_ws(CHR(31), CAST(event_id AS VARCHAR),
            CAST(user_id AS VARCHAR), event_type)) AS linhas_duplicadas,
        CAST(max(ts) AS DATE) AS mais_recente
    FROM events
    """,
    tags=("A8",),
)
def a8_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 quality-metric aggregates: completeness counts, exact-duplicate
    count, freshness (ref: agrobr/quality.py:82-254)."""
    e = load(spark, sf_dir, "events")
    rowkey = F.concat_ws(
        "\x1f",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_linhas"),
        F.count("value").alias("value_nao_nulo"),
        F.count("props").alias("props_nao_nulo"),
        (F.count(F.lit(1)) - F.countDistinct(rowkey)).alias("linhas_duplicadas"),
        F.max("ts").cast("date").alias("mais_recente"),
    )


@register(
    "a9_pk_dup_detect",
    oracle="""
    SELECT o_custkey, count(*) AS n
    FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
    tags=("A9", "V1"),
)
def a9_pk_dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 primary-key duplicate detection
    (ref: agrobr/contracts/__init__.py:119-125)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    )


@register(
    "a10_distinct_values",
    oracle="""
    SELECT DISTINCT CAST(l_shipdate AS DATE) AS data
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
    """,
    tags=("A10",),
)
def a10_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 distinct-date set, gap-detection input
    (ref: agrobr/cache/duckdb_store.py:463-491)."""
    li = load(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return (
        li.select(d.alias("data"))
        .filter(F.col("data").between(F.lit("1997-01-01"), F.lit("1997-12-31")))
        .distinct()
    )



def approx_distinct_counts(li: DataFrame) -> DataFrame:
    """Library form of the 100 TB cardinality path: HyperLogLog++
    approximate distinct counts per group (rsd 2%) — fixed ~kB sketch
    state per group instead of a distinct-shuffle of every value, one
    partial+final aggregation. This is what production calls; the
    catalog entry below wraps it with an in-query exactness check."""
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("n_parts_aprox"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("n_pedidos_aprox"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a14_approx_distinct",
    # Self-verifying oracle shape: the sketches (Spark HLL++ vs
    # DuckDB's approx sketch) never match bit-for-bit, so the Spark
    # side emits per-group WITHIN-TOLERANCE booleans — |approx−exact|
    # <= max(3, 6%·exact), computed inside the query against its own
    # exact countDistinct — and the oracle pins the all-TRUE boolean
    # frame plus the exact group sizes. A sketch drifting out of its
    # error bound flips a boolean and fails the hash compare.
    oracle="""
    SELECT l_returnflag,
      count(*) AS n,
      TRUE AS partes_dentro_tol,
      TRUE AS pedidos_dentro_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A14", "DISTINCT", "APPROX", "SCALE_DEFAULT"),
)
def a14_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/verification form of :func:`approx_distinct_counts`:
    recomputes the exact distinct counts alongside the HLL++ sketches
    and emits one within-tolerance boolean per (group, column). The
    exact twin obviously defeats the sketch's purpose — production
    uses the library form; THIS entry exists so the driver's DuckDB
    oracle can pin the sketch's error bound exactly (tolerance 3
    absolute or 6% relative, 3× the configured 2% rsd — same bound as
    tests/test_operators.py::test_approx_distinct_within_bound)."""
    li = load(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
        F.countDistinct("l_partkey").alias("ep"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.countDistinct("l_orderkey").alias("eo"),
        F.count(F.lit(1)).alias("n"),
    )

    def dentro(a, e):
        tol = F.greatest(F.lit(3.0), F.col(e) * 0.06)
        return F.abs(F.col(a) - F.col(e)) <= tol

    return both.select(
        "l_returnflag",
        "n",
        dentro("ap", "ep").alias("partes_dentro_tol"),
        dentro("ao", "eo").alias("pedidos_dentro_tol"),
    )


# ---------------------------------------------------------------- §2.5 W


@register(
    "w1_pct_change",
    oracle="""
    WITH ordered AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
             CAST(l_shipdate AS DATE) AS data,
             lag(l_extendedprice) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber,
                        l_extendedprice, l_suppkey, l_quantity) AS valor_anterior
      FROM lineitem)
    SELECT l_partkey, l_orderkey, l_linenumber, data,
           l_extendedprice AS valor, valor_anterior,
           (l_extendedprice / valor_anterior - 1) * 100 AS variacao_pct,
           CASE WHEN abs((l_extendedprice / valor_anterior - 1) * 100) > 20
                THEN TRUE ELSE FALSE END AS anomalia
    FROM ordered WHERE valor_anterior IS NOT NULL
    """,
    tags=("W1", "W2", "V2"),
)
def w1_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 day-over-day % change + anomaly flag via lag window
    (ref: agrobr/validators/semantic.py:144-181, sanity.py:232-259).
    Window partitions by key → state is local to one shuffle partition."""
    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data —
    # extend the ordering until remaining ties are identical rows.
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_suppkey", "l_quantity",
    )
    pct = (F.col("valor") / F.col("valor_anterior") - 1) * 100
    return (
        li.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("data"),
            F.col("l_extendedprice").alias("valor"),
            F.lag("l_extendedprice").over(w).alias("valor_anterior"),
        )
        .filter(F.col("valor_anterior").isNotNull())
        .withColumn("variacao_pct", pct)
        .withColumn("anomalia", F.abs(F.col("variacao_pct")) > 20)
    )


@register(
    "w3_gap_detect",
    oracle="""
    WITH dias AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS data FROM events),
    seq AS (
      SELECT user_id, data,
             lag(data) OVER (PARTITION BY user_id ORDER BY data) AS data_anterior
      FROM dias)
    SELECT user_id, data, data_anterior,
           date_diff('day', data_anterior, data) AS dias_gap
    FROM seq
    WHERE data_anterior IS NOT NULL
      AND date_diff('day', data_anterior, data) > 2
    """,
    tags=("W3", "V3"),
)
def w3_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 date-sequence gap detection
    (ref: agrobr/validators/semantic.py:184-228)."""
    e = load(spark, sf_dir, "events")
    dias = e.select("user_id", F.col("ts").cast("date").alias("data")).distinct()
    w = Window.partitionBy("user_id").orderBy("data")
    return (
        dias.withColumn("data_anterior", F.lag("data").over(w))
        .withColumn("dias_gap", F.datediff("data", "data_anterior"))
        .filter(F.col("data_anterior").isNotNull() & (F.col("dias_gap") > 2))
    )


@register(
    "w4_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS data, o_totalprice
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
    tags=("W4", "O4"),
)
def w4_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 latest-per-key top-1 (ultimo();
    ref: agrobr/cepea/api.py:326-386, cache/duckdb_store.py:318-336)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("data"),
            "o_totalprice",
        )
    )


@register(
    "w5_calendar_antijoin",
    oracle="""
    WITH calendario AS (
      SELECT CAST(d AS DATE) AS data
      FROM generate_series(DATE '1996-01-01', DATE '1996-12-31',
                           INTERVAL 1 DAY) AS t(d)
      WHERE dayofweek(CAST(d AS DATE)) BETWEEN 1 AND 5),
    presentes AS (
      SELECT DISTINCT CAST(l_shipdate AS DATE) AS data
      FROM lineitem WHERE l_partkey < 50)
    SELECT c.data FROM calendario c
    WHERE NOT EXISTS (SELECT 1 FROM presentes p WHERE p.data = c.data)
    """,
    tags=("W5", "U2", "M5"),
)
def w5_calendar_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/M5 business-day calendar anti-join (missing-dates gap fill;
    ref: agrobr/cache/history.py:108-123, cepea/api.py:124-133).
    Present-dates side is a sparse key subset so gaps actually exist."""
    li = load(spark, sf_dir, "lineitem")
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("data")
    )
    # Spark dayofweek: 1=Sun..7=Sat → Mon-Fri is 2..6
    cal = cal.filter(F.dayofweek("data").between(2, 6))
    presentes = (
        li.filter(F.col("l_partkey") < 50)
        .select(F.col("l_shipdate").cast("date").alias("data"))
        .distinct()
    )
    return cal.join(presentes, "data", "left_anti")


# ------------------------------------------------------------- §2.6 O


@register(
    "o3_topk_search",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_name LIKE '%12%' ORDER BY c_name LIMIT 10
    """,
    tags=("O3", "O1"),
)
def o3_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 contains-search + ordered top-k
    (ref: agrobr/normalize/municipalities.py:76-89). c_name is unique →
    ordering (and thus the LIMIT cut) is deterministic."""
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").contains("12"))
        .select("c_custkey", "c_name")
        .orderBy("c_name")
        .limit(10)
    )


@register(
    "o4_limit_latest",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS data FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    """,
    tags=("O4", "O2"),
)
def o4_limit_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 ORDER BY ... DESC LIMIT 1 latest row
    (ref: agrobr/cache/duckdb_store.py:318-336)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(1)
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("data"))
    )


# ------------------------------------------------------------- §2.7 U


@register(
    "u1_union_all",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, 'A' AS origem
    FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT l_orderkey, l_partkey, l_quantity, 'R' AS origem
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("U1",),
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union-all of per-source frames (ref: agrobr/ibge/api.py:285,
    b3/api.py:164,340) via unionByName."""
    li = load(spark, sf_dir, "lineitem")

    def side(flag: str) -> DataFrame:
        return li.filter(F.col("l_returnflag") == flag).select(
            "l_orderkey", "l_partkey", "l_quantity", F.lit(flag).alias("origem")
        )

    return side("A").unionByName(side("R"))


@register(
    "u2_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND CAST(o.o_orderdate AS DATE)
            BETWEEN DATE '1996-01-01' AND DATE '1996-03-31')
    """,
    tags=("U2",),
)
def u2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 set-difference as left-anti join (customers with no order in a
    recent window — the reference's missing-dates pattern;
    ref: agrobr/cepea/api.py:184-187)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        .cast("date")
        .between(F.lit("1996-01-01"), F.lit("1996-03-31"))
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "o1_multikey_sort_limit",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
           l_extendedprice,
           CAST(l_shipdate AS DATE) AS data_envio
    FROM lineitem
    ORDER BY l_returnflag, data_envio DESC, l_orderkey, l_linenumber,
             l_quantity, l_extendedprice
    LIMIT 1000
    """,
    tags=("O1", "O2"),
)
def o1_multikey_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 multi-key sort + limit (ref: 34 sort_values call sites,
    e.g. agrobr/comexstat/parser.py:94-96; recency sort
    datasets/preco_diario.py:157). The limit makes ordering observable
    to the order-insensitive oracle hash; value columns break the
    non-unique (orderkey, linenumber) ties so the surviving top-1000
    multiset is deterministic. At scale this is a TakeOrdered — no
    full sort materialization."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.col("l_shipdate").cast("date").alias("data_envio"),
        )
        .orderBy(
            "l_returnflag",
            F.desc("data_envio"),
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
        .limit(1000)
    )


@register(
    "s5_json_scan",
    oracle="""
    -- the oracle DuckDB has no json extension loaded; props's declared
    -- schema is the single key "k", extracted by regex
    SELECT event_id, 'k' AS chave,
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS valor
    FROM events
    WHERE props IS NOT NULL
    """,
    tags=("S5",),
)
def s5_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 JSON scan: parse the raw props payload with an explicit map
    schema and explode to rows — the nested-dict→rows pivot every REST
    connector performs (ref: agrobr/nasa_power/parser.py:17-86,
    conab/ceasa/parser.py:23-76). from_json + explode runs on
    executors; no driver-side JSON loop."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.col("props").isNotNull())
        .select(
            "event_id",
            F.explode(F.from_json("props", "map<string, bigint>")).alias(
                "chave", "valor"
            ),
        )
    )


@register(
    "p5_null_drop",
    oracle="""
    SELECT event_id, value, props
    FROM events
    WHERE value IS NOT NULL AND nullif(value, -9999.0) IS NOT NULL
          AND props IS NOT NULL
    """,
    tags=("P5", "F8"),
)
def p5_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 null-row drop after sentinel cleaning (ref:
    agrobr/inmet/parser.py:82, mapbiomas/parser.py:78,141):
    dropna(subset=...) = na.drop on the cleaned columns."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_id", F.nullif(F.col("value"), F.lit(-9999.0)).alias("value"), "props"
        )
        .na.drop(subset=["value", "props"])
    )


@register(
    "j5_dedup_dim_join",
    oracle="""
    WITH dim AS (
      SELECT s_nationkey, s_name, s_acctbal FROM (
        SELECT s_nationkey, s_name, s_acctbal,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY s_suppkey) AS rn
        FROM supplier) t
      WHERE rn = 1)
    SELECT c.c_custkey, c.c_name, c.c_nationkey,
           d.s_name AS fornecedor_ref, d.s_acctbal AS saldo_ref
    FROM customer c
    LEFT JOIN dim d ON c.c_nationkey = d.s_nationkey
    """,
    tags=("J5", "P7"),
)
def j5_dedup_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 left join against a dedup'd dimension (ref:
    agrobr/alt/antt_pedagio/parser.py:376-399: plaza attrs dedup'd on
    the join keys before the fact join). drop_duplicates(keep='first')
    is made deterministic with row_number over an explicit tie-break
    ordering; the shrunken dim is broadcast so the fact side never
    shuffles."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    dim = (
        s.select("s_nationkey", "s_name", "s_acctbal", "s_suppkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "s_nationkey",
            F.col("s_name").alias("fornecedor_ref"),
            F.col("s_acctbal").alias("saldo_ref"),
        )
    )
    return c.join(F.broadcast(dim), c.c_nationkey == dim.s_nationkey, "left").select(
        "c_custkey", "c_name", "c_nationkey", "fornecedor_ref", "saldo_ref"
    )


@register(
    "o2_desc_recency",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 500
    """,
    tags=("O2", "O4"),
)
def o2_desc_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 descending recency sort + limit (ref:
    agrobr/datasets/preco_diario.py:157, cache/duckdb_store.py:318-336).
    event_id tie-break makes the LIMIT deterministic cross-engine;
    Spark plans sort+limit as TakeOrderedAndProject — no full sort."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(500)
    )


@register(
    "u4_intersect_except",
    oracle="""
    SELECT 'ambos' AS conjunto, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    UNION ALL
    SELECT 'apenas_1995' AS conjunto, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    """,
    tags=("U4",),
)
def u4_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 intersect/except row set-ops (SURVEY §2.7: absent in the
    reference, free in Spark): customers active in both 1995 and 1996
    vs only 1995. Both compile to the same aggregate-on-key shape as
    a semi/anti join — one shuffle each."""
    o = load(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return (
        y95.intersect(y96)
        .select(F.lit("ambos").alias("conjunto"), "o_custkey")
        .unionByName(
            y95.subtract(y96).select(
                F.lit("apenas_1995").alias("conjunto"), "o_custkey"
            )
        )
    )


@register(
    "a13_percentiles",
    oracle="""
    SELECT l_returnflag,
      round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
      round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
      CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A13", "PERCENTILE"),
)
def a13_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution percentiles per group (beyond the reference's
    sum/mean aggregates — the quality-cutoff shape a training-data
    pipeline uses, e.g. "drop docs below the p10 quality score").
    Spark's `percentile` and DuckDB's `quantile_cont` share the
    SQL-standard linear-interpolation definition, so the oracle is an
    exact hash match (rounded 6dp for float stability). Exact
    percentile sorts within each group partition — at 100 TB swap in
    `approx_percentile` (t-digest) when rank error is acceptable; the
    plan shape (one partial+final agg) is identical."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


_APPROX_PCT_ACC = 10_000  # rank error <= 1/accuracy of the group size


def approx_percentiles(li: DataFrame) -> DataFrame:
    """Library form of the 100 TB percentile path the a13 docstring
    promises: approx_percentile with accuracy 10,000 — guaranteed
    rank error <= n/10,000 per group, one partial+final aggregation,
    no per-group sort, sketch state O(accuracy · log n) per group
    instead of O(n). Production calls this; the catalog entry below
    wraps it with an in-query rank-bound check."""
    return li.groupBy("l_returnflag").agg(
        F.expr(
            f"approx_percentile(l_extendedprice, 0.5, {_APPROX_PCT_ACC})"
        ).alias("p50"),
        F.expr(
            f"approx_percentile(l_extendedprice, 0.9, {_APPROX_PCT_ACC})"
        ).alias("p90"),
        F.expr(
            f"approx_percentile(l_extendedprice, 0.99, {_APPROX_PCT_ACC})"
        ).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a13_percentiles_approx",
    # Self-verifying oracle shape: the sketches (Spark Greenwald-
    # Khanna vs DuckDB's approx quantile) never match bit-for-bit, so
    # the Spark side verifies its OWN sketch in-query — each approx
    # value's exact rank window in its group must intersect the
    # guaranteed ±n/accuracy window around the target percentile
    # (identical bounds to tests/test_operators.py::
    # test_approx_percentiles_within_rank_bound) — and emits one
    # boolean per percentile; the oracle pins the all-TRUE frame plus
    # exact group sizes.
    oracle="""
    SELECT l_returnflag,
      count(*) AS n,
      TRUE AS p50_dentro, TRUE AS p90_dentro, TRUE AS p99_dentro
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A13", "PERCENTILE", "APPROX", "SCALE_DEFAULT"),
)
def a13_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/verification form of :func:`approx_percentiles`
    (r6 VERDICT next #1): the per-group sketch output is broadcast
    back onto the fact table, the exact rank window of each approx
    value (rows strictly below / at-or-below it) is computed with one
    more keyed aggregation, and the rank-bound booleans are emitted.
    Production uses the library form — the verification join is one
    broadcast + one agg, cheap but pointless outside verification."""
    li = load(spark, sf_dir, "lineitem")
    ap = approx_percentiles(li)
    x = F.col("l_extendedprice")
    j = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(ap), "l_returnflag"
    )
    aggs = []
    for c in ("p50", "p90", "p99"):
        aggs += [
            F.sum((x < F.col(c)).cast("long")).alias(f"lt_{c}"),
            F.sum((x <= F.col(c)).cast("long")).alias(f"le_{c}"),
        ]
    chk = j.groupBy("l_returnflag").agg(
        F.first("n").alias("n"), *aggs
    )
    eps = 1.0 / _APPROX_PCT_ACC
    cols = [F.col("l_returnflag"), F.col("n")]
    for p, c in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        alvo = (F.col("n") - 1).cast("double") * F.lit(1.0)
        # rank window of the approx value = [lt, le-1]; guarantee
        # window = [(p-eps)(n-1)-1, (p+eps)(n-1)+1]; they must overlap
        ok = (
            (F.col(f"lt_{c}") <= alvo * (p + eps) + 1)
            & ((F.col(f"le_{c}") - 1) >= alvo * (p - eps) - 1)
        )
        cols.append(ok.alias(f"{c}_dentro"))
    return chk.select(*cols)


_HEXV = "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), {p}, 1)) - 1)"
_HEXV_DUCK = "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {p}, 1)) - 1)"


@register(
    "o5_deterministic_sample",
    oracle=f"""
    SELECT doc_id, lang,
      CAST({_HEXV_DUCK.format(p=1)} * 16 + {_HEXV_DUCK.format(p=2)} AS BIGINT)
        AS balde
    FROM documents
    WHERE {_HEXV_DUCK.format(p=1)} * 16 + {_HEXV_DUCK.format(p=2)}
          < CASE WHEN lang = 'pt' THEN 64 ELSE 26 END
    """,
    tags=("O5", "SAMPLING"),
)
def o5_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by content-addressed hash —
    the reproducible corpus-subsetting primitive a training pipeline
    needs (`rand()` samples are not re-runnable; a hash bucket on the
    stable id is). Keep-rate per stratum: ~25% for 'pt' (bucket < 64
    of 256), ~10% otherwise (bucket < 26). The bucket is the first
    md5 byte computed with hex-digit arithmetic that evaluates
    identically in Spark and DuckDB, so the sample is bit-reproducible
    across engines — and trivially scale-stable: the predicate is a
    narrow map with no shuffle, pushdown-friendly, and adding data
    never changes which existing rows are kept."""
    d = load(spark, sf_dir, "documents")
    balde = F.expr(
        f"{_HEXV.format(p=1)} * 16 + {_HEXV.format(p=2)}"
    ).cast("bigint")
    limite = F.when(F.col("lang") == "pt", F.lit(64)).otherwise(F.lit(26))
    return (
        d.select("doc_id", "lang", balde.alias("balde"))
        .filter(F.col("balde") < limite)
    )


# -- single-pass column profiling (Deequ-class data profiling) --

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
PROFILE_HIST_BUCKETS = 8


def profile_columns(
    df: DataFrame,
    cols: tuple[str, ...],
    *,
    approx_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Library form of ``a15_profile_columns``: per column — row
    count, null count, min, max, decimal-exact sum, distinct count,
    and Shannon entropy of the value distribution (Deequ's
    ``Entropy`` analyzer) — long-form, one row per column.

    Plan: ONE scan. The unpivoted (column, value) stream aggregates
    to per-value frequencies (the exact shuffle key Spark's
    count-distinct expansion uses anyway), and the per-column roll-up
    runs over that frequency frame — so entropy costs nothing extra:
    it reads the SAME per-value counts via the identity
    ``H = log2(nn) − (Σ c·log2 c)/nn``, which needs no second pass
    to learn ``nn`` first. Each ``c·log2 c`` term is rounded to 6
    decimals and summed as decimal so the float aggregation is
    cross-engine-exact (the decimal-summed-rounded-logs pattern).

    ``approx_distinct=True`` is the documented HLL swap for hot
    columns: ``approx_count_distinct`` (HyperLogLog++, relative
    error ``rsd``) replaces the exact count over the frequency
    frame's value stream — at 100 TB the exact variant's shuffle
    carries every distinct value, the sketch carries a fixed few KB
    per column."""
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    longo = df.select(
        F.expr(f"stack({len(cols)}, {stack}) AS (coluna, valor)")
    )
    freq = longo.groupBy("coluna", "valor").agg(
        F.count(F.lit(1)).alias("c")
    )
    nn = F.sum(F.when(F.col("valor").isNotNull(), F.col("c")).otherwise(F.lit(0)))
    termo = F.when(
        F.col("valor").isNotNull(),
        F.round(F.col("c") * F.log2(F.col("c")), 6).cast("decimal(28,6)"),
    ).otherwise(F.lit(0).cast("decimal(28,6)"))
    distinct_expr = (
        F.approx_count_distinct("valor", rsd)
        if approx_distinct
        else F.count(F.when(F.col("valor").isNotNull(), F.lit(1)))
    )
    return freq.groupBy("coluna").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("valor").isNull(), F.col("c")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("nulos"),
        F.min("valor").cast("double").alias("minimo"),
        F.max("valor").cast("double").alias("maximo"),
        F.sum(F.col("valor").cast("decimal(18,4)") * F.col("c"))
        .cast("double")
        .alias("soma"),
        distinct_expr.cast("bigint").alias("n_distintos"),
        F.when(
            nn > 0,
            F.round(
                F.log2(nn.cast("double"))
                - F.sum(termo).cast("double") / nn.cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("entropia"),
    )


@register(
    "a15_profile_columns",
    oracle="""
    """ + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS coluna,
      CAST(sum(cnt) AS BIGINT) AS n,
      CAST(sum(CASE WHEN valor IS NULL THEN cnt ELSE 0 END) AS BIGINT)
        AS nulos,
      CAST(min(valor) AS DOUBLE) AS minimo,
      CAST(max(valor) AS DOUBLE) AS maximo,
      CAST(sum(CAST(valor AS DECIMAL(18,4)) * cnt) AS DOUBLE) AS soma,
      CAST(count(valor) AS BIGINT) AS n_distintos,
      CASE WHEN sum(CASE WHEN valor IS NOT NULL THEN cnt ELSE 0 END) > 0
        THEN round(
          log2(CAST(sum(CASE WHEN valor IS NOT NULL THEN cnt ELSE 0 END)
                    AS DOUBLE))
          - CAST(sum(CASE WHEN valor IS NOT NULL
                     THEN CAST(round(cnt * log2(cnt), 6) AS DECIMAL(28,6))
                     ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
            / CAST(sum(CASE WHEN valor IS NOT NULL THEN cnt ELSE 0 END)
                   AS DOUBLE),
          6)
        ELSE 0.0 END AS entropia
    FROM (SELECT {c} AS valor, count(*) AS cnt FROM lineitem GROUP BY 1)"""
        for c in _PROFILE_COLS
    ) + """
    """,
    tags=("A15", "PROFILE", "SCALE_DEFAULT"),
)
def a15_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (the Deequ/Glue-profiling shape): per numeric
    column — row count, null count, min, max, decimal-exact sum,
    exact distinct count, Shannon entropy — one row per column, the
    frame a data-quality dashboard or anomaly detector consumes
    before trusting a table. Implementation and the 100 TB argument
    (one scan, frequency-frame roll-up, HLL swap for hot columns):
    :func:`profile_columns`."""
    return profile_columns(load(spark, sf_dir, "lineitem"), _PROFILE_COLS)


@register(
    "a16_profile_histogram",
    oracle="""
    """ + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS coluna, balde,
      CAST(count(*) AS BIGINT) AS contagem
    FROM (
      SELECT CASE WHEN b.mx = b.mn THEN CAST(0 AS BIGINT)
        ELSE CAST(least({PROFILE_HIST_BUCKETS - 1},
          floor((CAST({c} AS DOUBLE) - b.mn)
                / ((b.mx - b.mn) / {PROFILE_HIST_BUCKETS}.0))) AS BIGINT)
        END AS balde
      FROM lineitem,
           (SELECT CAST(min({c}) AS DOUBLE) AS mn,
                   CAST(max({c}) AS DOUBLE) AS mx FROM lineitem) b
      WHERE {c} IS NOT NULL)
    GROUP BY 1, 2"""
        for c in _PROFILE_COLS
    ) + """
    """,
    tags=("A16", "PROFILE", "HISTOGRAM"),
)
def a16_profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per profiled column (Deequ's
    ``Histogram`` analyzer for continuous columns): 8 equal-width
    buckets over the column's [min, max], long-form
    (coluna, balde, contagem).

    Two column-pruned passes by construction — bucket boundaries
    need min/max before any row can be bucketed: pass 1 is a
    scan-local min/max aggregate collapsed to ONE driver row (at
    100 TB these bounds come free from parquet footer statistics /
    table metadata instead), whose values are inlined as literals so
    pass 2 is a pure map + one aggregation keyed (coluna, balde) —
    ≤ 8·n_cols groups, no skew, no join. Bucketing arithmetic is
    plain IEEE double ops on exactly-agreed bounds, so bucket
    assignment is bit-identical cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        *[
            f
            for c in _PROFILE_COLS
            for f in (
                F.min(c).cast("double").alias(f"mn_{c}"),
                F.max(c).cast("double").alias(f"mx_{c}"),
            )
        ]
    ).collect()[0]
    k = PROFILE_HIST_BUCKETS
    stack = ", ".join(f"'{c}', {c}" for c in _PROFILE_COLS)
    longo = li.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack}) AS (coluna, valor)")
    ).filter(F.col("valor").isNotNull())
    # per-column bounds inlined as literals, dispatched on the stack's
    # column label — pass 2 stays ONE scan
    balde = None
    for c in _PROFILE_COLS:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mx == mn or mn is None:
            expr = F.lit(0).cast("bigint")
        else:
            largura = (mx - mn) / float(k)
            expr = F.least(
                F.lit(k - 1).cast("bigint"),
                F.floor(
                    (F.col("valor").cast("double") - F.lit(mn)) / F.lit(largura)
                ),
            ).cast("bigint")
        cond = F.col("coluna") == c
        balde = F.when(cond, expr) if balde is None else balde.when(cond, expr)
    return longo.groupBy(
        "coluna", balde.alias("balde")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("contagem"))


# -- pairwise correlation profiling (Deequ's Correlation analyzer) --

_CORR_PAIRS = tuple(
    (_PROFILE_COLS[i], _PROFILE_COLS[j])
    for i in range(len(_PROFILE_COLS))
    for j in range(i + 1, len(_PROFILE_COLS))
)


def _corr_oracle_branch(x: str, y: str) -> str:
    both = f"({x} IS NOT NULL AND {y} IS NOT NULL)"
    # width 19 forces DuckDB's int128 decimal path so the co-moment
    # products can't overflow int64 storage; values are identical to
    # Spark's decimal(18,4) operands — only the storage width differs
    dx = f"CAST({x} AS DECIMAL(19,4))"
    dy = f"CAST({y} AS DECIMAL(19,4))"
    return f"""SELECT '{x}' AS coluna_a, '{y}' AS coluna_b,
      CAST(n AS BIGINT) AS n,
      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / nullif(
                sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0),
            6) AS correlacao
    FROM (
      SELECT count(*) FILTER (WHERE {both}) AS n,
             sum({dx}) FILTER (WHERE {both}) AS sx,
             sum({dy}) FILTER (WHERE {both}) AS sy,
             sum({dx} * {dx}) FILTER (WHERE {both}) AS sxx,
             sum({dy} * {dy}) FILTER (WHERE {both}) AS syy,
             sum({dx} * {dy}) FILTER (WHERE {both}) AS sxy
      FROM lineitem)"""


@register(
    "a17_profile_correlation",
    oracle="\n    "
    + "\nUNION ALL\n".join(_corr_oracle_branch(x, y) for x, y in _CORR_PAIRS)
    + "\n    ",
    tags=("A17", "PROFILE", "CORRELATION"),
)
def a17_profile_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation across the profiled columns
    (Deequ's ``Correlation`` analyzer): one row per column pair with
    its pairwise-complete row count and correlation — the
    multicollinearity/redundancy report a feature-quality dashboard
    reads next to a15's per-column profile.

    Plan: ONE scan, ONE single-row aggregate — every pair's five
    co-moment sums (Σx, Σy, Σx², Σy², Σxy, each masked to rows where
    BOTH columns are non-null, Deequ's pairwise-complete convention)
    computes in the same partial+final aggregation; the long-form
    explode afterwards runs on that single row. Cross-engine
    determinism: the co-moments accumulate in DECIMAL (exact,
    order-insensitive), and the correlation derives from those exact
    sums in IEEE double — identical inputs, identical single-op
    arithmetic, with a final round(6) absorbing any sqrt ulp. A
    zero-variance column yields NULL (0/0) via nullif, both engines
    alike."""
    return profile_correlation(load(spark, sf_dir, "lineitem"), _CORR_PAIRS)


def profile_correlation(
    df: DataFrame, pairs: tuple[tuple[str, str], ...]
) -> DataFrame:
    """Library form of ``a17_profile_correlation`` over any frame:
    pairwise-complete Pearson per requested column pair, one scan,
    one single-row decimal co-moment aggregate (see the catalog
    entry's docstring for the determinism and plan argument)."""
    aggs = []
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        dx = F.when(both, F.col(x).cast(DEC))
        dy = F.when(both, F.col(y).cast(DEC))
        p = f"{x}__{y}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"n__{p}"),
            F.sum(dx).alias(f"sx__{p}"),
            F.sum(dy).alias(f"sy__{p}"),
            F.sum(dx * dx).alias(f"sxx__{p}"),
            F.sum(dy * dy).alias(f"syy__{p}"),
            F.sum(dx * dy).alias(f"sxy__{p}"),
        ]
    momentos = df.agg(*aggs)
    # explode the ONE aggregate row into long form — a union of
    # per-pair selects would recompute the aggregate (and rescan the
    # table) once per pair
    linhas = []
    for x, y in pairs:
        p = f"{x}__{y}"
        n = F.col(f"n__{p}").cast("double")
        sx = F.col(f"sx__{p}").cast("double")
        sy = F.col(f"sy__{p}").cast("double")
        sxx = F.col(f"sxx__{p}").cast("double")
        syy = F.col(f"syy__{p}").cast("double")
        sxy = F.col(f"sxy__{p}").cast("double")
        corr = F.round(
            (n * sxy - sx * sy)
            / F.nullif(
                F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
                F.lit(0.0),
            ),
            6,
        )
        linhas.append(
            F.struct(
                F.lit(x).alias("coluna_a"),
                F.lit(y).alias("coluna_b"),
                F.col(f"n__{p}").cast("bigint").alias("n"),
                corr.alias("correlacao"),
            )
        )
    return momentos.select(
        F.explode(F.array(*linhas)).alias("r")
    ).select("r.*")


# -- exact-count stratified sampling (o5's fixed-rate twin) --

O7_PER_STRATUM = 100


@register(
    "o7_stratified_sample_exact",
    oracle=f"""
    SELECT doc_id, lang, CAST(posicao AS BIGINT) AS posicao FROM (
      SELECT doc_id, lang,
        row_number() OVER (
          PARTITION BY lang
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS posicao
      FROM documents)
    WHERE posicao <= {O7_PER_STRATUM}
    """,
    tags=("O7", "SAMPLING"),
)
def o7_stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-COUNT stratified sample: precisely ``O7_PER_STRATUM``
    docs per language (o5 gives a deterministic RATE per stratum —
    its size varies with the stratum's population; eval sets and
    fixed-budget audits need an exact per-stratum count). The sample
    is content-addressed — rank by md5(doc_id) with the id as
    tie-break — so it is reproducible across engines AND stable under
    corpus growth in the md5-prefix sense: a new doc displaces at
    most one ranked doc, never reshuffles the sample.

    Scale shape: one hash-partitioned window per stratum (languages
    are few and balanced here; for a skewed stratum key the plan is
    the standard two-phase top-k — per-partition rank-truncate to k,
    then re-rank the ≤ k·P survivors — and o5's rate sampler remains
    the shuffle-free alternative). Spark runs this as WindowExec with
    a rank pushdown limit, not a global sort."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("bigint").alias("posicao"),
        )
        .filter(F.col("posicao") <= O7_PER_STRATUM)
    )


# -- weighted sampling without replacement (sequential Poisson / PPS) --

O8_SAMPLE_K = 25

#: 52-bit content hash: 13 hex digits of md5(doc_id) — strictly below
#: 2^53, so the bigint→double conversion is EXACT and the single
#: division by the weight is one correctly-rounded IEEE op on both
#: engines: xi is bit-identical WITHOUT any rounding (a 6dp round at
#: xi's ~1e11 magnitude is what would differ in the last ulp).
_O8_H13 = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13), 16, 10) AS BIGINT)"
_O8_H13_DUCK = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT AS BIGINT)"
)


@register(
    "o8_weighted_sample",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, n_chars,
        CAST({_O8_H13_DUCK} + 1 AS DOUBLE)
          / CAST(n_chars AS DOUBLE) AS xi
      FROM documents WHERE n_chars > 0)
    SELECT * FROM (
      SELECT doc_id, source, n_chars, xi,
        CAST(row_number() OVER (ORDER BY xi, doc_id) AS INTEGER)
          AS posicao
      FROM base)
    WHERE posicao <= {O8_SAMPLE_K}
    """,
    tags=("O8", "SAMPLING", "PPS"),
)
def o8_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, inclusion probability
    ∝ n_chars: sequential Poisson sampling (Ohlsson 1998) — rank every
    doc by ``xi = u / w`` where u is a content-addressed uniform
    (md5-prefix of the stable id) and w its weight, keep the k={k}
    smallest. The per-token-budget analog of o5/o7: long documents
    enter the sample proportionally to the text volume they
    contribute, which is how corpus audits and eval-set draws should
    weight when the unit of interest is tokens, not documents.
    Reproducible across engines and runs (no rand()); adding corpus
    never changes an existing doc's xi, so growth displaces at most
    the boundary of the sample, never reshuffles it.

    Cross-engine exactness without rounding tricks: the 13-hex-digit
    hash is < 2^53 so its double conversion is exact, and xi is ONE
    IEEE division of exact doubles — bit-identical on Spark and
    DuckDB by the standard, not by rounding discipline.

    Scale shape: xi is a narrow map over the scan (no shuffle), the
    k-smallest cut is orderBy+limit → TakeOrderedAndProject
    (per-partition heaps, one k-row merge) — the same plan at 500
    rows and 100 TB. The final row_number runs on the ≤k-row frame."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    xi = (F.expr(_O8_H13) + 1).cast("double") / F.col("n_chars").cast(
        "double"
    )
    top = (
        d.select("doc_id", "source", "n_chars", xi.alias("xi"))
        .orderBy("xi", "doc_id")
        .limit(O8_SAMPLE_K)
    )
    w = Window.orderBy("xi", "doc_id")
    return top.withColumn(
        "posicao", F.row_number().over(w).cast("int")
    )


o8_weighted_sample.__doc__ = o8_weighted_sample.__doc__.format(k=O8_SAMPLE_K)


# -- Bloom-pruned semi join (runtime filter as first-class data) --

J9_PRICE_FLOOR = 400_000


@register(
    "j9_bloom_semi_join",
    oracle=f"""
    SELECT l_returnflag,
      CAST(count(*) AS BIGINT) AS n_itens,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS soma_qtd
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey
        AND o.o_totalprice > {J9_PRICE_FLOOR})
    GROUP BY l_returnflag
    """,
    tags=("J9", "JOIN", "BLOOM", "SCALE_DEFAULT"),
)
def j9_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag volume of line items belonging to high-value
    orders (> {floor}), computed as a Bloom-pruned semi join
    (operators/bloom_prune.py): the high-value order keys fold into a
    Bloom BITMAP — (word, bits) rows, ~1.5 bytes/key at 8 bits/key —
    that broadcasts and prunes the fact table map-side BEFORE its
    first shuffle; the surviving candidates then meet the key set in
    an exact left-semi join, so Bloom false positives cost only work,
    never correctness, and the oracle is the plain EXISTS semi join.

    Why not rely on Catalyst's injected runtime Bloom filter: the
    injection lives inside one plannable join — it cannot prune ahead
    of an aggregation-first plan, persist the filter for reuse across
    queries, or ship it to another pipeline. This operator is the
    same idea as data. Scale shape: bitmap build is one tiny
    ``groupBy(word).bit_or`` shuffle over the DIM side; the fact side
    sees only broadcast joins + a bit test until the (pruned) exact
    semi join; the final agg runs on the semi-join survivors."""
    from agrobr_spark.operators.bloom_prune import bloom_semi_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    alto = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > J9_PRICE_FLOOR)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        bloom_semi_join(li, alto, "l_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_itens"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("soma_qtd"),
        )
    )


j9_bloom_semi_join.__doc__ = j9_bloom_semi_join.__doc__.format(
    floor=J9_PRICE_FLOOR
)


# -- A18: approximate distinct-count profiling (HLL++), self-verified --

_A18_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_shipdate",
    "l_returnflag",
)
_A18_RSD = 0.02
_A18_TOL = 3.0 * _A18_RSD  # contract: |approx - exact| <= 3·rsd · exact


@register(
    "a18_approx_distinct",
    # Self-verifying oracle shape (the a13 pattern): Spark's HLL++
    # sketch and any DuckDB sketch never match bit-for-bit, so the
    # Spark side checks its OWN sketch against the exact distinct
    # count in-query and emits one boolean per column; the oracle
    # pins the exact counts plus the all-TRUE frame. HLL++ is
    # deterministic for a given dataset, so the booleans are stable
    # per fixture — probed at sf0.001/0.01/0.1 and bound-tested in
    # tests/test_operators.py.
    oracle="""
    SELECT * FROM (
      SELECT 'l_orderkey' AS coluna,
        CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exato,
        TRUE AS dentro FROM lineitem
      UNION ALL SELECT 'l_partkey',
        CAST(count(DISTINCT l_partkey) AS BIGINT), TRUE FROM lineitem
      UNION ALL SELECT 'l_suppkey',
        CAST(count(DISTINCT l_suppkey) AS BIGINT), TRUE FROM lineitem
      UNION ALL SELECT 'l_shipdate',
        CAST(count(DISTINCT l_shipdate) AS BIGINT), TRUE FROM lineitem
      UNION ALL SELECT 'l_returnflag',
        CAST(count(DISTINCT l_returnflag) AS BIGINT), TRUE FROM lineitem)
    """,
    tags=("A18", "PROFILE", "APPROX", "SCALE_DEFAULT"),
)
def a18_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-count profiling (Deequ's
    ``ApproxCountDistinct`` analyzer): per profiled column, the HLL++
    sketch estimate checked in-query against the exact distinct count
    — ``dentro`` is TRUE when the estimate lands within 3·rsd
    (rsd={rsd}) of the truth, the repo's standard self-verifying
    shape for sketches the oracle engine cannot replicate bit-level.

    At 100 TB the production call is the approx row ALONE: one scan,
    mergeable sketches per partition, no expand — exact
    count(DISTINCT) over five columns multiplies the scan through
    Spark's Expand operator and shuffles every distinct value, which
    is exactly what a profiler cannot afford on a fact table. The
    verification join here costs one extra aggregate and exists so
    the sketch's error contract is driver-hash-checked per fixture
    (the a13 discipline), not trusted from documentation."""
    li = load(spark, sf_dir, "lineitem")
    aprox = li.agg(
        *[
            F.approx_count_distinct(c, rsd=_A18_RSD).alias(f"a_{c}")
            for c in _A18_COLS
        ]
    )
    exato = li.agg(
        *[
            F.countDistinct(c).cast("bigint").alias(f"e_{c}")
            for c in _A18_COLS
        ]
    )
    j = exato.crossJoin(F.broadcast(aprox))
    stack = ", ".join(f"'{c}', e_{c}, a_{c}" for c in _A18_COLS)
    linhas = j.select(
        F.expr(
            f"stack({len(_A18_COLS)}, {stack}) AS (coluna, n_exato, n_aprox)"
        )
    )
    return linhas.select(
        "coluna",
        F.col("n_exato").cast("bigint").alias("n_exato"),
        (
            F.abs(F.col("n_aprox") - F.col("n_exato"))
            <= F.lit(_A18_TOL) * F.col("n_exato")
        ).alias("dentro"),
    )


a18_approx_distinct.__doc__ = a18_approx_distinct.__doc__.format(
    rsd=_A18_RSD
)


# -- J10: interval-interval overlap join ------------------------------

_J10_BUCKET_DAYS = 16


@register(
    "j10_interval_overlap",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
        (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS ini,
        (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
          + 1 + CAST(l_suppkey % 14 AS BIGINT) AS fim
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE)
              BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'),
    jan AS (
      SELECT o_orderkey,
        (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS ini,
        (CAST(o_orderdate AS DATE) - DATE '1970-01-01') + 14 AS fim,
        CAST(o_orderdate AS DATE) AS data_pedido
      FROM orders
      WHERE CAST(o_orderdate AS DATE)
              BETWEEN DATE '1997-01-01' AND DATE '1997-01-07')
    SELECT j.o_orderkey, j.data_pedido,
           CAST(count(*) AS BIGINT) AS n_envios_sobrepostos
    FROM jan j JOIN li ON li.ini < j.fim AND j.ini < li.fim
    GROUP BY j.o_orderkey, j.data_pedido
    """,
    tags=("J10", "RANGE", "INTERVAL", "SCALE_DEFAULT"),
)
def j10_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval overlap join: per first-week-of-1997 order
    (its fulfillment window = order date + 14 days), how many Q1
    shipments were IN TRANSIT (ship date plus a per-supplier
    1-14-day transit window — the fixture has no receipt column, so
    transit derives deterministically from l_suppkey) at some point
    inside that window — the logistics/occupancy question every
    interval analytics layer answers (room bookings, ad flights,
    sensor validity windows).

    Plan: ``operators/range_join.interval_overlap_join`` — both
    interval sides explode to their {w}-day buckets and meet in a
    hash equi-join on the bucket id; the exact overlap predicate and
    the canonical-bucket rule (pair emitted only at the overlap's
    left edge) make the result exact with no DISTINCT and no
    nested-loop: the naive theta join the oracle runs is the O(n·m)
    plan this operator exists to avoid at scale."""
    from agrobr_spark.operators.range_join import interval_overlap_join

    li = load(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01")
    ship = F.col("l_shipdate").cast("date")
    a = (
        li.filter(ship.between("1997-01-01", "1997-03-31"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(ship, epoch).alias("ini_a"),
            (
                F.datediff(ship, epoch)
                + 1
                + (F.col("l_suppkey") % 14).cast("bigint")
            ).alias("fim_a"),
        )
    )
    od = F.col("o_orderdate").cast("date")
    b = (
        load(spark, sf_dir, "orders")
        .filter(od.between("1997-01-01", "1997-01-07"))
        .select(
            "o_orderkey",
            F.datediff(od, epoch).alias("ini_b"),
            (F.datediff(od, epoch) + 14).alias("fim_b"),
            od.alias("data_pedido"),
        )
    )
    pares = interval_overlap_join(
        a, b, "ini_a", "fim_a", "ini_b", "fim_b", _J10_BUCKET_DAYS
    )
    return pares.groupBy("o_orderkey", "data_pedido").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_envios_sobrepostos")
    )


j10_interval_overlap.__doc__ = j10_interval_overlap.__doc__.format(
    w=_J10_BUCKET_DAYS
)


# -- W13: calendar gap-fill with last-observation-carried-forward ----


@register(
    "w13_gap_fill_locf",
    oracle="""
    WITH serie AS (
      SELECT CASE l_suppkey % 4 WHEN 0 THEN 'soja' WHEN 1 THEN 'milho'
                  WHEN 2 THEN 'boi' ELSE 'cafe' END AS produto,
             CAST(l_shipdate AS DATE) AS data,
             l_extendedprice / 1000.0 AS valor
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE)
              BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'),
    diario AS (
      SELECT produto, data,
        CAST(sum(CAST(valor AS DECIMAL(18,5))) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS valor
      FROM serie GROUP BY produto, data),
    lim AS (
      SELECT produto, min(data) AS d0, max(data) AS d1
      FROM diario GROUP BY produto),
    grade AS (
      SELECT l.produto, CAST(u.d AS DATE) AS data
      FROM lim l, unnest(generate_series(l.d0, l.d1, INTERVAL 1 DAY))
        AS u(d)),
    juntado AS (
      SELECT g.produto, g.data, d.valor,
             d.valor IS NULL AS preenchido
      FROM grade g LEFT JOIN diario d
        ON d.produto = g.produto AND d.data = g.data)
    SELECT produto, data,
      coalesce(valor, last_value(valor IGNORE NULLS) OVER (
        PARTITION BY produto ORDER BY data
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS valor,
      preenchido
    FROM juntado
    """,
    tags=("W13", "W3", "GAPFILL", "TIMESERIES", "SCALE_DEFAULT"),
)
def w13_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with last-observation-carried-forward: the
    companion to W3's gap DETECTION (ref:
    agrobr/validators/semantic.py:184-228 flags the holes; a consumer
    of a daily price series needs them FILLED) — per product, a
    complete daily spine from its first to last observation, missing
    days carrying the previous day's value and flagged
    ``preenchido`` so downstream consumers can distinguish observed
    from imputed points.

    Plan: the observed series aggregates per (produto, data)
    (decimal-exact mean), per-product bounds collapse to one tiny
    frame, the spine is ``sequence(d0, d1)`` EXPLODED per product (no
    calendar table, no cross join), and the fill is ONE
    last-non-null window per product ordered by date — the same
    keyed-window family as W1/W4, shuffling once on the product key.
    At 100 TB the spine explode adds O(days-per-key) rows and the
    single window is the only wide operation."""
    li = load(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    prod = F.element_at(
        F.array(F.lit("soja"), F.lit("milho"), F.lit("boi"), F.lit("cafe")),
        (F.col("l_suppkey") % 4 + 1).cast("int"),
    )
    diario = (
        li.filter(ship.between("1997-01-01", "1997-03-31"))
        .select(
            prod.alias("produto"),
            ship.alias("data"),
            (F.col("l_extendedprice") / 1000.0).alias("valor"),
        )
        .groupBy("produto", "data")
        .agg(
            (
                F.sum(F.col("valor").cast("decimal(18,5)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("valor")
        )
    )
    grade = (
        diario.groupBy("produto")
        .agg(F.min("data").alias("d0"), F.max("data").alias("d1"))
        .select(
            "produto",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias(
                "data"
            ),
        )
    )
    juntado = grade.join(diario, ["produto", "data"], "left").withColumn(
        "preenchido", F.col("valor").isNull()
    )
    w = (
        Window.partitionBy("produto")
        .orderBy("data")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return juntado.select(
        "produto",
        "data",
        F.coalesce(
            F.col("valor"), F.last("valor", ignorenulls=True).over(w)
        ).alias("valor"),
        "preenchido",
    )


# -- W14/W15: series smoothing + anomaly scoring over the daily feed --

_SERIE_DIARIA_SQL = """
    serie AS (
      SELECT CASE l_suppkey % 4 WHEN 0 THEN 'soja' WHEN 1 THEN 'milho'
                  WHEN 2 THEN 'boi' ELSE 'cafe' END AS produto,
             CAST(l_shipdate AS DATE) AS data,
             l_extendedprice / 1000.0 AS valor
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE)
              BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'),
    diario AS (
      SELECT produto, data,
        CAST(sum(CAST(valor AS DECIMAL(18,5))) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) AS valor
      FROM serie GROUP BY produto, data)"""

W14_LAGS = 8  # truncation depth of the exponential window

_W14_NUM_SQL = " + ".join(
    f"coalesce(lag(valor, {i}) OVER w, 0) * {0.5 ** i!r}"
    for i in range(W14_LAGS)
)
_W14_DEN_SQL = " + ".join(
    f"(CASE WHEN lag(valor, {i}) OVER w IS NULL THEN 0 ELSE 1 END)"
    f" * {0.5 ** i!r}"
    for i in range(W14_LAGS)
)


def _serie_diaria(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily product price series W13 established (mean
    extendedprice/1000 per (produto, data) over Q1-97, decimal-exact
    mean) — the one fixture series every time-series operator in this
    block runs on, so W13/W14/W15 stay comparable."""
    li = load(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    prod = F.element_at(
        F.array(F.lit("soja"), F.lit("milho"), F.lit("boi"), F.lit("cafe")),
        (F.col("l_suppkey") % 4 + 1).cast("int"),
    )
    return (
        li.filter(ship.between("1997-01-01", "1997-03-31"))
        .select(
            prod.alias("produto"),
            ship.alias("data"),
            (F.col("l_extendedprice") / 1000.0).alias("valor"),
        )
        .groupBy("produto", "data")
        .agg(
            (
                F.sum(F.col("valor").cast("decimal(18,5)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("valor")
        )
    )


@register(
    "w14_ewma_smooth",
    oracle=f"""
    WITH {_SERIE_DIARIA_SQL}
    SELECT * FROM (
      SELECT produto, data, valor,
        CAST(count(*) OVER (PARTITION BY produto ORDER BY data
          ROWS BETWEEN {W14_LAGS - 1} PRECEDING AND CURRENT ROW)
          AS INTEGER) AS n_obs,
        round(({_W14_NUM_SQL}) / ({_W14_DEN_SQL}), 6) AS ewma
      FROM diario
      WINDOW w AS (PARTITION BY produto ORDER BY data))
    WHERE n_obs >= 2
    """,
    tags=("W14", "TIMESERIES", "EWMA", "SCALE_DEFAULT"),
)
def w14_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over the daily price
    series (ref: the reference smooths its CEPEA indicator feeds with
    pandas ``ewm`` before publishing, agrobr/cepea/api.py series
    post-processing; this is that smoother as a window expression) —
    per product, EWMA with alpha = 1/2 truncated at {k} lags and
    RE-NORMALIZED over the lags that exist (pandas ``adjust=True``
    semantics under truncation), so the head of each series is an
    average of what's observed, not biased toward zero.

    Cross-engine determinism is arranged, not hoped for: the weights
    are 0.5**i — exact dyadic doubles, so each product w_i*x_i is an
    EXACT binary scaling — and the numerator/denominator are the same
    left-associated {k}-term sums in both engines, making the IEEE
    result bit-identical before the single 6dp round. Each series'
    FIRST row is excluded (``n_obs >= 2``): there the EWMA
    degenerates to the input value itself, which sits on the
    decimal lattice of the daily-mean quotient — exactly the 6dp
    half-boundary where Spark's shortest-repr HALF_UP and the
    oracle's scaled-binary round can legitimately disagree; every
    surviving row divides by a non-dyadic weight sum (1.5, 1.75, …),
    pushing the quotient off any decimal grid.

    Plan + 100 TB: the series aggregation shuffles once on
    (produto, data); the EWMA itself is {k} ``lag`` reads inside ONE
    window spec per product key — no self-join, no explode, state =
    {k} rows per partition stream. A window over a keyed daily series
    is millions of independent short partitions, the shape Spark's
    window operator scales linearly on."""
    w = Window.partitionBy("produto").orderBy("data")
    num = None
    den = None
    for i in range(W14_LAGS):
        x = F.lag("valor", i).over(w) if i else F.col("valor")
        peso = F.lit(0.5**i)
        n_i = F.coalesce(x, F.lit(0.0)) * peso
        d_i = F.when(x.isNull(), F.lit(0)).otherwise(F.lit(1)) * peso
        num = n_i if num is None else num + n_i
        den = d_i if den is None else den + d_i
    frame = w.rowsBetween(-(W14_LAGS - 1), 0)
    return (
        _serie_diaria(spark, sf_dir)
        .select(
            "produto",
            "data",
            "valor",
            F.count(F.lit(1)).over(frame).cast("int").alias("n_obs"),
            F.round(num / den, 6).alias("ewma"),
        )
        .filter(F.col("n_obs") >= 2)
    )


w14_ewma_smooth.__doc__ = w14_ewma_smooth.__doc__.format(k=W14_LAGS)


W15_FRAME = 15    # trailing window: rows -15 .. -1 (current row excluded)
W15_MIN_OBS = 8   # minimum trailing observations before scoring
W15_Z_LIMIT = 2.5


@register(
    "w15_rolling_zscore",
    oracle=f"""
    WITH {_SERIE_DIARIA_SQL},
    arred AS (
      SELECT produto, data,
             CAST(sum(CAST(valor AS DECIMAL(18,5))) AS DECIMAL(18,5)) AS x
      FROM serie GROUP BY produto, data),
    janela AS (
      SELECT produto, data, x,
        CAST(count(x) OVER w AS BIGINT) AS n,
        CAST(sum(x) OVER w AS DOUBLE) AS sx,
        CAST(sum(x * x) OVER w AS DOUBLE) AS sxx
      FROM arred
      WINDOW w AS (PARTITION BY produto ORDER BY data
                   ROWS BETWEEN {W15_FRAME} PRECEDING AND 1 PRECEDING))
    SELECT produto, data, CAST(x AS DOUBLE) AS valor, n,
      round((CAST(x AS DOUBLE) - sx / n)
            / sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS z,
      abs(round((CAST(x AS DOUBLE) - sx / n)
            / sqrt((sxx - sx * sx / n) / (n - 1)), 4)) > {W15_Z_LIMIT}
        AS atipico
    FROM janela
    WHERE n >= {W15_MIN_OBS} AND sxx - sx * sx / n > 0
    """,
    tags=("W15", "TIMESERIES", "ANOMALY", "MONITOR", "SCALE_DEFAULT"),
)
def w15_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag over the daily traded-value
    series — each day's total scored against the TRAILING {f}-day
    window (current day excluded, so the anomaly can't dilute its own
    baseline), flagged ``atipico`` when |z| > {lim}: the spike
    monitor the reference's sanity validators approximate with static
    band checks (ref: agrobr/validators/sanity.py price-range rules —
    this is the adaptive version that learns each product's local
    level).

    Cross-engine determinism: window SUMS over doubles are
    association-order-dependent (DuckDB aggregates frames via segment
    trees, Spark streams them), so the scored series is the EXACT
    DECIMAL(18,5) daily sum — no quotient, no re-round, so the
    windowed Σx and Σx² are exact and order-independent — and
    mean/variance/z derive from those exact sums through an identical
    double expression in both engines. Variance is the textbook
    (Σx² − (Σx)²/n)/(n−1) on exact inputs, not a streaming estimator,
    so no engine's accumulation order can leak in. Scored only where
    the trailing window holds ≥ {m} observations and positive
    variance.

    Plan + 100 TB: one shuffle on the product key, then a single
    bounded-frame window — state per partition stream is {f} decimal
    rows; no self-join against the calendar, no second pass to fetch
    the mean (both moments ride the same frame)."""
    li = load(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    prod = F.element_at(
        F.array(F.lit("soja"), F.lit("milho"), F.lit("boi"), F.lit("cafe")),
        (F.col("l_suppkey") % 4 + 1).cast("int"),
    )
    arred = (
        li.filter(ship.between("1997-01-01", "1997-03-31"))
        .select(
            prod.alias("produto"),
            ship.alias("data"),
            (F.col("l_extendedprice") / 1000.0).alias("valor"),
        )
        .groupBy("produto", "data")
        .agg(
            F.sum(F.col("valor").cast("decimal(18,5)"))
            .cast("decimal(18,5)")
            .alias("x")
        )
    )
    w = (
        Window.partitionBy("produto")
        .orderBy("data")
        .rowsBetween(-W15_FRAME, -1)
    )
    jan = arred.select(
        "produto",
        "data",
        "x",
        F.count("x").over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("double").alias("sxx"),
    )
    xd = F.col("x").cast("double")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    z = F.round(
        (xd - F.col("sx") / F.col("n")) / F.sqrt(var), 4
    )
    return (
        jan.filter(
            (F.col("n") >= W15_MIN_OBS)
            & (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n") > 0)
        )
        .select(
            "produto",
            "data",
            xd.alias("valor"),
            "n",
            z.alias("z"),
            (F.abs(z) > W15_Z_LIMIT).alias("atipico"),
        )
    )


w15_rolling_zscore.__doc__ = w15_rolling_zscore.__doc__.format(
    f=W15_FRAME, lim=W15_Z_LIMIT, m=W15_MIN_OBS
)


# -- A19: approximate quantile profiling (GK sketch), self-verified --

_A19_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_A19_QS = (0.25, 0.5, 0.75, 0.95)
_A19_ACC = 10000  # GK accuracy: rank error <= n / accuracy

_A19_COLS_SQL = "\n      UNION ALL ".join(
    f"SELECT '{c}' AS coluna, "
    f"quantile_cont({c}, {list(_A19_QS)}) AS ps, "
    f"CAST(count({c}) AS BIGINT) AS n FROM lineitem"
    for c in _A19_COLS
)
_A19_QS_SQL = ", ".join(f"({i + 1}, {q})" for i, q in enumerate(_A19_QS))


@register(
    "a19_approx_quantiles",
    # Self-verifying oracle shape (the a18 pattern): Spark's
    # Greenwald-Khanna sketch and DuckDB's exact quantile never agree
    # bit-level, so the Spark side checks its OWN sketch against the
    # exact ranks in-query and emits one boolean per (column,
    # quantile); the oracle pins the exact interpolated percentile,
    # the count, and the all-TRUE frame.
    oracle=f"""
    WITH cols AS (
      {_A19_COLS_SQL}),
    qs AS (SELECT * FROM (VALUES {_A19_QS_SQL}) AS t(i, quantil))
    SELECT c.coluna, q.quantil, c.n,
           round(c.ps[q.i], 6) AS p_exato, TRUE AS dentro
    FROM cols c, qs q
    """,
    tags=("A19", "PROFILE", "APPROX", "QUANTILE", "SCALE_DEFAULT"),
)
def a19_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantile profiling (Deequ's ``ApproxQuantile``
    analyzer): per profiled column, the Greenwald-Khanna sketch
    estimate at accuracy {acc} checked in-query against the EXACT
    rank of the returned value — ``dentro`` is TRUE when the
    estimate's rank lands within the documented n/accuracy rank-error
    band (+2 slack for boundary/interpolation), the repo's standard
    self-verifying shape for sketches the oracle engine cannot
    replicate bit-level (a18's HLL discipline applied to quantiles).

    At 100 TB the production call is the approx row ALONE: GK
    sketches are bounded-size, mergeable per partition, one scan for
    every (column, quantile) pair — exact percentiles would buffer
    whole columns per task, which is exactly what a profiler cannot
    afford on a fact table. The exact interpolated percentile and
    the rank-verification melt exist so the sketch's error contract
    is driver-hash-checked per fixture, not trusted from
    documentation. ``p_exato`` doubles as the cross-engine pin:
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` compute the
    same (n-1)·q linear interpolation."""
    li = load(spark, sf_dir, "lineitem")
    qs = list(_A19_QS)
    stack = ", ".join(f"'{c}', {c}" for c in _A19_COLS)
    linhas = li.select(
        F.expr(f"stack({len(_A19_COLS)}, {stack}) AS (coluna, valor)")
    ).filter(F.col("valor").isNotNull())
    per_col = linhas.groupBy("coluna").agg(
        F.percentile_approx("valor", qs, F.lit(_A19_ACC)).alias("vs"),
        F.expr(f"percentile(valor, array({', '.join(map(str, qs))}))").alias(
            "ps"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    alvo = per_col.select(
        "coluna",
        "n",
        F.posexplode(F.arrays_zip("vs", "ps")).alias("i", "par"),
    ).select(
        "coluna",
        "n",
        F.element_at(F.lit(qs), F.col("i") + 1).alias("quantil"),
        F.col("par.vs").alias("v_aprox"),
        F.round(F.col("par.ps"), 6).alias("p_exato"),
    )
    postos = (
        linhas.join(F.broadcast(alvo), "coluna")
        .groupBy("coluna", "quantil", "n", "p_exato", "v_aprox")
        .agg(
            F.sum((F.col("valor") <= F.col("v_aprox")).cast("long")).alias(
                "le"
            ),
            F.sum((F.col("valor") < F.col("v_aprox")).cast("long")).alias(
                "lt"
            ),
        )
    )
    tol = F.lit(2.0) + F.col("n") / F.lit(float(_A19_ACC))
    alvo_posto = F.col("quantil") * F.col("n")
    return postos.select(
        "coluna",
        "quantil",
        "n",
        "p_exato",
        (
            (F.col("le") >= alvo_posto - tol)
            & (F.col("lt") <= alvo_posto + tol)
        ).alias("dentro"),
    )


a19_approx_quantiles.__doc__ = a19_approx_quantiles.__doc__.format(
    acc=_A19_ACC
)


# -- J11: salted skew join as a catalog query -------------------------

_J11_SALTS = 16
_J11_DIM = (
    ("A", "devolvido"),
    ("N", "normal"),
    ("R", "reembolsado"),
)
_J11_DIM_SQL = ", ".join(f"('{k}', '{v}')" for k, v in _J11_DIM)


@register(
    "j11_salted_skew_join",
    oracle=f"""
    WITH dim AS (
      SELECT * FROM (VALUES {_J11_DIM_SQL}) AS t(l_returnflag, descricao))
    SELECT l.l_returnflag, d.descricao,
      CAST(count(*) AS BIGINT) AS n_itens,
      CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4))) AS DOUBLE) AS receita
    FROM lineitem l JOIN dim d USING (l_returnflag)
    GROUP BY l.l_returnflag, d.descricao
    """,
    tags=("J11", "SKEW", "SALT", "SCALE_DEFAULT"),
)
def j11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join via explicit salting
    (``operators/skew.salted_join``): the fact table joins a
    3-key dimension — the textbook pathological shuffle, where a
    plain hash join lands the ENTIRE fact table on 3 reducers — with
    the fact side salted {s} ways (deterministic ``pmod(hash(row),
    {s})``, no rand()) and the dim replicated once per salt, so each
    hot key spreads over {s} reducers and the join key becomes
    (key, salt). Result ≡ the plain join, which is the oracle.

    The dim side carries a SHUFFLE_HASH hint: the demo must exercise
    the shuffle path the salt exists for (a broadcast would hide the
    skew AND the fix; at real scale this dim is a large
    non-broadcastable enrichment table whose key histogram is
    skewed). The aggregation after the join needs no manual
    second level: Spark's partial hash aggregation over the salted
    partitions IS the two-stage rollup, and the money sum is
    decimal-exact so reducer order can't leak in.

    When to salt instead of trusting AQE: the skew is known ahead of
    time (key histogram from profiling — `a16`'s job), the join feeds
    a window AQE can't split, or the plan must be stable across runs
    (AQE re-plans per execution). ref: the reference hand-chunks its
    hot UF×year extracts for the same reason
    (agrobr/comexstat/api.py chunked fetch loop)."""
    from agrobr_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    dim = spark.createDataFrame(
        list(_J11_DIM), "l_returnflag string, descricao string"
    ).hint("shuffle_hash")
    j = salted_join(li, dim, ["l_returnflag"], salt=_J11_SALTS)
    return j.groupBy("l_returnflag", "descricao").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_itens"),
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "receita"),
    )


j11_salted_skew_join.__doc__ = j11_salted_skew_join.__doc__.format(
    s=_J11_SALTS
)

# -- A20: join-key skew advisor ---------------------------------------

_A20_COLS = ("l_returnflag", "l_linestatus", "l_suppkey", "l_partkey")
_A20_PARTS = 32  # reducer count the advice is sized for
_A20_UNION_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS coluna, CAST({c} AS VARCHAR) AS chave FROM lineitem"
    for c in _A20_COLS
)


@register(
    "a20_skew_advisor",
    oracle=f"""
    WITH chaves AS (
      SELECT coluna, chave, count(*) AS n_chave
      FROM ({_A20_UNION_SQL}) GROUP BY coluna, chave),
    stats AS (
      SELECT coluna,
        CAST(sum(n_chave) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS n_chaves,
        CAST(max(n_chave) AS BIGINT) AS max_n
      FROM chaves GROUP BY coluna)
    SELECT coluna, n, n_chaves, max_n,
      round(CAST(max_n AS DOUBLE) / CAST(n AS DOUBLE), 6) AS parcela_max,
      round(CAST(max_n AS DOUBLE) * CAST(n_chaves AS DOUBLE)
            / CAST(n AS DOUBLE), 4) AS fator_skew,
      CAST(CASE WHEN max_n * {_A20_PARTS} <= n THEN 1
           ELSE least({_A20_PARTS},
                      CAST(ceil(CAST(max_n AS DOUBLE) * {_A20_PARTS}.0
                                / CAST(n AS DOUBLE)) AS BIGINT)) END
           AS INT) AS salt_recomendado
    FROM stats
    """,
    tags=("A20", "PROFILE", "SKEW", "SCALE_DEFAULT"),
)
def a20_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: per candidate key column, the key-count
    histogram statistics a planner needs to CHOOSE a salt width ahead
    of time — total rows, distinct keys, the hottest key's row count,
    its share of the table, the skew factor (hottest / mean key), and
    the recommended salt: 1 when no key exceeds an even 1/{p} reducer
    share, else ceil(hottest-key share x {p}) capped at {p} — exactly
    the number of reducers the hot key must spread over so no reducer
    holds more than an even share. This is the measurement half of
    `j11_salted_skew_join` (which applies the salt) and the join-key
    companion of `a16`'s value histograms: AQE fixes skew reactively
    at runtime, but a pipeline that runs daily wants the skew known
    and the plan stable, the way the reference hand-chunks its hot
    UF x year extracts (agrobr/comexstat/api.py chunked fetch loop).

    Scale: one stack pass over the fact table (each row emits
    {k} (column, key) pairs), partial-aggregated map-side into
    per-(column, key) counts — the shuffle carries one row per
    DISTINCT key, not per input row — then a {k}-group rollup. All
    ratios are exact-integer-derived doubles (< 2^53), so the advice
    is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    stack = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in _A20_COLS)
    chaves = li.select(
        F.expr(f"stack({len(_A20_COLS)}, {stack}) AS (coluna, chave)")
    )
    stats = (
        chaves.groupBy("coluna", "chave")
        .agg(F.count(F.lit(1)).alias("n_chave"))
        .groupBy("coluna")
        .agg(
            F.sum("n_chave").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_chaves"),
            F.max("n_chave").cast("bigint").alias("max_n"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return stats.select(
        "coluna",
        "n",
        "n_chaves",
        "max_n",
        F.round(d("max_n") / d("n"), 6).alias("parcela_max"),
        F.round(d("max_n") * d("n_chaves") / d("n"), 4).alias("fator_skew"),
        F.when(F.col("max_n") * _A20_PARTS <= F.col("n"), F.lit(1))
        .otherwise(
            F.least(
                F.lit(_A20_PARTS),
                F.ceil(
                    d("max_n") * F.lit(float(_A20_PARTS)) / d("n")
                ).cast("int"),
            )
        )
        .cast("int")
        .alias("salt_recomendado"),
    )


a20_skew_advisor.__doc__ = a20_skew_advisor.__doc__.format(
    p=_A20_PARTS, k=len(_A20_COLS)
)

# -- A21: PIVOT (status columns from rows) -----------------------------

_A21_STATUS = ("F", "O", "P")


@register(
    "a21_pivot",
    oracle=f"""
    SELECT o_orderpriority,
      {", ".join(
        f"round(CAST(coalesce(sum(CASE WHEN o_orderstatus = '{s}' "
        f"THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE), 2) "
        f"AS total_{s.lower()}"
        for s in _A21_STATUS)}
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("A21", "PIVOT", "AGG"),
)
def a21_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — order-status rows turned into columns: total order
    value per priority x status as a wide frame (the spreadsheet/
    dashboard layout, dual of `a12_unpivot`). The status domain is
    pinned ({vals}) so the output schema is static — the form that
    scales, because a values-discovering pivot needs an extra
    distinct-scan and produces a data-dependent schema no downstream
    plan can bind to.

    Plan: emitted DIRECTLY as one conditional aggregate per pinned
    value — a single hash aggregate with map-side partials and ONE
    shuffle on the groupBy key (plan-tested). DataFrame `.pivot(col,
    values)` is deliberately NOT used: it compiles to a two-stage
    `pivotfirst` plan with a second (key, status) pre-aggregation and
    a second Exchange — measured two shuffles where the CASE form
    needs one, which at 100 TB doubles the shuffle cost for zero
    semantic gain. Money sums aggregate in DECIMAL(18,2) (order-free)
    and only the final cell casts to double; empty cells pin 0, not
    NULL, in both engines."""
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            *[
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == s,
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                ).alias(f"_{s}")
                for s in _A21_STATUS
            ]
        )
    )
    return agg.select(
        "o_orderpriority",
        *[
            F.coalesce(F.round(F.col(f"_{s}").cast("double"), 2), F.lit(0.0))
            .alias(f"total_{s.lower()}")
            for s in _A21_STATUS
        ],
    )


a21_pivot.__doc__ = a21_pivot.__doc__.format(vals=", ".join(_A21_STATUS))

# -- A22: join-size advisor (exact pre-join cardinality) ---------------

_A22_SPECS = (
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


def _a22_spec_sql(nome, tl, kl, tr, kr):
    return f"""
    SELECT '{nome}' AS juncao,
      CAST(sum(coalesce(na, 0)) AS BIGINT) AS n_esq,
      CAST(sum(coalesce(nb, 0)) AS BIGINT) AS n_dir,
      CAST(count(CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                 THEN 1 END) AS BIGINT) AS chaves_comuns,
      CAST(coalesce(sum(CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                        THEN na * nb END), 0) AS BIGINT)
        AS cardinalidade_prevista,
      round(CAST(coalesce(sum(CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                           THEN na * nb END), 0) AS DOUBLE)
            / CAST(sum(coalesce(na, 0)) AS DOUBLE), 6) AS amplificacao
    FROM (SELECT {kl} AS k, CAST(count(*) AS BIGINT) AS na
          FROM {tl} GROUP BY 1) a
    FULL JOIN (SELECT {kr} AS k, CAST(count(*) AS BIGINT) AS nb
               FROM {tr} GROUP BY 1) b USING (k)"""


@register(
    "a22_join_size_advisor",
    oracle=" UNION ALL ".join(_a22_spec_sql(*s) for s in _A22_SPECS),
    tags=("A22", "PROFILE", "JOIN", "PLANNING", "SCALE_DEFAULT"),
)
def a22_join_size_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size advisor — the EXACT pre-join cardinality a planner
    wants before committing to a strategy: for each canonical
    fact<-dim join, |A JOIN B| = sum over shared keys of
    count_A(k) x count_B(k), plus both side totals, the shared-key
    count, and the output-amplification factor (predicted rows per
    left row). Together with `a20_skew_advisor` (per-key histogram ->
    salt width) this is the measurement pair behind every join
    strategy choice in the catalog: amplification ~1 -> plain
    shuffle/broadcast; amplification >> 1 -> the pair-explosion the
    n-gram/interval operators bucket around.

    Plan: per join, each side collapses to ONE row per distinct key
    (map-side partial counts) BEFORE the key-frame full-outer join —
    the shuffle carries key cardinality, never input rows, and the
    product-sum is exact integer arithmetic (the a20 shuffle
    discipline applied to pairs). Never executes the join it sizes.
    At 100 TB: key-count frames are tiny next to their tables,
    and a sampled variant is one TABLESAMPLE away with the same
    plan shape — the exact form is kept because it doubles as the
    planted-fixture ground truth."""
    frames = []
    for nome, tl, kl, tr, kr in _A22_SPECS:
        a = (
            load(spark, sf_dir, tl)
            .groupBy(F.col(kl).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("na"))
        )
        b = (
            load(spark, sf_dir, tr)
            .groupBy(F.col(kr).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
        )
        ambos = F.col("na").isNotNull() & F.col("nb").isNotNull()
        prev = F.coalesce(
            F.sum(F.when(ambos, F.col("na") * F.col("nb"))), F.lit(0)
        ).cast("bigint")
        frames.append(
            a.join(b, "k", "full")
            .agg(
                F.sum(F.coalesce("na", F.lit(0)))
                .cast("bigint")
                .alias("n_esq"),
                F.sum(F.coalesce("nb", F.lit(0)))
                .cast("bigint")
                .alias("n_dir"),
                F.count(F.when(ambos, F.lit(1)))
                .cast("bigint")
                .alias("chaves_comuns"),
                prev.alias("cardinalidade_prevista"),
                F.round(
                    prev.cast("double")
                    / F.sum(F.coalesce("na", F.lit(0))).cast("double"),
                    6,
                ).alias("amplificacao"),
            )
            .select(F.lit(nome).alias("juncao"), "*")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out

# -- TPC-H classics: the canonical multi-join analytics shapes ----------

_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1997-06-30"
_Q3_TOPK = 10


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
           AS DECIMAL(18,4))) AS DOUBLE) AS receita,
      CAST(o_orderdate AS DATE) AS data_pedido
    FROM customer, orders, lineitem
    WHERE c_mktsegment = '{_Q3_SEGMENT}'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
      AND l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
    GROUP BY l_orderkey, data_pedido
    ORDER BY receita DESC, l_orderkey LIMIT {_Q3_TOPK}
    """,
    tags=("TPCH", "Q3", "JOIN", "AGG", "SCALE_DEFAULT"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping-priority) on the fixture schema: top-{k}
    unshipped-revenue orders for one market segment — the canonical
    selective-filter -> fact-join -> aggregate -> top-k shape every
    BI workload reduces to, kept verbatim so the engine's plan for
    THE reference query is inspectable (the fixture lacks
    o_shippriority, which is dropped from the projection; dates are
    timestamps and compare as such, the io-layer convention).

    Plan: both filters push to their scans (segment on customer, the
    two date bounds on orders/lineitem); the filtered customer side
    broadcasts into orders, that result broadcasts into lineitem
    when small enough (AQE decides from runtime sizes), the
    aggregation is partial+final on the composite key, and the final
    cut is a TakeOrderedAndProject heap — never a global sort.
    Revenue is the house money discipline: per-row double product
    cast to DECIMAL(18,4) before the sum, exact in any order."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEGMENT
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _Q3_DATE
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _Q3_DATE
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("data_pedido"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,4)")
            )
            .cast("double")
            .alias("receita")
        )
        .select("l_orderkey", "receita", "data_pedido")
        .orderBy(F.desc("receita"), F.asc("l_orderkey"))
        .limit(_Q3_TOPK)
    )


tpch_q3.__doc__ = tpch_q3.__doc__.format(k=_Q3_TOPK)

_Q5_REGION = "ASIA"
_Q5_YEAR = 1996


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
           AS DECIMAL(18,4))) AS DOUBLE) AS receita
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = '{_Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{_Q5_YEAR}-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '{_Q5_YEAR + 1}-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("TPCH", "Q5", "JOIN", "AGG", "SCALE_DEFAULT"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): revenue per nation for one
    region and one order year, where customer and supplier share the
    nation — the 6-table join with a NON-key equi-condition
    (c_nationkey = s_nationkey) that makes Q5 the classic join-order
    stress test: a bad order explodes lineitem x supplier before the
    region filter ever bites.

    Plan: region -> nation is a 2-hop broadcast chain that prunes
    nations FIRST; customer and supplier both shrink by joining the
    pruned nation list before touching facts; orders carries the
    pushed year bounds; the c_nationkey = s_nationkey condition rides
    the existing join keys instead of a separate shuffle. Catalyst +
    AQE reorder from runtime sizes — the declared plan keeps every
    reduction upstream of the fact join, which is the property the
    docstring exists to pin. Money in DECIMAL(18,4), as always."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"))),
        "c_nationkey",
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= f"{_Q5_YEAR}-01-01")
        & (F.col("o_orderdate") < f"{_Q5_YEAR + 1}-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (F.col("c_nationkey") == s["s_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,4)")
            )
            .cast("double")
            .alias("receita")
        )
    )


_Q17_BRAND = "Brand#4"
_Q17_SIZE = 25

_Q17_SQL = """
    SELECT
      CAST(count(*) AS BIGINT) AS n_itens,
      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / 7.0, 4) AS media_anual
    FROM {li} l, {pt} p
    WHERE p.p_partkey = l.l_partkey
      AND p.p_brand = '{brand}' AND p.p_size <= {size}
      AND l.l_quantity < (
        SELECT CAST(0.2 AS DOUBLE)
               * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE))
        FROM {li} l2 WHERE l2.l_partkey = p.p_partkey)
"""


@register(
    "tpch_q17",
    oracle=_Q17_SQL.format(
        li="lineitem", pt="part", brand=_Q17_BRAND, size=_Q17_SIZE
    ),
    tags=("TPCH", "Q17", "SUBQUERY", "DECORRELATION", "SCALE_DEFAULT"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) on the fixture schema:
    yearly revenue lost if below-20-percent-of-average-quantity orders of one
    brand stopped — THE canonical CORRELATED SCALAR SUBQUERY (the
    per-part average the outer row compares against), submitted to
    Spark AS the correlated form (r9 VERDICT next #6: the fixture
    lacks p_container, so the brand predicate carries a p_size bound
    instead; n_itens is emitted alongside so the hash pins the
    surviving row set, not just the final division).

    The point is the PLAN: Catalyst's RewriteCorrelatedScalarSubquery
    must decorrelate the per-row subquery into ONE aggregate over
    lineitem grouped by l_partkey joined back on the key — at 100 TB
    the difference between a second scan of lineitem and |outer| × a
    rescan of lineitem. tests/test_plans.py pins that shape: exactly
    two lineitem scans (outer + decorrelated aggregate), zero
    subquery nodes in the physical plan, and the partkey aggregate
    feeding a join, never a per-row loop.

    Determinism: the per-part average is the house quotient rule
    (DECIMAL(18,4) sum cast to double over an exact count — both
    operands bit-identical, quotient bit-identical), the 0.2 factor is
    CAST AS DOUBLE in both engines (decimal-literal semantics differ),
    the strict < then decides identically, and the revenue sum is
    DECIMAL-aggregated before the final rounded division."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("tq17_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("tq17_part")
    return spark.sql(
        _Q17_SQL.format(
            li="tq17_lineitem",
            pt="tq17_part",
            brand=_Q17_BRAND,
            size=_Q17_SIZE,
        )
    )


_Q20_NAME_PREFIX = "red"
_Q20_NATIONS = ("NATION_7", "NATION_8", "NATION_9")
_Q20_YEAR = 1995

_Q20_SQL = """
    SELECT s_name
    FROM {su} s, {na} n
    WHERE s.s_suppkey IN (
        SELECT ps_suppkey FROM (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,4))) AS ps_availqty
          FROM {li} GROUP BY l_partkey, l_suppkey
        ) ps
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM {pt}
            WHERE p_name LIKE '{prefix}%')
          AND CAST(2 AS DECIMAL(18,4)) * ps.ps_availqty > (
            SELECT CAST(3 AS DECIMAL(18,4))
                   * SUM(CAST(l2.l_quantity AS DECIMAL(18,4)))
            FROM {li} l2
            WHERE l2.l_partkey = ps.ps_partkey
              AND l2.l_suppkey = ps.ps_suppkey
              AND l2.l_shipdate >= TIMESTAMP '{year}-01-01 00:00:00'
              AND l2.l_shipdate < TIMESTAMP '{year_next}-01-01 00:00:00'))
      AND s.s_nationkey = n.n_nationkey
      AND n.n_name IN ({nations})
    ORDER BY s_name
"""


def _q20_sql(li: str, pt: str, su: str, na: str) -> str:
    return _Q20_SQL.format(
        li=li, pt=pt, su=su, na=na,
        prefix=_Q20_NAME_PREFIX,
        year=_Q20_YEAR, year_next=_Q20_YEAR + 1,
        nations=", ".join(f"'{x}'" for x in _Q20_NATIONS),
    )


@register(
    "tpch_q20",
    oracle=_q20_sql("lineitem", "part", "supplier", "nation"),
    tags=("TPCH", "Q20", "SUBQUERY", "SEMI_JOIN", "SCALE_DEFAULT"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential-part-promotion) on the fixture schema:
    suppliers in a nation set whose supplied '{prefix}%' parts have
    all-time shipped volume exceeding 1.5x their {year} shipped
    volume — THE canonical nested-IN / correlated-EXISTS chain
    (reference runs the published form over DuckDB; the fixture has
    no partsupp or s_address, so supply pairs derive from distinct
    lineitem (l_partkey, l_suppkey) with summed quantity standing in
    for ps_availqty, and the 0.5 factor becomes 1.5 so the predicate
    stays selective on this data).

    Q17 proved Catalyst's scalar-subquery decorrelation; Q20 is the
    OTHER decorrelation shape a 100x engine must get right: two
    nested INs plus a correlated scalar, submitted verbatim as SQL.
    Catalyst must turn the outer IN into a LEFT-SEMI join on
    s_suppkey (never a per-supplier rescan), the inner part IN into a
    left-semi/broadcast join on ps_partkey, and the correlated
    window-volume subquery into ONE grouped aggregate over the
    date-pruned lineitem scan joined back on the pair key — at 100 TB
    the difference between three passes over lineitem and
    |supplier| x rescans. tests/test_plans.py pins the shape (zero
    Subquery nodes, a left-semi on the supplier side, StartsWith
    pushed to the part scan).

    Determinism: no floats anywhere — both comparison sides are exact
    DECIMAL(18,4)-sum lineage multiplied by integer literals (avail >
    1.5 x win rewritten as 2 x avail > 3 x win, exact in decimal), so
    the strict > decides identically in Spark and DuckDB; an empty
    {year} window yields SUM = NULL and the comparison is UNKNOWN ->
    row excluded, the same three-valued outcome in both engines."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("tq20_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("tq20_part")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("tq20_supplier")
    load(spark, sf_dir, "nation").createOrReplaceTempView("tq20_nation")
    return spark.sql(
        _q20_sql("tq20_lineitem", "tq20_part", "tq20_supplier",
                 "tq20_nation")
    )


tpch_q20.__doc__ = tpch_q20.__doc__.format(
    prefix=_Q20_NAME_PREFIX, year=_Q20_YEAR
)


_Q2_SIZE = 15
_Q2_TYPE = "STANDARD"
_Q2_REGION = "ASIA"
_Q2_TOPK = 100

_Q2_SQL = """
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS ps_supplycost
      FROM {li} GROUP BY l_partkey, l_suppkey)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           ps.ps_supplycost AS custo_min
    FROM {pt} p, {su} s, ps, {na} n, {re} r
    WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
      AND p.p_size <= {size} AND p.p_type = '{ptype}'
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey AND r.r_name = '{region}'
      AND ps.ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM ps ps2, {su} s2, {na} n2, {re} r2
        WHERE p.p_partkey = ps2.ps_partkey
          AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = '{region}')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT {k}
"""


def _q2_sql(li: str, pt: str, su: str, na: str, re_: str) -> str:
    return _Q2_SQL.format(
        li=li, pt=pt, su=su, na=na, re=re_,
        size=_Q2_SIZE, ptype=_Q2_TYPE, region=_Q2_REGION, k=_Q2_TOPK,
    )


@register(
    "tpch_q2",
    oracle=_q2_sql("lineitem", "part", "supplier", "nation", "region"),
    tags=("TPCH", "Q2", "SUBQUERY", "DECORRELATION", "SCALE_DEFAULT"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) on the fixture schema: for
    each qualifying part, the region's suppliers that hit the
    region-wide MINIMUM supply cost — THE canonical correlated
    AGGREGATE-EQUALITY subquery (reference runs the published form
    over DuckDB; the fixture has no partsupp, so supply pairs derive
    from distinct lineitem (l_partkey, l_suppkey) with the cheapest
    observed unit price standing in for ps_supplycost — the same
    derivation tpch_q20 established).

    Q17 proved scalar-AVG decorrelation and Q20 the nested-IN chain;
    Q2 is the third shape: a correlated MIN that must become ONE
    part-keyed aggregate over the region-pruned supply pairs joined
    back on (partkey, cost-equality) — never a per-part rescan of the
    pair table. The region restriction applies INSIDE the subquery,
    so Catalyst has to keep the nation->region broadcast prune on
    both legs. tests/test_plans.py pins: zero surviving Subquery
    nodes, a min-aggregate keyed on ps_partkey, both part filters
    pushed to the part scan, no Cartesian product.

    Determinism: ps_supplycost is MIN over the raw IEEE double
    quotient — division of bit-identical parquet doubles is
    bit-identical in both engines, MIN is order-free, and the
    equality join decides identically; no decimal rounding step
    exists to diverge (a DECIMAL(18,4) cast here DID diverge on a
    half-way value, 374.95375 — doubles need no rounding, so money
    discipline applies to SUMS, not to MIN/equality lineage). The top-{k} cut
    carries the full (acctbal, nation, name, partkey) tie-break chain
    so the heap is total-ordered."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("tq2_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("tq2_part")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("tq2_supplier")
    load(spark, sf_dir, "nation").createOrReplaceTempView("tq2_nation")
    load(spark, sf_dir, "region").createOrReplaceTempView("tq2_region")
    return spark.sql(
        _q2_sql("tq2_lineitem", "tq2_part", "tq2_supplier", "tq2_nation",
                "tq2_region")
    )


tpch_q2.__doc__ = tpch_q2.__doc__.format(k=_Q2_TOPK)

_Q18_MIN_QTY = 250
_Q18_TOPK = 100

_Q18_SQL = """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS data_pedido, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS qtd_total
    FROM {cu} c, {od} o, {li} l
    WHERE o.o_orderkey IN (
        SELECT l2.l_orderkey FROM {li} l2
        GROUP BY l2.l_orderkey
        HAVING SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) > {minqty})
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, data_pedido,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT {k}
"""


def _q18_sql(cu: str, od: str, li: str) -> str:
    return _Q18_SQL.format(cu=cu, od=od, li=li,
                           minqty=_Q18_MIN_QTY, k=_Q18_TOPK)


@register(
    "tpch_q18",
    oracle=_q18_sql("customer", "orders", "lineitem"),
    tags=("TPCH", "Q18", "SUBQUERY", "SEMI_JOIN", "SCALE_DEFAULT"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total line
    quantity exceeds {minqty}, with their customer and the quantity —
    the canonical IN-over-GROUP-BY-HAVING shape (reference runs the
    published form over DuckDB; the fixture schema carries every
    column Q18 needs, so only the threshold is re-tuned to this
    data's p99).

    The decorrelation lesson here is distinct from Q17/Q20/Q2: the IN
    subquery is UNCORRELATED but aggregated, so Catalyst must plan it
    as a standalone orderkey-keyed partial+final aggregate feeding a
    LEFT-SEMI join against orders — the filter applies BEFORE the
    customer join, so at 100 TB the expensive fact x dim join only
    sees the ~1-in-50 qualifying orders. A naive plan that joins
    first and filters later does 50x the join work.
    tests/test_plans.py pins: zero Subquery nodes, a LeftSemi, a
    HAVING-side sum keyed on l_orderkey, no Cartesian product.

    Determinism: both quantity sums (HAVING gate and emitted total)
    are DECIMAL(18,4)-exact in any accumulation order; the strict >
    decides identically in both engines; the top-{k} cut is
    total-ordered by the (totalprice, orderkey) tie-break."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("tq18_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("tq18_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("tq18_lineitem")
    return spark.sql(
        _q18_sql("tq18_customer", "tq18_orders", "tq18_lineitem")
    )


tpch_q18.__doc__ = tpch_q18.__doc__.format(
    minqty=_Q18_MIN_QTY, k=_Q18_TOPK
)

_Q21_LATE_DAYS = 365
_Q21_NATIONS = ("NATION_3", "NATION_4", "NATION_5")
_Q21_TOPK = 100

_Q21_SQL = """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_esperas
    FROM {su} s, {li} l1, {od} o, {na} n
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL {late} DAY
      AND EXISTS (
        SELECT 1 FROM {li} l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM {li} l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL {late} DAY)
      AND s.s_nationkey = n.n_nationkey
      AND n.n_name IN ({nations})
    GROUP BY s.s_name
    ORDER BY n_esperas DESC, s.s_name
    LIMIT {k}
"""


def _q21_sql(su: str, li: str, od: str, na: str) -> str:
    return _Q21_SQL.format(
        su=su, li=li, od=od, na=na,
        late=_Q21_LATE_DAYS, k=_Q21_TOPK,
        nations=", ".join(f"'{x}'" for x in _Q21_NATIONS),
    )


@register(
    "tpch_q21",
    oracle=_q21_sql("supplier", "lineitem", "orders", "nation"),
    tags=("TPCH", "Q21", "SUBQUERY", "ANTI_JOIN", "SCALE_DEFAULT"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for finished
    orders, suppliers in a nation set who were the ONLY late supplier
    on a multi-supplier order — THE canonical EXISTS + NOT-EXISTS
    pair over self-joined lineitem (reference runs the published form
    over DuckDB; the fixture lacks l_commitdate/l_receiptdate, so
    "late" is shipped more than {late} days after the order date —
    the o_orderdate correlation even strengthens the test, because
    the anti-join condition now references TWO outer tables).

    This is the hardest decorrelation shape in the TPC-H suite: the
    EXISTS must become a LEFT-SEMI self-join on l_orderkey with the
    <> supplier disequality riding the join condition, and the
    NOT EXISTS a LEFT-ANTI with BOTH the disequality and the
    late-shipment inequality attached — three lineitem scans total,
    zero per-row rescans. At 100 TB a surviving correlated NOT EXISTS
    is |lineitem| rescans of lineitem. tests/test_plans.py pins: zero
    Subquery nodes, >=1 LeftSemi and >=1 LeftAnti, exactly three
    lineitem scans, the 'F' status pushed to the orders scan.

    Determinism: the late predicate compares two timestamps (interval
    arithmetic is exact), counts are integers, and the top-{k} heap
    is total-ordered by (n_esperas DESC, s_name)."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("tq21_supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("tq21_lineitem")
    load(spark, sf_dir, "orders").createOrReplaceTempView("tq21_orders")
    load(spark, sf_dir, "nation").createOrReplaceTempView("tq21_nation")
    return spark.sql(
        _q21_sql("tq21_supplier", "tq21_lineitem", "tq21_orders",
                 "tq21_nation")
    )


tpch_q21.__doc__ = tpch_q21.__doc__.format(
    late=_Q21_LATE_DAYS, k=_Q21_TOPK
)

_Q22_SEGMENTS = ("BUILDING", "AUTOMOBILE", "MACHINERY")
_Q22_RECENT = "2000-01-01"

_Q22_SQL = """
    SELECT c.c_mktsegment AS segmento,
           CAST(count(*) AS BIGINT) AS n_clientes,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS saldo_total
    FROM {cu} c
    WHERE c.c_mktsegment IN ({segments})
      AND c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)
        FROM {cu} c2
        WHERE c2.c_acctbal > 0.0
          AND c2.c_mktsegment IN ({segments}))
      AND NOT EXISTS (
        SELECT 1 FROM {od} o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{recent} 00:00:00')
    GROUP BY c.c_mktsegment
    ORDER BY segmento
"""


def _q22_sql(cu: str, od: str) -> str:
    return _Q22_SQL.format(
        cu=cu, od=od, recent=_Q22_RECENT,
        segments=", ".join(f"'{x}'" for x in _Q22_SEGMENTS),
    )


@register(
    "tpch_q22",
    oracle=_q22_sql("customer", "orders"),
    tags=("TPCH", "Q22", "SUBQUERY", "ANTI_JOIN", "SCALE_DEFAULT"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): per market segment, the
    count and total balance of above-average-balance customers with
    no RECENT orders — the uncorrelated-scalar + correlated-NOT-EXISTS
    pair (reference runs the published form over DuckDB; the fixture
    has no c_phone, so the country-code prefix becomes the segment
    list, and — because every fixture customer has SOME order — the
    dormancy predicate is "no order since {recent}", which preserves
    the anti-join shape while keeping the result non-trivial).

    Two distinct subquery disciplines in one plan: the average-balance
    scalar is UNCORRELATED, so it must execute EXACTLY ONCE (a
    one-row broadcast reused across every outer row — never
    re-evaluated per row), while the NOT EXISTS decorrelates into a
    LEFT-ANTI join on c_custkey against the date-pruned orders scan.
    tests/test_plans.py pins: a LeftAnti, the date filter pushed to
    the orders scan, the segment IN pushed to both customer scans,
    and no Cartesian product. At 100 TB the anti side reads only the
    recent slice of orders, not the full history.

    Determinism: the average is the house quotient (DECIMAL-exact sum
    cast to double over an exact count); the strict > decides
    identically; saldo_total is DECIMAL-summed then surfaced as
    double; segment grouping is exact-string."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("tq22_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("tq22_orders")
    return spark.sql(_q22_sql("tq22_customer", "tq22_orders"))


tpch_q22.__doc__ = tpch_q22.__doc__.format(recent=_Q22_RECENT)
