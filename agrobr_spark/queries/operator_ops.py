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


_MM_HEXVAL = "(strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1)"


def _mm_byte(i: int) -> str:
    """SQL for byte ``i`` of the sha256 digest from its hex string."""
    return (
        f"({_MM_HEXVAL.format(p=2 * i + 1)} * 16 + {_MM_HEXVAL.format(p=2 * i + 2)})"
    )


@register(
    "mm_decode_features",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
        CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        text FROM documents),
    h AS (
      -- this DuckDB's sha256 takes VARCHAR (hashes its UTF-8 bytes —
      -- exactly the Spark side's encode(text,'utf-8') payload)
      SELECT media_id, kind,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        sha256(text) AS hx
      FROM media)
    SELECT media_id, kind, n_bytes,
      substr(hx, 1, 16) AS sha16,
      CASE WHEN kind IN ('image', 'video')
           THEN CAST(64 + {_mm_byte(0)} % 192 AS INT) END AS width,
      CASE WHEN kind IN ('image', 'video')
           THEN CAST(64 + {_mm_byte(1)} % 192 AS INT) END AS height,
      CASE WHEN kind IN ('audio', 'video')
           THEN {_mm_byte(2)} / 16.0 END AS duration_s,
      to_json([{", ".join(f"{_mm_byte(i)} - 128" for i in range(8))}]) AS feature_q8
    FROM h
    """,
    tags=("MULTIMODAL", "UDF"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode/feature pipeline over binary
    media (decode stubbed deterministically; plumbing real).

    The catalog entry re-quantizes `feature array<float>` back to its
    int8 lattice (values are k/128 by construction) and serializes as
    JSON ints — an exact, engine-neutral canonical form, so the driver
    hash-checks the full pipeline against pure SQL over sha256 hex
    arithmetic (closing the round-2 `no_oracle` gap; the library API
    `operators.multimodal.decode_features` keeps the real float array).
    """
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
    return decode_features(media).select(
        "media_id",
        "kind",
        "n_bytes",
        "sha16",
        "width",
        "height",
        "duration_s",
        F.to_json(
            F.transform("feature", lambda x: F.round(x * 128).cast("int"))
        ).alias("feature_q8"),
    )


@register(
    "w6_topk_per_group",
    oracle="""
    SELECT event_type, event_id, ts, value FROM (
      SELECT event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events WHERE value IS NOT NULL) t
    WHERE rn <= 5
    """,
    tags=("W4", "TOPK"),
)
def w6_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (generalizes W4's top-1 latest-per-key): the
    canonical rank-window + filter. One shuffle on the group key; the
    window never materializes more than a partition's rows, and with
    K≪group size Spark applies rank-limit pushdown
    (WindowGroupLimit) before the sort."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        e.filter(F.col("value").isNotNull())
        .select(
            "event_type", "event_id", "ts", "value",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "w7_sessionize",
    oracle="""
    -- All timestamp math in epoch MICROSECONDS (BIGINT) on both sides:
    -- events.ts is parquet TIMESTAMP(NANOS); Spark reads nanos-as-long
    -- and floors to micros, while DuckDB keeps ns — raw ts outputs can
    -- never hash-match (round-1 red). epoch_ns(ts) // 1000 == Spark's
    -- `ts div 1000`, and the session windows/ordering then agree exactly.
    WITH base AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
    marcado AS (
      SELECT user_id, us, event_id,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id)
                       > 1800000000
                  OR lag(us) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) IS NULL
                  THEN 1 ELSE 0 END AS nova_sessao
      FROM base),
    sessoes AS (
      SELECT user_id, us, event_id,
             sum(nova_sessao) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sessao_n
      FROM marcado)
    SELECT user_id, CAST(sessao_n AS BIGINT) AS sessao_n,
           count(*) AS eventos,
           CAST(min(us) AS BIGINT) AS inicio_us,
           CAST(max(us) AS BIGINT) AS fim_us
    FROM sessoes
    GROUP BY user_id, sessao_n
    """,
    tags=("SESSION", "W1"),
)
def w7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (training-pipeline extension): lag-gap > 30 min
    starts a new session; running sum numbers sessions; one aggregate
    per (user, session). Both windows and the groupBy share the same
    user_id hash partitioning — Catalyst plans ONE shuffle for all
    three. Streaming twin: session_window(ts, gap) in
    streaming/windows.py."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(wo)
    nova = (
        prev.isNull() | (F.col("us") - prev > 1_800_000_000)
    ).cast("int")
    return (
        e.select("user_id", "us", "event_id", nova.alias("nova_sessao"))
        .withColumn(
            "sessao_n",
            F.sum("nova_sessao").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sessao_n")
        .agg(
            F.count(F.lit(1)).alias("eventos"),
            F.min("us").alias("inicio_us"),
            F.max("us").alias("fim_us"),
        )
    )


@register(
    "j8_range_join",
    oracle="""
    WITH intervalos AS (
      SELECT o_orderkey,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS ini,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) + 7 AS fim
      FROM orders
      WHERE CAST(o_orderdate AS DATE)
            BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'),
    pontos AS (
      SELECT l_orderkey, l_linenumber,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(l_shipdate AS DATE)) AS BIGINT) AS dia,
             l_quantity
      FROM lineitem)
    SELECT i.o_orderkey,
           count(*) AS embarques,
           CAST(sum(CAST(p.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qtd
    FROM pontos p JOIN intervalos i
      ON p.dia >= i.ini AND p.dia < i.fim
    GROUP BY i.o_orderkey
    """,
    tags=("RANGEJOIN", "J7"),
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucketization (operators/range_join.py): every
    shipment in the 7-day window after each March-1995 order date.
    The bucket equi-join replaces the O(n·m) interval nested loop with
    one linear hash shuffle; the residual predicate keeps exactness."""
    from agrobr_spark.operators.range_join import range_join

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    pontos = li.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("dia"),
        "l_quantity",
    )
    ini = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
    )
    intervalos = o.filter(
        F.col("o_orderdate").cast("date").between("1995-03-01", "1995-03-31")
    ).select("o_orderkey", ini.alias("ini"), (ini + 7).alias("fim"))
    pares = range_join(pontos, intervalos, "dia", "ini", "fim", bucket_width=7)
    return pares.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("embarques"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qtd"),
    )


@register(
    "a11_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'TOTAL') AS flag,
           coalesce(l_linestatus, 'TOTAL') AS status,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qtd
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("A1", "ROLLUP"),
)
def a11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup totals (beyond the reference, free in both
    engines): ROLLUP(flag, status) — detail rows + per-flag subtotals +
    grand total in one partial-aggregated pass, no self-union."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("qtd"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("TOTAL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("TOTAL")).alias("status"),
            "n",
            "qtd",
        )
    )


@register(
    "a12_unpivot",
    oracle="""
    SELECT c_custkey, medida, valor FROM (
      SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE) AS saldo,
             CAST(c_nationkey AS DOUBLE) AS nacao
      FROM customer) t
    UNPIVOT (valor FOR medida IN (saldo, nacao))
    """,
    tags=("A6", "UNPIVOT"),
)
def a12_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt wide→long (inverse of A6's pivot; the reference
    melts wide CONAB safra blocks the same way): stack() — a
    generator projection, zero shuffles."""
    c = load(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'saldo', CAST(c_acctbal AS DOUBLE),"
        " 'nacao', CAST(c_nationkey AS DOUBLE)) AS (medida, valor)",
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
        CASE CAST(doc_id % 3 AS INT)
          WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        text FROM documents),
    h AS (
      SELECT media_id, sha256(text) AS hx
      FROM media WHERE kind = 'video'),
    dur AS (
      SELECT media_id, {_mm_byte(2)} / 16.0 AS duration_s FROM h)
    SELECT d.media_id,
           CAST(r.i AS INT) AS frame_idx,
           CAST(r.i AS DOUBLE) AS frame_ts_s
    FROM dur d, unnest(range(0, CAST(floor(d.duration_s) AS BIGINT) + 1)) AS r(i)
    """,
    tags=("MULTIMODAL", "UDF", "FRAME_SAMPLE"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (operators/multimodal.frame_sample):
    stub-decode the duration per video blob (Arrow mapInPandas — the
    documented pandas exception), then explode one row per sampled
    frame timestamp at 1 Hz. The real implementation swaps the stub for
    ffmpeg frame extraction; schema, partitioning, and the per-frame
    row explosion are the production shape. Oracle reproduces the
    deterministic stub via sha256 hex arithmetic, so even the UDF path
    stays hash-verified."""
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
    from agrobr_spark.operators.multimodal import frame_sample

    return frame_sample(media, every_s=1.0).select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("frame_ts_s").cast("double").alias("frame_ts_s"),
    )


_MM_COS_THR = 0.9


@register(
    "mm_near_dup",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id, text FROM documents),
    h AS (SELECT media_id, sha256(text) AS hx FROM media),
    fv AS (
      SELECT media_id,
        [{", ".join(f"({_mm_byte(i)} - 128) / 128.0" for i in range(8))}]
          AS f
      FROM h),
    nf AS (
      SELECT media_id, f, sqrt(list_dot_product(f, f)) AS nrm FROM fv)
    SELECT a.media_id AS media_a, b.media_id AS media_b,
      round(list_dot_product(a.f, b.f) / nullif(a.nrm * b.nrm, 0), 6)
        AS cosseno
    FROM nf a JOIN nf b ON a.media_id < b.media_id
    WHERE round(list_dot_product(a.f, b.f) / nullif(a.nrm * b.nrm, 0), 6)
          >= {_MM_COS_THR}
    """,
    tags=("MULTIMODAL", "DEDUP", "UDF", "E2E"),
)
def mm_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal near-dup E2E: binary media blobs → Arrow mapInPandas
    feature extraction (operators/multimodal.decode_features, the
    documented pandas exception) → EXACT triangle-block cosine pair
    join on the 8-dim feature (operators/allpairs.block_cosine_pairs,
    same no-BNLJ equi-join plan as the text-embedding dedup). This is
    the perceptual-dedup shape an image/video pipeline runs (pHash /
    CLIP-feature near-dup); the stub features are k/128 lattice values
    derived from the payload sha256, so the whole chain — including
    the Python decode step — is hash-verified against pure SQL hex
    arithmetic. At scale, swap block_cosine_pairs for
    cluster_cosine_pairs exactly as the text path does."""
    from agrobr_spark.operators.allpairs import block_cosine_pairs
    from agrobr_spark.operators.multimodal import decode_features

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
    feats = decode_features(media).select("media_id", "feature")
    pares = block_cosine_pairs(
        feats,
        id_col="media_id",
        vec_col="feature",
        threshold=_MM_COS_THR,
        n_blocks=8,
    )
    return pares.select(
        F.col("id_a").alias("media_a"),
        F.col("id_b").alias("media_b"),
        "cosseno",
    )


# -- funnel + retention: the two classic event-analytics rollups --


FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "w8_funnel",
    oracle=f"""
    WITH e1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
    e2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN e1 ON e1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > e1.t1
      GROUP BY e.user_id),
    e3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN e2 ON e2.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > e2.t2
      GROUP BY e.user_id),
    contagens AS (
      SELECT (SELECT count(*) FROM e1) AS c1,
             (SELECT count(*) FROM e2) AS c2,
             (SELECT count(*) FROM e3) AS c3)
    SELECT ordem, etapa, n_usuarios,
      round(CAST(n_usuarios AS DOUBLE) / nullif(c1, 0), 6) AS conversao
    FROM contagens,
      (VALUES (1, '{FUNNEL_STEPS[0]}'), (2, '{FUNNEL_STEPS[1]}'),
              (3, '{FUNNEL_STEPS[2]}')) AS etapas(ordem, etapa),
      LATERAL (SELECT CASE ordem WHEN 1 THEN c1 WHEN 2 THEN c2
                      ELSE c3 END AS n_usuarios)
    """,
    tags=("W8", "FUNNEL", "EVENTS"),
)
def w8_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict sequential funnel (view → click → purchase): a user
    counts for step k only with a step-k event strictly AFTER their
    step-(k-1) entry time — the standard product-analytics funnel, not
    the set-intersection shortcut that overcounts out-of-order users.

    Plan: each stage is one filtered groupBy on user_id joined to the
    previous stage's entry times (equi-join on the user key, partial
    aggregation applies); the final 3-row report folds the stage
    counts with one stack — no window over the event stream, no
    per-user state, and the event scan is filtered to the step types
    at the source. At 100 TB each stage is an ordinary keyed
    aggregation over the (pushdown-pruned) step's events."""
    e = load(spark, sf_dir, "events")
    u1 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    flags = (
        u1.select("user_id", F.lit(1).alias("f1"))
        .join(u2.select("user_id", F.lit(1).alias("f2")), "user_id", "left")
        .join(u3.select("user_id", F.lit(1).alias("f3")), "user_id", "left")
        .agg(
            # coalesce AROUND the sums: on an empty funnel (zero
            # step-1 events) the global agg yields NULL sums, but the
            # oracle's count(*) subqueries yield 0 — both must emit 0.
            F.coalesce(F.sum("f1"), F.lit(0)).alias("c1"),
            F.coalesce(F.sum(F.coalesce("f2", F.lit(0))), F.lit(0)).alias("c2"),
            F.coalesce(F.sum(F.coalesce("f3", F.lit(0))), F.lit(0)).alias("c3"),
        )
    )
    return flags.select(
        F.expr(
            f"stack(3, 1, '{FUNNEL_STEPS[0]}', c1, 2, '{FUNNEL_STEPS[1]}',"
            f" c2, 3, '{FUNNEL_STEPS[2]}', c3) AS (ordem, etapa, n_usuarios)"
        ),
        F.col("c1").alias("_c1"),
    ).select(
        "ordem",
        "etapa",
        F.col("n_usuarios").cast("bigint").alias("n_usuarios"),
        F.round(
            F.col("n_usuarios").cast("double")
            / F.nullif(F.col("_c1"), F.lit(0)),
            6,
        ).alias("conversao"),
    )


@register(
    "w9_retention_cohorts",
    oracle="""
    WITH primeiro AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS coorte FROM events
      GROUP BY user_id),
    atividade AS (
      SELECT DISTINCT e.user_id, p.coorte,
        date_diff('day', p.coorte, CAST(e.ts AS DATE)) AS dias_depois
      FROM events e JOIN primeiro p ON p.user_id = e.user_id)
    SELECT coorte, CAST(dias_depois AS INTEGER) AS dias_depois,
      count(*) AS n_usuarios
    FROM atividade GROUP BY 1, 2
    """,
    tags=("W9", "RETENTION", "EVENTS"),
)
def w9_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-activity date,
    counted on each later day-offset they return — the triangle a
    retention dashboard renders. Per-user first date is one groupBy;
    the offset explode is a PK join back to events plus a distinct on
    (user, offset); the final rollup is partial+final on
    (cohort, offset). All keyed aggregations — no windows at all."""
    e = load(spark, sf_dir, "events")
    primeiro = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("coorte")
    )
    atividade = (
        e.select("user_id", F.col("ts").cast("date").alias("dia"))
        .join(primeiro, "user_id")
        .select(
            "user_id",
            "coorte",
            F.datediff("dia", "coorte").alias("dias_depois"),
        )
        .distinct()
    )
    return atividade.groupBy("coorte", "dias_depois").agg(
        F.count(F.lit(1)).alias("n_usuarios")
    )


@register(
    "w10_rolling_7d",
    oracle="""
    WITH diario AS (
      SELECT event_type, CAST(ts AS DATE) AS data,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS soma,
        count(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2)
    SELECT event_type, data,
      CAST(soma AS DOUBLE) AS soma_dia,
      CAST(sum(soma) OVER w AS DOUBLE) AS soma_7d,
      CAST(sum(n) OVER w AS BIGINT) AS n_7d,
      round(CAST(sum(soma) OVER w AS DOUBLE) / sum(n) OVER w, 6)
        AS media_7d
    FROM diario
    WINDOW w AS (PARTITION BY event_type ORDER BY data
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    """,
    tags=("W10", "ROLLING", "RANGE_FRAME"),
)
def w10_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day sum/mean per event_type over daily aggregates — a
    RANGE-frame window (value-based bounds over the date axis), the
    one window shape the catalog's lag/rank/rows entries don't cover.
    A calendar gap therefore shrinks the window to the days that
    exist, which a ROWS BETWEEN 6 PRECEDING frame would silently get
    wrong.

    Plan: the event stream collapses to ~|types|×|days| daily rows
    FIRST (partial+final keyed agg), so the window runs over the tiny
    aggregate, never the raw events; ordering is an integer day offset
    (Spark's rangeBetween needs a numeric axis; DuckDB takes the
    INTERVAL form directly — same frame semantics). Daily sums in
    decimal, rolling mean rounded to 6dp — the repo's float rules."""
    e = load(spark, sf_dir, "events")
    diario = (
        e.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("data")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)")).alias("soma"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("dia_n", F.datediff("data", F.lit("1970-01-01")))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("dia_n")
        .rangeBetween(-6, 0)
    )
    return diario.select(
        "event_type",
        "data",
        F.col("soma").cast("double").alias("soma_dia"),
        F.sum("soma").over(w).cast("double").alias("soma_7d"),
        F.sum("n").over(w).cast("bigint").alias("n_7d"),
        F.round(
            F.sum("soma").over(w).cast("double") / F.sum("n").over(w), 6
        ).alias("media_7d"),
    )


ATTR_WINDOW_S = 7 * 86400  # attribution lookback


@register(
    "w11_touch_attribution",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_id, event_type,
             epoch_ns(ts) // 1000 AS us
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')),
    marcado AS (
      SELECT *,
        last_value(CASE WHEN event_type IN ('view', 'click')
                        THEN event_id END IGNORE NULLS)
          OVER w AS toque_id,
        last_value(CASE WHEN event_type IN ('view', 'click')
                        THEN event_type END IGNORE NULLS)
          OVER w AS toque_tipo,
        last_value(CASE WHEN event_type IN ('view', 'click')
                        THEN us END IGNORE NULLS)
          OVER w AS toque_us
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT event_id AS compra_id, user_id, CAST(us AS BIGINT) AS compra_us,
      CASE WHEN toque_us IS NOT NULL
                AND us - toque_us <= {ATTR_WINDOW_S}::BIGINT * 1000000
           THEN toque_id END AS toque_id,
      CASE WHEN toque_us IS NOT NULL
                AND us - toque_us <= {ATTR_WINDOW_S}::BIGINT * 1000000
           THEN toque_tipo ELSE 'organico' END AS toque_tipo,
      CASE WHEN toque_us IS NOT NULL
                AND us - toque_us <= {ATTR_WINDOW_S}::BIGINT * 1000000
           THEN CAST((us - toque_us) // 1000000 AS BIGINT) END AS idade_s
    FROM marcado WHERE event_type = 'purchase'
    """,
    tags=("W11", "ATTRIBUTION", "EVENTS"),
)
def w11_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRECEDING view/click within a 7-day lookback, else
    'organico' — the marketing-analytics join every event warehouse
    runs, expressed as a `last_value(... IGNORE NULLS)` carry-forward
    over ROWS UNBOUNDED PRECEDING..1 PRECEDING (the one window shape
    the catalog's lag/rank/range entries don't cover; no self-join of
    purchases against the touch stream, which would be a per-purchase
    range probe).

    Scale shape: one filtered scan (three event types — pushed down),
    one keyed window per user, and the timestamp math is epoch-µs
    integers on both engines (the w7 cross-engine rule)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    from pyspark.sql import Window

    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_id")
    )
    touch_t = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    touch_us = F.when(
        F.col("event_type").isin("view", "click"), F.col("us")
    )
    marcado = base.select(
        "*",
        F.last(touch, ignorenulls=True).over(w).alias("toque_id"),
        F.last(touch_t, ignorenulls=True).over(w).alias("toque_tipo"),
        F.last(touch_us, ignorenulls=True).over(w).alias("toque_us"),
    )
    dentro = F.col("toque_us").isNotNull() & (
        F.col("us") - F.col("toque_us") <= ATTR_WINDOW_S * 1_000_000
    )
    return marcado.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("compra_id"),
        "user_id",
        F.col("us").cast("bigint").alias("compra_us"),
        F.when(dentro, F.col("toque_id")).alias("toque_id"),
        F.when(dentro, F.col("toque_tipo"))
        .otherwise("organico")
        .alias("toque_tipo"),
        F.when(
            dentro, ((F.col("us") - F.col("toque_us")) / 1_000_000).cast("bigint")
        ).alias("idade_s"),
    )


# -- w12: robust daily-anomaly flags (median/MAD, not mean/stddev) --

MAD_K = 3.0  # flag when |x - median| > 3 * MAD


@register(
    "w12_mad_anomalies",
    oracle=f"""
    WITH diario AS (
      SELECT event_type, CAST(ts AS DATE) AS data,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS soma
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    med AS (
      SELECT event_type, quantile_cont(soma, 0.5) AS mediana
      FROM diario GROUP BY event_type),
    desv AS (
      SELECT d.event_type,
        quantile_cont(abs(d.soma - m.mediana), 0.5) AS mad
      FROM diario d JOIN med m USING (event_type)
      GROUP BY d.event_type)
    SELECT d.event_type, d.data, round(d.soma, 6) AS soma,
      round(m.mediana, 6) AS mediana, round(v.mad, 6) AS mad,
      (abs(d.soma - m.mediana) > {MAD_K} * v.mad) AS anomalo
    FROM diario d
    JOIN med m USING (event_type)
    JOIN desv v USING (event_type)
    """,
    tags=("W12", "ANOMALY", "ROBUST", "EVENTS"),
)
def w12_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily anomaly flags per event_type: a day is anomalous
    when its total deviates from the series MEDIAN by more than
    3 × MAD (median absolute deviation) — the robust twin of the
    z-score rule, immune to the anomalies themselves inflating the
    baseline (one huge day wrecks mean/stddev; median/MAD barely
    move). This is the detector a pipeline-health monitor runs over
    ingest volumes.

    Determinism: both engines share the SQL-standard linear-
    interpolation median (a13 precedent), sums are decimal-exact
    before the float median, and outputs round at 6dp. Plan: the
    daily rollup is one partial+final agg; the two percentile passes
    aggregate the (tiny) per-type daily series — at 100 TB the daily
    frame is ~types × days rows, negligible next to the scan, and
    `approx_percentile` swaps in per a13 if types × days ever isn't."""
    e = load(spark, sf_dir, "events")
    diario = (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("data"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("soma")
        )
    )
    med = diario.groupBy("event_type").agg(
        F.expr("percentile(soma, 0.5)").alias("mediana")
    )
    desv = (
        diario.join(med, "event_type")
        .select(
            "event_type",
            F.abs(F.col("soma") - F.col("mediana")).alias("dev"),
        )
        .groupBy("event_type")
        .agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    )
    return (
        diario.join(F.broadcast(med), "event_type")
        .join(F.broadcast(desv), "event_type")
        .select(
            "event_type",
            "data",
            F.round("soma", 6).alias("soma"),
            F.round("mediana", 6).alias("mediana"),
            F.round("mad", 6).alias("mad"),
            (
                F.abs(F.col("soma") - F.col("mediana"))
                > MAD_K * F.col("mad")
            ).alias("anomalo"),
        )
    )


# -- w16: anomaly intervals (gaps-and-islands over the MAD flags) --


@register(
    "w16_anomaly_intervals",
    oracle=f"""
    WITH diario AS (
      SELECT event_type, CAST(ts AS DATE) AS data,
        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS soma
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    med AS (
      SELECT event_type, quantile_cont(soma, 0.5) AS mediana
      FROM diario GROUP BY event_type),
    desv AS (
      SELECT d.event_type,
        quantile_cont(abs(d.soma - m.mediana), 0.5) AS mad
      FROM diario d JOIN med m USING (event_type)
      GROUP BY d.event_type),
    anomalos AS (
      SELECT d.event_type, d.data, d.soma
      FROM diario d
      JOIN med m USING (event_type) JOIN desv v USING (event_type)
      WHERE abs(d.soma - m.mediana) > {MAD_K} * v.mad),
    ilhas AS (
      SELECT event_type, data, soma,
        date_diff('day', DATE '1970-01-01', data)
          - row_number() OVER (PARTITION BY event_type ORDER BY data)
          AS grp
      FROM anomalos)
    SELECT event_type, min(data) AS inicio, max(data) AS fim,
      CAST(count(*) AS INT) AS n_dias,
      round(max(soma), 6) AS soma_pico
    FROM ilhas GROUP BY event_type, grp
    """,
    tags=("W16", "ANOMALY", "ISLANDS", "EVENTS"),
)
def w16_anomaly_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous EPISODES, not days: consecutive `w12_mad_anomalies`
    days per event_type coalesced into intervals via the classic
    gaps-and-islands rule (island key = epoch-day − row_number, which
    is constant exactly while days are consecutive), each reporting
    start, end, length and peak volume — the shape an incident
    review or alert dedup actually consumes (one page per EPISODE,
    not thirty pages for a thirty-day incident).

    Plan: the detector is w12's (daily partial+final agg + two tiny
    percentile passes); islands add one window and one group-by over
    ONLY the anomalous days — a frame bounded by types × flagged
    days, negligible at any corpus size, partitioned on the uniform
    event_type key. Dates do integer epoch-day arithmetic in both
    engines (no interval types near the hash)."""
    from pyspark.sql import Window

    flags = w12_mad_anomalies(spark, sf_dir)
    anom = flags.filter("anomalo").select("event_type", "data", "soma")
    w = Window.partitionBy("event_type").orderBy("data")
    ilhas = anom.select(
        "event_type",
        "data",
        "soma",
        (
            F.datediff("data", F.lit("1970-01-01"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    return ilhas.groupBy("event_type", "grp").agg(
        F.min("data").alias("inicio"),
        F.max("data").alias("fim"),
        F.count(F.lit(1)).cast("int").alias("n_dias"),
        F.round(F.max("soma"), 6).alias("soma_pico"),
    ).drop("grp")
