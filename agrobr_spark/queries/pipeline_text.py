"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference surface (north star): token counting, quality
scoring, language-ID heuristic, document fingerprinting and exact
dedup over the `documents` table. Everything is built-in-function
expressions (JVM-side, whole-stage codegen) — no Python UDFs in the
hot path — so the same plan scales to 100 TB of text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from agrobr_spark.io import load
from agrobr_spark.queries import register

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _tokens(col: str = "text"):
    """Whitespace tokenization; empty text → empty array (not [''])."""
    return F.when(
        F.length(F.trim(F.col(col))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(col)), r"\s+"))


@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id, lang,
      CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
      length(text) AS n_chars_real
    FROM documents
    """,
    tags=("TEXT", "TOKENIZE"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + char count per document."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.size(_tokens()).alias("n_tokens"),
        F.length("text").alias("n_chars_real"),
    )


@register(
    "text_quality_score",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, text, length(text) AS n_chars,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                      w -> w IN (%s))) END AS n_stop
      FROM documents)
    SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
      CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS punct_ratio,
      CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stop_ratio,
      CAST(n_chars AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS avg_token_len
    FROM base
    """
    % _STOP_SQL,
    tags=("TEXT", "QUALITY"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: length, punctuation ratio, stopword ratio,
    mean token length (C4/Gopher-style heuristics)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    base = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).alias("n_punct"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).alias("n_stop"),
    )
    g = lambda c: F.greatest(F.col(c), F.lit(1)).cast("double")  # noqa: E731
    return base.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_punct",
        "n_stop",
        (F.col("n_punct").cast("double") / g("n_chars")).alias("punct_ratio"),
        (F.col("n_stop").cast("double") / g("n_tokens")).alias("stop_ratio"),
        (F.col("n_chars").cast("double") / g("n_tokens")).alias("avg_token_len"),
    )


# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "de", "que", "con"),
    "fr": ("le", "la", "et", "est", "avec"),
    "de": ("der", "die", "und", "ist", "mit"),
}


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        r"ELSE len(list_filter(string_split_regex(lower(trim(text)), '\s+'), "
        f"w -> w IN ({words}))) END"
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang,
        {_lang_hits_sql("en")} AS en_hits,
        {_lang_hits_sql("es")} AS es_hits,
        {_lang_hits_sql("fr")} AS fr_hits,
        {_lang_hits_sql("de")} AS de_hits
      FROM documents)
    SELECT doc_id, lang, en_hits, es_hits, fr_hits, de_hits,
      CASE
        WHEN greatest(en_hits, es_hits, fr_hits, de_hits) = 0 THEN 'unknown'
        WHEN en_hits >= greatest(es_hits, fr_hits, de_hits) THEN 'en'
        WHEN es_hits >= greatest(fr_hits, de_hits) THEN 'es'
        WHEN fr_hits >= de_hits THEN 'fr'
        ELSE 'de' END AS lang_prevista
    FROM hits
    """,
    tags=("TEXT", "LANGID"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID heuristic (deterministic priority
    order en>es>fr>de on ties)."""
    d = load(spark, sf_dir, "documents")
    toks = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))

    def hits(lang: str):
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    h = d.select(
        "doc_id",
        "lang",
        hits("en").alias("en_hits"),
        hits("es").alias("es_hits"),
        hits("fr").alias("fr_hits"),
        hits("de").alias("de_hits"),
    )
    best = F.greatest("en_hits", "es_hits", "fr_hits", "de_hits")
    return h.withColumn(
        "lang_prevista",
        F.when(best == 0, "unknown")
        .when(F.col("en_hits") >= F.greatest("es_hits", "fr_hits", "de_hits"), "en")
        .when(F.col("es_hits") >= F.greatest("fr_hits", "de_hits"), "es")
        .when(F.col("fr_hits") >= F.col("de_hits"), "fr")
        .otherwise("de"),
    )


@register(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
      md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 4)
        AS balde
    FROM documents
    """,
    tags=("TEXT", "FINGERPRINT"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprint (lowercase, whitespace
    collapse → md5) + a shard-friendly bucket prefix."""
    d = load(spark, sf_dir, "documents")
    canon = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.substring(F.md5(canon), 1, 4).alias("balde"),
    )


@register(
    "dedup_exact",
    oracle=r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
           count(*) AS n_copias, min(doc_id) AS doc_id_mantido
    FROM documents
    GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    """,
    tags=("DEDUP", "EXACT"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the canonical text fingerprint,
    deterministic survivor = min(doc_id). At scale this is one shuffle
    on a 32-byte key instead of the full text."""
    d = load(spark, sf_dir, "documents")
    canon = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.select("doc_id", F.md5(canon).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copias"),
            F.min("doc_id").alias("doc_id_mantido"),
        )
    )
