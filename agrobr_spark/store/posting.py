"""Term-bucketed BM25 posting index: build once, answer lexical
queries from |query| buckets without re-tokenizing the corpus.

This is the materialization the ``text_bm25_topk`` docstring promises
as the 100 TB knob, and the retrieval analog of the reference's
indexed cache scan (ref: agrobr/cache/duckdb_store.py:339-400 — query
cost independent of history size). Layout at ``path``:

- ``postings/`` — parquet, disk-partitioned by
  ``bucket = pmod(xxhash64(termo), n_buckets)``, rows
  ``(termo, doc_id, dl, tf)``: one row per (document, distinct term).
  A query for terms T computes T's buckets (one tiny Spark job — the
  same xxhash64 the writer used, so Python never re-implements the
  hash) and reads ONLY those partitions: Catalyst partition-prunes on
  ``bucket IN (...)`` and pushes ``termo IN (...)`` into the pruned
  scan. Query cost is O(posting rows of the query's terms), flat in
  corpus size — the inverted-index property.
- ``stats/`` — one row ``(n, avgdl)``: corpus document count and
  average document length, folded at build time so queries never
  touch the corpus.
- ``manifest.json`` — ``n_buckets`` + tokenizer version, read back at
  query time so probe-side bucketing always matches the build.

At 100 TB: the build is one tokenize + one (doc, term) aggregation —
the same work a single ``text_bm25_topk`` already does — amortized
over every subsequent query. ``n_buckets`` scales with corpus size
(buckets ≈ total posting bytes / target partition size); on a real
cluster the same frame can instead go through
``bucketBy(n, "termo").saveAsTable`` for metastore-managed buckets,
but disk partitioning keeps the index a plain portable parquet
directory here.

The scoring helper is shared with the scan path
(``queries/pipeline_text.bm25_scores``) so both are pinned to the
same DuckDB oracle CTE — indexed ≡ scan is an oracle-checked
identity, not a convention.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TOKENIZER_VERSION = 1
DEFAULT_BUCKETS = 64


def tokenize_postings(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Whitespace-lowered posting rows ``(doc_id, dl, termo, tf)`` —
    the single tokenizer behind both the BM25 scan path and the
    posting-index build (they must agree byte-for-byte for the
    indexed ≡ scan identity to hold)."""
    toks = (
        docs.filter(F.length(F.trim(text_col)) > 0)
        .select(id_col, F.split(F.trim(text_col), r"\s+").alias("_t"))
        .select(
            id_col,
            F.size("_t").alias("dl"),
            F.explode("_t").alias("_tok"),
        )
        .select(id_col, "dl", F.lower("_tok").alias("termo"))
    )
    return toks.groupBy(id_col, "dl", "termo").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def build_posting_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the posting index for ``docs`` at ``path``.

    One corpus pass: tokenize → (doc, term) tf aggregation →
    partitioned write; corpus stats fold from the same frame. No
    collect of corpus-sized data — the only driver-side artifact is
    the manifest dict."""
    postings = tokenize_postings(docs, id_col, text_col)
    bucket = F.pmod(F.xxhash64(F.col("termo")), F.lit(int(n_buckets)))
    (
        postings.withColumn("bucket", bucket.cast("int"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    stats = (
        postings.groupBy(id_col)
        .agg(F.first("dl").alias("dl"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("dl").cast("bigint").alias("sum_dl"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    manifest = {
        "n_buckets": int(n_buckets),
        "tokenizer_version": TOKENIZER_VERSION,
        "id_col": id_col,
    }
    with open(f"{path}/manifest.json", "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)


def update_posting_index(
    docs_new: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: int | None = None,
) -> None:
    """Incrementally fold a batch of NEW documents into an existing
    index — the retrieval-store analog of the admission pipelines'
    MERGE-back (and of the reference's incremental accumulate loop,
    ref: agrobr/cepea/api.py:119-187): the corpus is never
    re-tokenized; only the batch's posting rows are written, appended
    into their term buckets at the n_buckets FROZEN in the manifest
    (batch and corpus can never hash at different widths).

    Corpus stats fold exactly: the stats row carries ``sum_dl``
    alongside ``n``, so the updated ``avgdl`` is
    ``(sum_dl + sum_dl_batch) / (n + n_batch)`` — byte-identical to a
    full rebuild over corpus ∪ batch, which is what the parity test
    pins (build+update ≡ rebuild, query-result equality).

    Contract: ``docs_new`` holds ids not already indexed (the
    admission pipelines guarantee this — a doc is indexed at most
    once); re-appending an id would double-count its postings, the
    same append-only semantics as the survivor MERGE's staging input.
    For streaming callers, pass the foreachBatch ``batch_id``: applied
    epochs are recorded in the manifest and a replayed epoch is a
    no-op instead of a double-count (the sinks' ``applied_batch_ids``
    guard applied to the index), making the stream
    effectively-exactly-once.
    """
    man = read_manifest(path)
    if batch_id is not None and int(batch_id) in man.get(
        "applied_batch_ids", []
    ):
        return
    nb = int(man["n_buckets"])
    postings = tokenize_postings(docs_new, id_col, text_col)
    bucket = F.pmod(F.xxhash64(F.col("termo")), F.lit(nb))
    (
        postings.withColumn("bucket", bucket.cast("int"))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    spark = docs_new.sparkSession
    old = spark.read.parquet(f"{path}/stats").collect()[0]
    batch = (
        postings.groupBy(id_col)
        .agg(F.first("dl").alias("dl"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum("dl").cast("bigint"), F.lit(0)).alias("sum_dl"),
        )
        .collect()[0]
    )
    n = int(old["n"]) + int(batch["n"])
    sum_dl = int(old["sum_dl"]) + int(batch["sum_dl"])
    spark.createDataFrame(
        [(n, sum_dl, sum_dl / n if n else 0.0)],
        "n bigint, sum_dl bigint, avgdl double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    if batch_id is not None:
        man.setdefault("applied_batch_ids", []).append(int(batch_id))
        with open(f"{path}/manifest.json", "w", encoding="utf-8") as fh:
            json.dump(man, fh)


def read_manifest(path: str) -> dict:
    with open(f"{path}/manifest.json", encoding="utf-8") as fh:
        return json.load(fh)


def query_postings(
    spark: SparkSession, path: str, terms: tuple[str, ...]
) -> DataFrame:
    """Posting rows for ``terms`` read from only their buckets.

    The term→bucket map is computed with the SAME xxhash64 the build
    used, via one |terms|-row Spark job (bounded collect — never a
    Python re-implementation of the hash). The returned scan carries
    ``bucket IN (...)`` (partition pruning: untouched buckets are
    never listed or read) and ``termo IN (...)`` (pushed filter
    inside the pruned partitions)."""
    man = read_manifest(path)
    nb = int(man["n_buckets"])
    tdf = spark.createDataFrame([(t,) for t in terms], ["termo"])
    bkts = sorted(
        {
            r["b"]
            for r in tdf.select(
                F.pmod(F.xxhash64("termo"), F.lit(nb)).cast("int").alias("b")
            ).collect()
        }
    )
    return (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(bkts) & F.col("termo").isin(*terms))
        .drop("bucket")
    )


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    terms: tuple[str, ...],
    k: int,
    k1: float,
    b: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 answer from the posting index — identical scoring
    (and therefore identical oracle) to the scan path's
    ``bm25_scores``: df folds from the pruned posting read, (n, avgdl)
    come from the one-row stats table, per-term contributions are
    6dp-rounded and DECIMAL-summed, tie-break on doc id. The corpus is
    never touched."""
    tf = query_postings(spark, path, terms)
    stats = spark.read.parquet(f"{path}/stats")
    df_tab = tf.groupBy("termo").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    pontos = (
        tf.join(F.broadcast(df_tab), "termo")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.round(idf * (F.col("tf") * (k1 + 1)) / denom, 6)
            .cast("decimal(18,6)")
            .alias("p"),
        )
    )
    return (
        pontos.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_termos"),
            F.round(F.sum("p").cast("double"), 6).alias("pontos"),
        )
        .orderBy(F.desc("pontos"), id_col)
        .limit(int(k))
    )


# -- positional postings: the phrase-search index ---------------------


def tokenize_positional(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Positional posting rows ``(doc_id, pos, termo)`` — the raw
    whitespace tokenizer of the phrase scan path
    (``queries/pipeline_text.text_phrase_match``) with 0-based token
    offsets kept, so indexed ≡ scan holds byte-for-byte. Unlike the
    BM25 rows there is no per-(doc, term) aggregation: order IS the
    payload."""
    return (
        docs.filter(F.length(F.trim(text_col)) > 0)
        .select(
            id_col,
            F.posexplode(F.split(F.trim(text_col), r"\s+")).alias(
                "pos", "termo"
            ),
        )
        .select(id_col, F.col("pos").cast("bigint").alias("pos"), "termo")
    )


def build_positional_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the positional index at ``path``: parquet
    disk-partitioned by ``bucket = pmod(xxhash64(termo), n_buckets)``
    exactly like the BM25 index, rows ``(termo, doc_id, pos)``. A
    phrase query reads |distinct phrase terms| buckets however large
    the corpus grows — the inverted-index property extended with
    positions. One corpus pass, no driver-side data beyond the
    manifest."""
    rows = tokenize_positional(docs, id_col, text_col)
    bucket = F.pmod(F.xxhash64(F.col("termo")), F.lit(int(n_buckets)))
    (
        rows.withColumn("bucket", bucket.cast("int"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    manifest = {
        "n_buckets": int(n_buckets),
        "tokenizer_version": TOKENIZER_VERSION,
        "id_col": id_col,
        "kind": "positional",
    }
    with open(f"{path}/manifest.json", "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)


def update_positional_index(
    docs_new: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: int | None = None,
) -> None:
    """Fold NEW documents into an existing positional index: batch
    rows append into their term buckets at the manifest-frozen
    n_buckets; a replayed ``batch_id`` is a no-op (the
    ``applied_batch_ids`` guard of ``update_posting_index``). Same
    append-only contract: ids must not already be indexed."""
    man = read_manifest(path)
    if batch_id is not None and int(batch_id) in man.get(
        "applied_batch_ids", []
    ):
        return
    nb = int(man["n_buckets"])
    rows = tokenize_positional(docs_new, id_col, text_col)
    bucket = F.pmod(F.xxhash64(F.col("termo")), F.lit(nb))
    (
        rows.withColumn("bucket", bucket.cast("int"))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    if batch_id is not None:
        man.setdefault("applied_batch_ids", []).append(int(batch_id))
        with open(f"{path}/manifest.json", "w", encoding="utf-8") as fh:
            json.dump(man, fh)


def phrase_match_indexed(
    spark: SparkSession,
    path: str,
    phrases: tuple[str, ...],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase occurrences answered from the positional index —
    the scan path's candidate-start vote (token at position p
    matching phrase offset o votes for start p − o; a start with ALL
    offsets present is one occurrence) run over ONLY the pruned
    posting read of the phrases' terms. Output
    ``(doc_id, frase, n_ocorrencias)``, identical to
    ``text_phrase_match`` — the catalog pins the identity against one
    shared oracle."""
    terms = [
        (frase, termo, off)
        for frase in phrases
        for off, termo in enumerate(frase.split())
    ]
    postings = query_postings(
        spark, path, tuple(sorted({t for _, t, _ in terms}))
    )
    termdf = spark.createDataFrame(
        terms, "frase string, termo string, deslocamento int"
    )
    lens = termdf.groupBy("frase").agg(
        F.count(F.lit(1)).alias("comprimento")
    )
    m = postings.join(F.broadcast(termdf), "termo").select(
        id_col,
        "frase",
        (F.col("pos") - F.col("deslocamento")).alias("inicio"),
    )
    cheio = m.groupBy(id_col, "frase", "inicio").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        cheio.join(F.broadcast(lens), "frase")
        .filter(F.col("c") == F.col("comprimento"))
        .groupBy(id_col, "frase")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ocorrencias"))
    )
