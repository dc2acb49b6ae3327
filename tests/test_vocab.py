"""Incremental DF-index maintenance (queries/vocab.py): the additive
fold must equal a one-shot build for any batch split, and empty
batches must not touch the store."""

from __future__ import annotations

import pyspark.sql.functions as F

from agrobr_spark.io import load
from agrobr_spark.queries.vocab import (
    _df_store,
    build_df_index,
    update_df_index,
)
from tests.conftest import SF_SMOKE


def _table(spark, store_dir):
    return {
        (r["termo"], r["df"], r["balde"])
        for r in _df_store(spark, store_dir).read().collect()
    }


def test_incremental_df_equals_one_shot_for_any_split(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents")
    one = str(tmp_path / "one")
    build_df_index(spark, docs, one)
    want = _table(spark, one)
    assert want, "fixture corpus must produce a vocabulary"

    # two sequential batches, split mid-corpus
    two = str(tmp_path / "two")
    build_df_index(spark, docs.filter(F.col("doc_id") < 200), two)
    update_df_index(
        spark,
        docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)),
        two,
    )
    update_df_index(spark, docs.filter(F.col("doc_id") >= 350), two)
    assert _table(spark, two) == want

    # update into a cold store behaves like a build
    cold = str(tmp_path / "cold")
    update_df_index(spark, docs, cold)
    assert _table(spark, cold) == want


def test_empty_batch_is_a_noop(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents")
    d = str(tmp_path / "idx")
    build_df_index(spark, docs.filter(F.col("doc_id") < 100), d)
    before = _table(spark, d)
    update_df_index(spark, docs.filter(F.col("doc_id") < 0), d)
    assert _table(spark, d) == before


def test_tfidf_from_maintained_index_equals_one_shot(spark, tmp_path):
    """Scoring a batch against an index built incrementally (build +
    fold) must be row-identical to scoring against a one-shot build of
    the same corpus — the read-back path must not care how the table
    got there."""
    from agrobr_spark.queries.vocab import tfidf_from_index

    docs = load(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    n_corpus = corpus.filter(F.length(F.trim("text")) > 0).count()

    one = str(tmp_path / "one")
    build_df_index(spark, corpus, one)
    inc = str(tmp_path / "inc")
    build_df_index(spark, corpus.filter(F.col("doc_id") < 150), inc)
    update_df_index(
        spark, corpus.filter(F.col("doc_id") >= 150), inc
    )

    a = sorted(
        map(tuple, tfidf_from_index(spark, batch, one, n_corpus).collect())
    )
    b = sorted(
        map(tuple, tfidf_from_index(spark, batch, inc, n_corpus).collect())
    )
    assert a == b
    assert a, "batch must produce scored keywords"
