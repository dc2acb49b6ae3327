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
