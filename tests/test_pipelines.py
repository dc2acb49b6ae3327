"""End-to-end corpus preparation (agrobr_spark/pipelines.py): the
one-call chain must conserve accounting across its verified stages."""

from __future__ import annotations

from agrobr_spark.pipelines import prepare_training_corpus
from tests.conftest import SF_SMOKE


def test_prepare_training_corpus_accounting(spark, tmp_path):
    out = str(tmp_path / "corpus")
    s = prepare_training_corpus(spark, SF_SMOKE, out, n_shards=4)

    # every doc got exactly one decision reason
    assert sum(s["decision_reasons"].values()) == 500
    assert "mantido" in s["decision_reasons"]

    total_docs = sum(v["docs"] for v in s["selected_per_source"].values())
    assert 0 < total_docs < 500  # gates + budget genuinely filtered
    # exported rows == selected rows == split-assigned rows
    assert s["shards"]["row_count"] == total_docs
    assert sum(s["per_split"].values()) == total_docs
    assert set(s["shards"]["shards"]) <= {"0", "1", "2", "3"}
    # token accounting flows through to the shard manifest
    toks_manifest = sum(v["tokens"] for v in s["shards"]["shards"].values())
    toks_selected = sum(v["tokens"] for v in s["selected_per_source"].values())
    assert toks_manifest == toks_selected

    # read-back of the export verifies per-shard hashes
    from agrobr_spark.sources.sinks import read_training_shards

    df, _ = read_training_shards(spark, out)
    assert df.count() == total_docs


def test_prepare_training_corpus_no_quality_gates(spark, tmp_path):
    s_loose = prepare_training_corpus(
        spark, SF_SMOKE, str(tmp_path / "loose"), n_shards=2,
        apply_quality_gates=False,
    )
    s_tight = prepare_training_corpus(
        spark, SF_SMOKE, str(tmp_path / "tight"), n_shards=2,
        apply_quality_gates=True,
    )
    assert s_loose["shards"]["row_count"] >= s_tight["shards"]["row_count"]


def test_overlap_matrix_fractions_and_canonical_pairs(spark):
    """Overlap fractions are in (0, 1], pairs are a<b canonical, and
    the planted cross-source near-dups give at least one pair real
    overlap mass."""
    from tests.conftest import SF_ORACLE

    from agrobr_spark.queries import catalog as _catalog

    df = _catalog()["corpus_overlap_matrix"].fn(spark, SF_ORACLE)
    rows = df.collect()
    assert rows, "planted dups must produce at least one overlapping pair"
    for r in rows:
        assert r["fonte_a"] < r["fonte_b"]
        assert 0 < r["frac_a"] <= 1 and 0 < r["frac_b"] <= 1
        assert r["n_comum"] <= min(r["n_a"], r["n_b"])
