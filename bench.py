#!/usr/bin/env python
"""Headline benchmark: run the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE compact JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "n_queries": K, "steal_total_s": S,
     "detail": "BENCH_DETAIL.json"}

The printed line stays well under 1 KB so the round driver's capture
parses it whole (BENCH_r06/r07 recorded ``parsed: null`` because the
full 43-query line overflowed the capture): the ``queries`` dict on
the line carries only the BASELINE.md-comparable classes, and the
COMPLETE per-query record — every timing, per-query steal seconds,
attempt counts — is written to ``BENCH_DETAIL.json`` next to this
script (committed per round as ``BENCH_DETAIL_r{N}.json``).

Query picks mirror BASELINE.md's operation classes re-expressed on
Spark: MERGE-upsert throughput (m1), filtered scan + sort (p4),
group-by rollups (a1/a5/a6), fact<-dim broadcast join (j1), window
latest-per-key (w4), text pipeline + dedup + similarity (the
training-data extensions). Per-query timing and materialization go
through :func:`agrobr_spark.benchmark.benchmark_query` (the public
harness), one measured iteration per attempt so the steal-aware
retry policy here stays in control of attempt count.
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "a1_rollup_sum",
    "a5_monthly_bucket",
    "a6_pivot",
    "j1_fact_dim_enrich",
    "j2_full_outer_mirror",
    "j7_asof_join",
    "j8_range_join",
    "j10_interval_overlap",
    "j11_salted_skew_join",
    "a11_grouping_sets",
    "a15_profile_columns",
    "a16_profile_histogram",
    "a17_profile_correlation",
    "a18_approx_distinct",
    "corpus_source_divergence",
    "o7_stratified_sample_exact",
    "dedup_semdedup",
    "pipeline_dsir_weights",
    "j9_bloom_semi_join",
    "text_bm25_topk",
    "text_bm25_rm3",
    "retrieval_index_freshness",
    "text_snippets_indexed",
    "text_bm25_rm3_indexed",
    "text_snippets",
    "text_bm25_indexed",
    "text_bm25_compacted",
    "text_phrase_match",
    "text_phrase_indexed",
    "text_contamination_fuzzy",
    "sim_hybrid_rrf",
    "graph_pagerank",
    "sim_mmr_rerank",
    "o8_weighted_sample",
    "p4_date_range",
    "w1_pct_change",
    "w4_latest_per_key",
    "w13_gap_fill_locf",
    "w14_ewma_smooth",
    "a19_approx_quantiles",
    "a20_skew_advisor",
    "a21_pivot",
    "a22_join_size_advisor",
    "tpch_q3",
    "tpch_q5",
    "tpch_q17",
    "tpch_q20",
    "tpch_q2",
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",
    "w16_anomaly_intervals",
    "w15_rolling_zscore",
    "w7_sessionize",
    "m1_merge_upsert",
    "f7_unit_conversion",
    "v1_contract_validate",
    "v2_sanity_rules",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "near_dup_embeddings",
    "dedup_survivors",
    "pipeline_keep_set",
    "pipeline_admit_batch",
    "text_token_count_bpe_vocab",
    "text_quality_score",
    "text_gopher_rules",
    "text_line_filter",
    "text_tokenizer_fertility",
    "text_quality_classifier",
    "text_chunk",
    "text_pii_scrub",
    "text_repetition_filter",
    "text_span_dedup",
    "text_containment",
    "pipeline_data_mix",
    "pipeline_token_budget",
    "pipeline_admission_evidence",
    "pipeline_shard_manifest",
    "text_bigram_surprise",
    "dedup_survivors_quality",
    "corpus_dedup_rate_report",
    "pipeline_cluster_sample",
    "pipeline_pack_chunks",
    "sim_cosine_topk",
    "sim_ivf_ann",
    "sim_rp_lsh_ann",
    "sim_pq_ann",
    "sim_knn_graph",
    "sim_knn_graph_frozen",
    "sim_ann_recall_report",
    "sim_mutual_knn",
    "sim_graph_clusters",
    "graph_pagerank_redistributed",
    "graph_pagerank_components",
    "stream_pagerank_update",
    "stream_knn_graph_update",
    "stream_graph_clusters_update",
    "sim_hard_negatives",
    "stream_tumbling_daily",
    "stream_stateful_dod",
    "stream_dsir_weights",
    "stream_dedup_exact",
    "stream_source_divergence",
    "stream_approx_distinct",
    "stream_stream_join",
    "stream_shard_manifest",
    "pipeline_df_index_update",
    "corpus_overlap_matrix",
    "text_tfidf_topk",
    "text_heavy_hitters",
    "w8_funnel",
    "w10_rolling_7d",
    "w12_mad_anomalies",
    "text_unigram_surprise",
    "text_perplexity_buckets",
    "pipeline_chunk_overlap",
]

# Bench-coverage invariant (r10 VERDICT next #5): every catalog query
# is either in BENCH_QUERIES or listed here with a documented reason
# tag, so bench coverage can't silently rot as the catalog grows
# (tests/test_benchmark.py::test_bench_covers_catalog enforces it).
# Reason tags:
#   "cheap"            — ms-scale single-scan class (scalar functions,
#                        simple filters/projections/sorts/set-ops,
#                        validation passes); a benched query already
#                        exercises the same scan+shuffle shape, and a
#                        one-off sf0.1 sweep measured every "cheap"
#                        entry under the sub-second class bound.
#   "twin:<rep>"       — same plan family as benched <rep>, differing
#                        only in a parameter/approx/report projection;
#                        timing tracks the rep's by construction.
#   "stream-twin:<rep>"— AvailableNow fold whose per-batch logic IS
#                        the benched <rep> plus fixed trigger/commit
#                        overhead already priced by the benched
#                        streaming entries.
#   "stub"             — env-gated multimodal plumbing (decode is a
#                        deterministic fake without PIL/ffmpeg);
#                        nothing meaningful to time at sf0.1.
BENCH_EXCLUDED = {
    # cheap scalar/filter/projection/sort/set-op/validation classes
    "a2_sum_derived": "cheap",
    "a3_nullable_group_keys": "cheap",
    "a4_daily_bucket": "cheap",
    "a7_summary_row": "cheap",
    "a8_quality_metrics": "cheap",
    "a9_pk_dup_detect": "cheap",
    "a10_distinct_values": "cheap",
    "a12_unpivot": "cheap",
    "d4_snapshot_filter": "cheap",
    "f1_ptbr_number_parse": "cheap",
    "f2_multiformat_date_parse": "cheap",
    "f3_safra_algebra": "cheap",
    "f4_crop_canon": "cheap",
    "f5_uf_normalize": "cheap",
    "f6_municipality_geocode": "cheap",
    "f8f9_sentinel_and_arithmetic": "cheap",
    "f10_string_hygiene": "cheap",
    "f11_content_hash": "cheap",
    "f13_regex_classify": "cheap",
    "j3_conditional_split_agg": "cheap",
    "j4_group_first": "cheap",
    "j5_dedup_dim_join": "cheap",
    "j6_small_dim_lookup": "cheap",
    "m2_ttl_validity": "cheap",
    "o1_multikey_sort_limit": "cheap",
    "o2_desc_recency": "cheap",
    "o3_topk_search": "cheap",
    "o4_limit_latest": "cheap",
    "o5_deterministic_sample": "cheap",
    "o6_train_val_test": "cheap",
    "p1_project_rename": "cheap",
    "p2_eq_filter": "cheap",
    "p3_string_predicates": "cheap",
    "p5_null_drop": "cheap",
    "p6_threshold_filter": "cheap",
    "p7_dedup_distinct": "cheap",
    "p8_category_exclusion": "cheap",
    "s5_json_scan": "cheap",
    "s8_store_scan": "cheap",
    "u1_union_all": "cheap",
    "u2_anti_join": "cheap",
    "u4_intersect_except": "cheap",
    "v3_semantic_rules": "cheap",
    "v6_quality_certification": "cheap",
    "w3_gap_detect": "cheap",
    "w5_calendar_antijoin": "cheap",
    "w6_topk_per_group": "cheap",
    "w11_touch_attribution": "cheap",
    # parameter/approx/report twins of benched representatives
    "a13_percentiles": "twin:a19_approx_quantiles",
    "a13_percentiles_approx": "twin:a19_approx_quantiles",
    "a14_approx_distinct": "twin:a18_approx_distinct",
    "dedup_blocking_recall": "twin:dedup_minhash_lsh",
    "dedup_blocking_recall_paths": "twin:dedup_minhash_lsh",
    "dedup_components": "twin:near_dup_embeddings",
    "dedup_embedding_cosine": "twin:near_dup_embeddings",
    "dedup_incremental_minhash": "twin:dedup_minhash_lsh",
    "dedup_lsh_quality_report": "twin:dedup_minhash_lsh",
    "dedup_ngram_jaccard": "twin:dedup_minhash_lsh",
    "pipeline_admit_lsh": "twin:pipeline_admit_batch",
    "pipeline_admit_text": "twin:pipeline_admit_batch",
    "pipeline_corpus_report": "twin:corpus_dedup_rate_report",
    "pipeline_curriculum_order": "twin:pipeline_data_mix",
    "pipeline_data_mix_temperature": "twin:pipeline_data_mix",
    "pipeline_keep_set_report": "twin:pipeline_keep_set",
    "pipeline_shuffle_order": "twin:pipeline_data_mix",
    "pipeline_tfidf_incremental": "twin:pipeline_df_index_update",
    "text_contamination": "twin:text_contamination_fuzzy",
    "text_fingerprint": "twin:text_span_dedup",
    "text_lang_id": "twin:text_quality_score",
    "text_length_histogram": "twin:a16_profile_histogram",
    "text_ngram_topk": "twin:text_tfidf_topk",
    "text_quality_deciles": "twin:text_quality_score",
    "text_quality_deciles_approx": "twin:text_quality_score",
    "text_rarity_score": "twin:text_unigram_surprise",
    "text_stopword_discovery": "twin:text_tfidf_topk",
    "text_token_count": "twin:text_token_count_bpe_vocab",
    "text_token_count_bpe": "twin:text_token_count_bpe_vocab",
    "w9_retention_cohorts": "twin:w8_funnel",
    # AvailableNow folds of benched per-batch logic
    "stream_admit_batch": "stream-twin:pipeline_admit_batch",
    "stream_admit_lsh": "stream-twin:dedup_minhash_lsh",
    "stream_admit_semdedup": "stream-twin:dedup_semdedup",
    "stream_bm25_index_update": "stream-twin:text_bm25_compacted",
    "stream_export_shards": "stream-twin:pipeline_shard_manifest",
    "stream_heavy_hitters": "stream-twin:text_heavy_hitters",
    "stream_session_windows": "stream-twin:w7_sessionize",
    "stream_sliding_daily": "stream-twin:stream_tumbling_daily",
    "stream_upsert_merge": "stream-twin:m1_merge_upsert",
    # env-gated multimodal plumbing
    "mm_binary_metadata": "stub",
    "mm_decode_features": "stub",
    "mm_frame_sample": "stub",
    "mm_near_dup": "stub",
}

# the BASELINE.md-comparable classes surfaced on the compact headline
# line (MERGE upsert, filtered scan+sort, group-by agg, dim join,
# window, plus one representative per LLM-pipeline family)
HEADLINE_QUERIES = [
    "m1_merge_upsert",
    "p4_date_range",
    "a1_rollup_sum",
    "j1_fact_dim_enrich",
    "w4_latest_per_key",
    "w13_gap_fill_locf",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "stream_tumbling_daily",
]


def _steal_jiffies() -> int | None:
    """Aggregate steal-time jiffies from /proc/stat (host-wide, all
    CPUs). Recorded per query so a reader can separate shared-host
    CPU steal from real regressions (r5 VERDICT next #10: identical
    binaries have measured 23 s -> 85 s swings under steal)."""
    try:
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu "):
                    parts = line.split()
                    return int(parts[8]) if len(parts) > 8 else None
    except (OSError, ValueError):
        return None
    return None


# steal-aware per-ATTEMPT retry (r12 VERDICT next #2: two rounds of
# waiting for a clean 340 s host window failed; a clean 0.5-5 s window
# PER QUERY is common even when a clean full-run window never
# arrives). Each attempt is bracketed by its own /proc/stat steal
# sample; while no attempt has come in under CLEAN_STEAL_S of
# in-query steal, keep retrying (to MAX_ATTEMPTS).
CLEAN_STEAL_S = 1.0
MAX_ATTEMPTS = 4


def more_attempts_needed(runs: list[tuple[float, float]]) -> bool:
    """Retry policy over the (wall_s, steal_s) attempts so far:
    always at least best-of-2; keep retrying to the cap while every
    attempt is storm-hit (>= CLEAN_STEAL_S in-query steal); >1 s
    queries get a third attempt (the pre-r13 best-of-3 discipline —
    cross-round walls stay comparable)."""
    if len(runs) >= MAX_ATTEMPTS:
        return False
    if len(runs) < 2:
        return True
    if not any(s < CLEAN_STEAL_S for _, s in runs):
        return True
    return min(w for w, _ in runs) > 1.0 and len(runs) < 3


def choose_attempt(
    runs: list[tuple[float, float]],
) -> tuple[float, float, bool]:
    """The recorded (wall, its steal, clean) is the minimum wall over
    ALL attempts — interference only ever INFLATES a wall, so a
    storm-hit-but-faster attempt is a strictly tighter upper bound on
    the engine's cost than a clean-but-slower one (run 6a821b89:
    a18's 3.1 s attempt carried 1.7 s of steal and a later "clean"
    attempt took 6.5 s — steal is not the only interference channel,
    and rejecting fast attempts for it picks WORSE numbers; min-over-
    all is also the pre-r13 best-of-N semantics, so cross-round walls
    stay comparable). ``clean=False`` flags a recorded wall that
    still carries >= CLEAN_STEAL_S of steal — read it as "upper
    bound, distrust up to that much"."""
    best, best_steal = min(runs)
    return best, best_steal, best_steal < CLEAN_STEAL_S


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from agrobr_spark.benchmark import benchmark_query
    from agrobr_spark.queries import queries
    from agrobr_spark.session import get_spark

    spark = get_spark(app_name="agrobr-bench")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = queries()

    # warm the JVM + parquet footers with a tiny action outside timing,
    # and the Python-worker pool (fork + Arrow init is a fixed cost the
    # first pandas-UDF query would otherwise absorb into its timing)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(32, numPartitions=32).select(_warm("id")).count()

    hz = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100
    steal0 = _steal_jiffies()
    # attempt policy: more_attempts_needed / choose_attempt above
    # (pure + unit-tested — tests/test_benchmark.py)
    timings: dict[str, float] = {}
    steals: dict[str, float] = {}
    attempts_by_q: dict[str, int] = {}
    clean_by_q: dict[str, bool] = {}
    runs_by_q: dict[str, list] = {}
    for name in BENCH_QUERIES:
        fn = catalog.get(name)
        if fn is None:
            continue

        def one_run(fn=fn) -> float:
            """One measured end-to-end run via the library harness
            (build plan, count, clear cache), in seconds."""
            r = benchmark_query(
                name, lambda: fn(spark, sf_dir), iterations=1, warmup=0
            )
            return r.min_time_ms / 1000.0

        runs: list[tuple[float, float]] = []  # (wall_s, steal_s)
        while more_attempts_needed(runs):
            s0 = _steal_jiffies()
            dt = one_run()
            s1 = _steal_jiffies()
            st = (
                (s1 - s0) / hz
                if s0 is not None and s1 is not None
                else 0.0
            )
            runs.append((dt, st))
        best, best_steal, is_clean = choose_attempt(runs)
        timings[name] = round(best, 4)
        steals[name] = round(best_steal, 3)
        attempts_by_q[name] = len(runs)
        clean_by_q[name] = is_clean
        runs_by_q[name] = [
            [round(w, 4), round(s, 3)] for w, s in runs
        ]

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    steal1 = _steal_jiffies()
    steal_total = (
        round((steal1 - steal0) / hz, 3)
        if steal0 is not None and steal1 is not None
        else None
    )

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    # run id stamped into BOTH the detail file and the headline line
    # (r8 verdict nit #2): a committed BENCH_DETAIL_r{N}.json can be
    # matched to the official BENCH_r{N}.json record by id instead of
    # by guessing from totals
    import time

    run_id = f"{int(time.time()):x}-{os.getpid():x}"
    detail = {
        "metric": "headline_queries_total",
        "run_id": run_id,
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "queries": timings,
        # per-query steal is the CHOSEN attempt's in-query steal (the
        # wall you read carries this much distrust), not the sum over
        # attempts; every attempt's (wall, steal) pair is under "runs"
        "steal": {"total_s": steal_total, "queries": steals},
        "attempts": attempts_by_q,
        "clean": clean_by_q,
        "unclean_queries": sorted(
            q for q, ok in clean_by_q.items() if not ok
        ),
        "runs": runs_by_q,
    }
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")

    # ONE compact line for the driver (headline queries only — the
    # full per-query record is in BENCH_DETAIL.json)
    out = {
        "metric": "headline_queries_total",
        "run_id": run_id,
        "value": total,
        "unit": "sec",
        "queries": {
            q: timings[q] for q in HEADLINE_QUERIES if q in timings
        },
        "sf": sf_val,
        "n_queries": len(timings),
        "steal_total_s": steal_total,
        "unclean_n": sum(1 for ok in clean_by_q.values() if not ok),
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(out)
    assert len(line) < 1024, f"headline line must stay <1KB, got {len(line)}"
    print(line)


if __name__ == "__main__":
    main()
