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
    timings: dict[str, float] = {}
    steals: dict[str, float] = {}
    attempts_by_q: dict[str, int] = {}
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

        # best-of-N: the shared host shows heavy CPU steal at times; min
        # over repeated runs reports the engine's cost, not the noise.
        # Two runs normally; queries still over a second after two runs
        # get a third — exactly the ones a noisy window distorts most.
        best = None
        attempts = 0
        s_before = _steal_jiffies()
        for attempt in range(3):
            dt = one_run()
            attempts += 1
            best = dt if best is None else min(best, dt)
            if attempt == 1 and best <= 1.0:
                break
        s_after = _steal_jiffies()
        steal_s = (
            (s_after - s_before) / hz
            if s_before is not None and s_after is not None
            else 0.0
        )
        if steal_s > max(1.0, best):
            # the host stole more CPU time than the best wall clock —
            # the number is noise; one extra attempt in (hopefully) a
            # calmer window
            best = min(best, one_run())
            attempts += 1
            s2 = _steal_jiffies()
            if s2 is not None and s_before is not None:
                steal_s = (s2 - s_before) / hz
        timings[name] = round(best, 4)
        steals[name] = round(steal_s, 3)
        attempts_by_q[name] = attempts

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
        "steal": {"total_s": steal_total, "queries": steals},
        "attempts": attempts_by_q,
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
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(out)
    assert len(line) < 1024, f"headline line must stay <1KB, got {len(line)}"
    print(line)


if __name__ == "__main__":
    main()
