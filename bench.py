#!/usr/bin/env python
"""Headline benchmark: run the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query picks mirror BASELINE.md's operation classes re-expressed on
Spark: MERGE-upsert throughput (m1), filtered scan + sort (p4),
group-by rollups (a1/a5/a6), fact<-dim broadcast join (j1), window
latest-per-key (w4), text pipeline + dedup + similarity (the
training-data extensions). Each query is fully materialized via a
count-ish action so the JVM does real work; timings are per-query
wall seconds on a warmed session.
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    "a11_grouping_sets",
    "a15_profile_columns",
    "p4_date_range",
    "w1_pct_change",
    "w4_latest_per_key",
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
    "text_chunk",
    "text_pii_scrub",
    "text_repetition_filter",
    "text_span_dedup",
    "text_containment",
    "pipeline_data_mix",
    "pipeline_pack_chunks",
    "sim_cosine_topk",
    "sim_ivf_ann",
    "sim_rp_lsh_ann",
    "sim_hard_negatives",
    "stream_tumbling_daily",
    "stream_stateful_dod",
    "stream_dedup_exact",
    "pipeline_df_index_update",
    "corpus_overlap_matrix",
    "text_tfidf_topk",
    "w8_funnel",
    "w10_rolling_7d",
    "w12_mad_anomalies",
    "text_unigram_surprise",
    "text_perplexity_buckets",
    "pipeline_chunk_overlap",
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
    for name in BENCH_QUERIES:
        fn = catalog.get(name)
        if fn is None:
            continue
        # best-of-N: the shared host shows heavy CPU steal at times; min
        # over repeated runs reports the engine's cost, not the noise.
        # Two runs normally; queries still over a second after two runs
        # get a third — exactly the ones a noisy window distorts most.
        best = None
        s_before = _steal_jiffies()
        for attempt in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            assert n >= 0
            # each run is timed self-contained: drop any caches it left
            spark.catalog.clearCache()
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
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            s2 = _steal_jiffies()
            if s2 is not None and s_before is not None:
                steal_s = (s2 - s_before) / hz
        timings[name] = round(best, 4)
        steals[name] = round(steal_s, 3)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    steal1 = _steal_jiffies()
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if steal0 is not None and steal1 is not None:
        # host-wide steal jiffies over the bench, in seconds — a large
        # value labels the wall clocks above as noise-inflated
        out["steal"] = {
            "total_s": round((steal1 - steal0) / hz, 3),
            "queries": steals,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
