#!/usr/bin/env python
"""Superlinearity probe: run the most expensive catalog queries on a
K-times replica of the sf0.1 tables and report the time ratio vs
sf0.1 (r3 advice #10 — catch superlinear surprises before a real
cluster does).

Replication is workload-shape-preserving, not naive duplication:

- documents: content gets a per-replica suffix token so replicas do
  NOT become near-duplicates of each other — candidate-pair counts
  scale by K, not K².
- embeddings: vectors are cyclically rotated per replica (direction
  changes, norms preserved) so no cross-replica near-dup pairs form.
- events: event_id/user_id offset per replica; timestamps unchanged
  (key cardinality and state scale by K, window count stays fixed —
  the shape a K-times-larger day of traffic has).
- lineitem: orderkey/linenumber offset per replica (MERGE staging and
  PK-shuffle scale by K).

Usage: python tools/scale_probe.py [K] [out_dir] [q1,q2,...] [mode]
The optional third arg restricts the probe to a comma-separated
subset of PROBE_QUERIES (e.g. the composed pipelines for a 10x run).
The optional fourth arg ``control`` switches document replication to
the NON-COLLIDING control fixture: every token gets a per-replica
prefix, so replicas share NO shingles/bands at all — within-replica
duplicate structure (the planted dups) is preserved verbatim, but
cross-replica candidate pairs cannot form. Pair-stage queries whose
standard-fixture ratio is driven by true duplicate mass (replicas
being near-dups of the planted dups at the band level) drop to
~linear on this fixture; a query still superlinear HERE has a real
algorithmic term (r7 VERDICT next #6).
Prints one JSON line with per-query base/scaled seconds and ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PROBE_QUERIES = [
    "dedup_minhash_lsh",
    "near_dup_embeddings",
    "dedup_survivors",
    "sim_ivf_ann",
    "m1_merge_upsert",
    "w7_sessionize",
    "stream_stateful_dod",
    "stream_tumbling_daily",
    # the composed admission pipelines, not just their parts (r5 #8)
    "pipeline_keep_set",
    "pipeline_admit_batch",
    "pipeline_admit_lsh",
    # round-6 training-prep additions: span dedup (corpus-keyed join),
    # bucketed prefix-sum consumers, multi-table LSH ANN
    "text_span_dedup",
    "pipeline_data_mix",
    "pipeline_pack_chunks",
    "sim_rp_lsh_ann",
    # round-6 late additions: containment (shingle-subset join; the 5×
    # fixture's replication grows TRUE containment mass superlinearly,
    # read the ratio with that in mind) and the streaming dedup idiom
    "text_containment",
    "stream_dedup_exact",
    # event analytics + corpus curation (round-6 close-out)
    "w8_funnel",
    "w9_retention_cohorts",
    "corpus_overlap_matrix",
    "text_tfidf_topk",
    # round-7 additions: corpus-LM scoring (per-term join), CCNet
    # terciles (per-lang window), overlap chunking (shuffle-free)
    "text_unigram_surprise",
    "text_perplexity_buckets",
    "pipeline_chunk_overlap",
    "pipeline_data_mix_temperature",
    "sim_hard_negatives",
    "a15_profile_columns",
    "w12_mad_anomalies",
    "stream_export_shards",
    "stream_admit_lsh",
    # round-8 additions: histogram profiler (bounds pass + one
    # bucketing scan), co-moment correlation (one scan), per-source
    # KL drift (explode + vocab broadcast), exact stratified sample
    # (per-stratum rank window)
    "a16_profile_histogram",
    "a17_profile_correlation",
    "corpus_source_divergence",
    "o7_stratified_sample_exact",
    # streaming KL drift monitor (frozen vocab per batch)
    "stream_source_divergence",
    # SemDeDup (cluster-then-prune pair stage) and DSIR
    # (hashed-unigram importance weights, linear)
    "dedup_semdedup",
    "pipeline_dsir_weights",
    # Bloom-bitmap pruned semi join (bitmap build is dim-side only;
    # fact side stays map-side until the pruned exact semi join)
    "j9_bloom_semi_join",
    # BM25 top-k: query-term filter shrinks the posting stream before
    # the wide tf/df aggregation; linear in corpus size
    "text_bm25_topk",
    # RRF hybrid fusion: both ranker sides are TakeOrderedAndProject
    # top-DEPTH; the fusion join never touches the corpus
    "sim_hybrid_rrf",
    # sequential-Poisson weighted sample: narrow map + top-k heap
    "o8_weighted_sample",
    # round-9 additions: indexed BM25 (best-of-2 reports the bucket-
    # pruned QUERY path — the build amortizes into run 1), fuzzy
    # contamination (broadcast-bench candidate generation + RRF over
    # candidates only), streamed SemDeDup admission (frozen centroids,
    # per-batch cluster-local gating)
    "text_bm25_indexed",
    "text_contamination_fuzzy",
    "stream_admit_semdedup",
    # streamed posting maintenance (per-batch tokenize + bucketed
    # append; corpus never re-tokenized), HLL profile (one scan +
    # exact-verify aggregate), PQ ANN (codes join + LUT sum; the
    # size-adaptive shortlist keeps the re-rank a fixed fraction)
    "stream_bm25_index_update",
    "a18_approx_distinct",
    "sim_pq_ann",
    # exact heavy hitters (bounded-state candidates + candidate-only
    # verify agg) and the bucketized interval-interval overlap join
    "text_heavy_hitters",
    "j10_interval_overlap",
    # streamed MG heavy hitters: per-batch merge into a <=cap counter
    # table + one read-time exact verify
    "stream_heavy_hitters",
    # calendar gap-fill: sequence-explode spine + one LOCF window
    "w13_gap_fill_locf",
    # approx-quantile profiler: GK sketch + fixture-only exact verify
    "a19_approx_quantiles",
    # EWMA smoothing: one keyed window, 8 lag reads, dyadic weights
    "w14_ewma_smooth",
    # rolling z-score: one bounded-frame window over exact decimals
    "w15_rolling_zscore",
    # corpus-wide kNN graph: cluster equi-join, ~n^1.5 pair family
    "sim_knn_graph",
    # ANN recall report: sum of the variants + tiny top-k-row joins
    "sim_ann_recall_report",
    # cluster-balanced diversity sample: assignment + two-level cut
    "pipeline_cluster_sample",
    # positional phrase search: broadcast term filter before any shuffle
    "text_phrase_match",
    # phrase search from the positional index: |terms|-bucket pruned read
    "text_phrase_indexed",
    # mutual-kNN edge filter: self-join of the k·n edge frame
    "sim_mutual_knn",
    # components over mutual edges: pointer-doubling on a sparse graph
    "sim_graph_clusters",
    # streamed DSIR: frozen 1024-bucket models broadcast per micro-batch
    "stream_dsir_weights",
    # salted skew join: fact side salted 16 ways, dim exploded per salt
    "j11_salted_skew_join",
    # skew advisor: stack pass, shuffle carries one row per distinct key
    "a20_skew_advisor",
    # Gopher rule set: zero-shuffle narrow projection
    "text_gopher_rules",
    # hashed-feature linear classifier: explode + broadcast weight join
    "text_quality_classifier",
    # global quality-budget admission via bucketed prefix sum
    "pipeline_token_budget",
    # streamed per-window HLL distinct: fixed-size sketch state
    "stream_approx_distinct",
    # best-snippet window: hits x hits per-doc self-join over query terms only
    "text_snippets",
    # RM3 expansion: two bounded heaps + second broadcast-term tf pass
    "text_bm25_rm3",
    # 5 unrolled power iterations over the k*n edge frame
    "graph_pagerank",
    # per-doc gate matrix: three doc-keyed joins of verified gate frames
    "pipeline_admission_evidence",
    # C4 line rules: zero-shuffle narrow projection
    "text_line_filter",
    # pinned-values pivot as one conditional aggregate
    "a21_pivot",
    # stream-stream interval join, watermark-bounded state
    "stream_stream_join",
    # exact join-size prediction: shuffle carries key cardinality only
    "a22_join_size_advisor",
    # 16-row mergeable manifest aggregate over two md5s + token count
    "pipeline_shard_manifest",
    # bigram LM: transform-over-sequence transitions, two keyed joins
    "text_bigram_surprise",
    # per-batch partial manifests merged into a 16-row store
    "stream_shard_manifest",
    # greedy MMR over a bounded shortlist; corpus work = one broadcast scan
    "sim_mmr_rerank",
    # gaps-and-islands over the tiny anomalous-day frame
    "w16_anomaly_intervals",
    # snippet hits from |query terms| pruned positional buckets
    "text_snippets_indexed",
    # same components fixpoint as dedup_survivors, quality ranking key
    "dedup_survivors_quality",
    # round-10 additions: frozen-centroid one-shot graph (the stream's
    # batch twin), incrementally-maintained graph (corpus build + 3
    # per-batch affected-node folds), PageRank with one per-iteration
    # dangling scalar, and the decorrelated scalar-subquery classic
    "sim_knn_graph_frozen",
    "stream_knn_graph_update",
    "graph_pagerank_redistributed",
    "tpch_q17",
    # full posting-index lifecycle: build + 3 staged epochs + compaction
    # + one bucket-pruned query, hash-checked against the scan oracle
    "text_bm25_compacted",
    # incremental cluster labels: per-batch components over touched
    # components only, hash-checked vs the recursive-CTE fixpoint
    "stream_graph_clusters_update",
    # classic 3-table selective join + heap
    "tpch_q3",
    # 6-table join-order stress: region prune upstream of facts
    "tpch_q5",
    # RM3 from the index: two pruned tf reads + 5 doc-store point reads
    "text_bm25_rm3_indexed",
    # regex+split+bytes projection into a (lang x source) aggregate
    "text_tokenizer_fertility",
    # every dedup method once + four single-row aggregates
    "corpus_dedup_rate_report",
    # round-11 additions: the nested-IN/correlated-scalar decorrelation
    # classic (left-semi chain, two lineitem scans), within-cluster
    # PageRank (labels + induced edges + 5 unrolled iterations), and
    # its incrementally-maintained streamed twin (corpus build + 3
    # per-batch edge/label/rank folds)
    "tpch_q20",
    "graph_pagerank_components",
    "stream_pagerank_update",
    # round-11 TPC-H close-out: correlated MIN-equality (Q2), having-
    # semi (Q18), EXISTS/NOT-EXISTS self-join pair (Q21), one-shot
    # scalar + anti-join (Q22) — the remaining decorrelation shapes
    "tpch_q2",
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",
]

# every table any probe query loads
NEEDED = ("documents", "embeddings", "events", "lineitem", "orders",
          "region", "nation", "customer", "supplier", "part")


def build_scaled(spark, k: int, out: str, mode: str = "collide") -> None:
    import pyspark.sql.functions as F

    from agrobr_spark.io import load

    os.makedirs(out, exist_ok=True)

    docs = load(spark, BASE, "documents")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] or 0
    parts = []
    for r in range(k):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * (max_doc + 1)))
        if r and mode == "control":
            # non-colliding control: rename EVERY token per replica —
            # shingle sets across replicas become disjoint (no band
            # collisions, no cross-replica containment), while the
            # within-replica duplicate structure is preserved exactly
            p = p.withColumn(
                "text",
                F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"x -> concat('r{r}_', x)), ' ')"
                ),
            )
        elif r:
            p = p.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" replica{r}"))
            )
        parts.append(p)
    _union(parts).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = load(spark, BASE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] or 0
    parts = []
    for r in range(k):
        p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * (max_vec + 1)))
        if r:
            rot = r % dim
            p = p.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ),
            )
        parts.append(p)
    _union(parts).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    ev = load(spark, BASE, "events")
    max_eid = ev.agg(F.max("event_id")).collect()[0][0] or 0
    max_uid = ev.agg(F.max("user_id")).collect()[0][0] or 0
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(r * (max_eid + 1)))
        .withColumn("user_id", F.col("user_id") + F.lit(r * (max_uid + 1)))
        for r in range(k)
    ]
    _union(parts).write.mode("overwrite").parquet(f"{out}/events.parquet")

    li = load(spark, BASE, "lineitem")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0] or 0
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * (max_ok + 1)))
        for r in range(k)
    ]
    _union(parts).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    for name in NEEDED:
        dst = f"{out}/{name}.parquet"
        if not os.path.exists(dst):
            src = f"{BASE}/{name}.parquet"
            # a Spark-written table is a DIRECTORY named *.parquet
            # (io.load reads both) — copy accordingly (r5 ADVICE)
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)


def _union(parts):
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def time_queries(spark, sf_dir: str, names=None) -> dict[str, float]:
    from agrobr_spark.queries import queries

    catalog = queries()
    out: dict[str, float] = {}
    for name in names or PROBE_QUERIES:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            catalog[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out[name] = round(best, 4)
    return out


def stream_batch_counts(spark, sf_dir: str) -> dict[str, int]:
    """Micro-batch count per streaming probe query — direct evidence
    for (or against) the file-fragmentation hypothesis: a ratio driven
    by file count shows up as batch count growing with K, a ratio
    driven by data volume does not (r6 VERDICT next #3). AvailableNow
    with no maxFilesPerTrigger takes every available file in ONE
    batch, so this should print 1 at every K."""
    from agrobr_spark.streaming.stateful import day_over_day_flags
    from agrobr_spark.streaming.windows import (
        read_events_stream,
        tumbling_daily_agg,
    )

    shapes = {
        "stream_tumbling_daily": lambda ev: (tumbling_daily_agg(ev), "complete"),
        "stream_stateful_dod": lambda ev: (
            day_over_day_flags(
                ev.select("event_id", "ts", "event_type", "value")
            ),
            "append",
        ),
    }
    out: dict[str, int] = {}
    for name, build in shapes.items():
        res, mode = build(read_events_stream(spark, sf_dir))
        q = (
            res.writeStream.format("memory")
            .queryName(f"probe_mb_{name}")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        if q.isActive:
            q.stop()
        out[name] = sum(
            1 for p in q.recentProgress if p["numInputRows"] > 0
        )
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/agrobr_scale{k}"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else PROBE_QUERIES
    mode = sys.argv[4] if len(sys.argv) > 4 else "collide"
    from agrobr_spark.session import get_spark

    spark = get_spark(app_name="agrobr-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, k, out, mode)
    base = time_queries(spark, BASE, names)
    scaled = time_queries(spark, out, names)
    report = {
        "k": k,
        "mode": mode,
        "queries": {
            n: {
                "base_s": base[n],
                "scaled_s": scaled[n],
                "ratio": round(scaled[n] / base[n], 2) if base[n] else None,
            }
            for n in names
        },
    }
    if any(n.startswith("stream_") for n in names):
        report["stream_batches"] = {
            "base": stream_batch_counts(spark, BASE),
            "scaled": stream_batch_counts(spark, out),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
