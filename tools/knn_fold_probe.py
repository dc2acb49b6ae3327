#!/usr/bin/env python
"""Per-batch fold cost of the incremental kNN graph store vs corpus
size — the bespoke probe behind SCALING.md's incremental-store rows
(r10 VERDICT next #2: probe edge-bucket pruning IN THE REGIME WHERE
IT IS REAL, with bytes-read evidence, not just wall clock).

A FIXED batch is folded into a K-times replica of the sf0.1 embedding
corpus (rotation + sign-flip per replica: direction changes, norms
preserved, no cross-replica near-dup pairs, distinct up to 128×).
Cluster DENSITY is pinned across scales (centroids = n / DENSITY, the
100 TB sizing rule), so the affected set — touched clusters × density
— is corpus-INDEPENDENT by design, and the edge buckets follow the
manifest rule (~NODES_PER_BUCKET nodes each). The pruning regime is
|affected| × NODES_PER_BUCKET ≪ n: there, the balde-pruned edge read
touches a corpus-independent VOLUME, so fold wall AND bytes-read stay
flat while the corpus (and the edge table) keep growing.

Bytes-read accounting: the fold's edge scans carry
``PartitionFilters: [balde IN ...]`` (plan-asserted by
tests/test_operators.py::test_knn_store_update_touches_only_affected),
so only the selected ``balde=…`` partition directories are read; this
probe sums their on-disk file sizes (selected vs total) — filesystem
ground truth for the scan volume, independent of wall-clock noise.

Usage: python tools/knn_fold_probe.py [K1,K2,...] [batch_size] [density]
Defaults: 5,20,40 / 1 / 20. Prints one JSON line per K with
fold walls (edge/label/rank), |affected|, buckets touched/total, and
edge-table bytes selected/total.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _replicate_embeddings(spark, k: int, out: str):
    """K-times replica, rotation + sign-flip (see module docstring)."""
    import pyspark.sql.functions as F

    from agrobr_spark.io import load

    emb = load(spark, BASE, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] or 0
    parts = []
    for r in range(k):
        p = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(r * (max_vec + 1))
        )
        rot = r % dim
        if rot:
            p = p.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", rot + 1, dim - rot),
                    F.slice("embedding", 1, rot),
                ),
            )
        if (r // dim) % 2:
            p = p.withColumn(
                "embedding",
                F.transform("embedding", lambda x: -x),
            )
        parts.append(p)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(out)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _part_bytes(
    store_dir: str, sub: str, prefix: str, buckets: set[int] | None
) -> int:
    root = os.path.join(store_dir, sub)
    total = 0
    for d in os.listdir(root):
        if not d.startswith(f"{prefix}="):
            continue
        b = int(d.split("=", 1)[1])
        if buckets is None or b in buckets:
            total += _dir_bytes(os.path.join(root, d))
    return total


def _edge_bytes(store_dir: str, buckets: set[int] | None) -> int:
    return _part_bytes(store_dir, "edges", "balde", buckets)


def probe(spark, k: int, batch_size: int, density: int) -> dict:
    import pyspark.sql.functions as F

    from agrobr_spark.store.table import ParquetStore
    from agrobr_spark.operators.knn_store import (
        NODES_PER_BUCKET,
        _read_meta,
        build_graph_labels,
        build_graph_pageranks,
        build_knn_graph_index,
        update_graph_labels_frame,
        update_graph_pageranks_frame,
        update_knn_graph_frame,
    )

    work = tempfile.mkdtemp(prefix=f"knn_probe_{k}x_")
    try:
        emb_path = os.path.join(work, "embeddings.parquet")
        _replicate_embeddings(spark, k, emb_path)
        emb = spark.read.parquet(emb_path)
        # the FIXED batch: base-replica ids [0, batch_size) — identical
        # vectors at every K, so the affected set is comparable
        batch = emb.filter(F.col("vec_id") < batch_size).localCheckpoint(
            eager=True
        )
        corpus = emb.filter(F.col("vec_id") >= batch_size)
        n = corpus.count()
        store = os.path.join(work, "knn")
        t0 = time.time()
        build_knn_graph_index(
            corpus,
            store,
            k=5,
            n_probe=2,
            n_centroids=max(4, n // density),
        )
        build_graph_labels(spark, store, corpus.select("vec_id"))
        build_graph_pageranks(spark, store)
        t_build = time.time() - t0

        nb = int(_read_meta(spark, store)["edge_buckets"])

        t0 = time.time()
        staged = update_knn_graph_frame(
            spark, batch, store, k=5, n_probe=2
        )
        t_edge = time.time() - t0
        affected = [
            r["vec_id"]
            for r in staged.select("vec_id").distinct().collect()
        ]
        edge_buckets = {v % nb for v in affected}
        # measured AFTER the fold so selected/total sum the same tree
        total_bytes = _edge_bytes(store, None)

        t0 = time.time()
        fold_probe: dict = {}
        relabeled = update_graph_labels_frame(
            spark,
            staged.select("vec_id").unionByName(batch.select("vec_id")),
            store,
            probe=fold_probe,
        )
        t_label = time.time() - t0
        touched_members = [
            r["vec_id"]
            for r in relabeled.select("vec_id").distinct().collect()
        ]
        rank_buckets = {v % nb for v in touched_members}
        # labels-read volume (r12): the fold's primary-labels legs are
        # pruned to the touched members' vec_id buckets (rank_buckets
        # ⊇ the seed buckets), the componente→members leg to the
        # cbalde buckets of the PRE-fold touched components — taken
        # verbatim from the fold via its probe hook, not re-derived
        # from the post-fold labels (r12 ADVICE #3: a fold that
        # dissolves a component would misstate the read volume)
        comp_buckets = {
            c % nb for c in fold_probe["touched_components"]
        }

        t0 = time.time()
        update_graph_pageranks_frame(spark, relabeled, store)
        t_rank = time.time() - t0

        # isolate the PRUNED EDGE SCAN from the fold's other terms
        # (centroid assign, candidate join, re-rank window, MERGE
        # rewrite + its commit listing): if this stays flat while the
        # fold wall grows, the growth is metadata/commit overhead at
        # local-FS toy scale (driver file listings are O(#partition
        # dirs)), not data volume — the bytes columns are the ground
        # truth either way
        from pyspark.sql import functions as FF

        ids_df = staged.select("vec_id").distinct()
        t0 = time.time()
        edges_store = ParquetStore(
            spark, os.path.join(store, "edges"),
            ("vec_id", "posicao"), partition_col="balde",
        )
        n_pruned = (
            edges_store.read()
            .filter(FF.col("balde").isin(list(edge_buckets)))
            .join(FF.broadcast(ids_df), "vec_id", "semi")
            .count()
        )
        t_pruned_read = time.time() - t0
        t0 = time.time()
        n_full = edges_store.read().count()
        t_full_read = time.time() - t0

        return {
            "pruned_read_rows": n_pruned,
            "pruned_read_s": round(t_pruned_read, 2),
            "full_read_rows": n_full,
            "full_read_s": round(t_full_read, 2),
            "loadavg": round(os.getloadavg()[0], 1),
            "k": k,
            "n_corpus": n,
            "batch": batch_size,
            "density": density,
            "nodes_per_bucket": NODES_PER_BUCKET,
            "n_buckets": nb,
            "affected": len(affected),
            "regime_lhs_affected_x_npb": len(affected) * NODES_PER_BUCKET,
            "touched_component_members": len(touched_members),
            # straight from the fold's probe hook: the journaled
            # delta's row count and the moved rows' OLD cbalde
            # buckets — the secondary-merge write amplification the
            # extra_partitions dedup pays for (r13 review: these were
            # populated but unread)
            "n_delta": fold_probe["n_delta"],
            "moved_from_buckets": len(fold_probe["moved_from_buckets"]),
            "edge_buckets_touched": len(edge_buckets),
            "rank_buckets_touched": len(rank_buckets),
            "edge_bytes_total": total_bytes,
            "edge_bytes_selected": _edge_bytes(store, edge_buckets),
            "rank_edge_bytes_selected": _edge_bytes(store, rank_buckets),
            "labels_bytes_total": _part_bytes(store, "labels", "balde", None),
            "labels_bytes_selected": _part_bytes(
                store, "labels", "balde", rank_buckets
            ),
            "labels_by_comp_bytes_total": _part_bytes(
                store, "labels_by_comp", "cbalde", None
            ),
            "labels_by_comp_bytes_selected": _part_bytes(
                store, "labels_by_comp", "cbalde", comp_buckets
            ),
            "build_s": round(t_build, 2),
            "fold_edge_s": round(t_edge, 2),
            "fold_label_s": round(t_label, 2),
            "fold_rank_s": round(t_rank, 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "5,20,40").split(",")]
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    density = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from agrobr_spark.session import get_spark

    spark = get_spark(app_name="knn-fold-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k in ks:
        print(json.dumps(probe(spark, k, batch_size, density)), flush=True)


if __name__ == "__main__":
    main()
