"""Connected components over a pair/edge list — duplicate-cluster
resolution for dedup pipelines.

The dedup family (MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine — queries/dedup.py) emits near-duplicate PAIRS; an actual
pipeline must resolve pairs into duplicate CLUSTERS to keep one
survivor per cluster. The reference has no analog (its dedup is a PK
upsert, duckdb_store.py:417-461) — this is part of the
training-data-pipeline extension surface.

Algorithm: iterative min-label propagation. Each node starts labeled
with its own id; every iteration each node takes the minimum label in
its closed neighborhood; stop when no label changes. Per iteration:
one join edges⋈labels + one min-aggregate — two shuffles on the node
key, nothing ever materializes more than O(|V| + |E|) rows.

Scale posture (100 TB):
- Iterations: 2-4 rounds on dense near-dup clusters (quasi-cliques);
  pointer-doubling shortcutting (on by default — one extra label
  self-join per round) accelerates long chains.
- **Per-round severance is a PARQUET WRITE + READ-BACK, not a
  checkpoint.** This is deliberate and measured, not stylistic: with
  `localCheckpoint` (lazy OR eager) and even reliable
  `df.checkpoint()`, round wall-clock DOUBLES every iteration once
  the loop passes ~15 rounds (0.6 s → 93 s by round 20 on a
  1,704-row label table at sf0.1, flat row counts, flat
  optimizedPlan, flat RDD lineage — the recomputation hides below
  every surface the API exposes, and at bench scale it eventually
  dies with `BigInteger would overflow supported range`). The
  parquet round-trip gives a genuinely fresh scan with fresh
  attribute ids and holds a flat ~0.6 s/round through convergence
  (38 rounds, 27.7 s, measured round 9). It is also the standard
  Pregel-style materialization a 100 TB iterative job does anyway —
  each round's label table is a real table.
- The convergence probe is a count over the round's (1-partition)
  parquet — a scalar aggregate; data never reaches the driver.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 100,
    shortcut: bool = True,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns (id, componente): one row per distinct node appearing in
    ``edges``, where ``componente`` is the smallest node id reachable
    from ``id`` — the canonical cluster representative. The returned
    frame is materialized (localCheckpoint) so it stays valid after
    the scratch directory is cleaned up.

    ``shortcut`` adds pointer-doubling each round:
    ``label(u) <- min(label(u), label(label(u)))`` — one extra self
    equi-join on the label table. Labels only ever take values of
    nodes REACHABLE from u (neighbor-min propagates reachable minima
    inductively), so the shortcut jumps along reachable chains and
    the fixpoint is unchanged. Dedup graphs are quasi-cliques where
    convergence takes 2-4 rounds; sparse long-path graphs (e.g. the
    mutual-kNN retrieval graph) have been measured to need ~40.

    ``scratch_dir``: where per-round label tables land. Defaults to a
    driver-local temp dir — correct for local[*] sessions; on a real
    cluster pass a shared filesystem path (the same place any
    iterative job would put its per-step tables).

    (A batched steps-per-sync variant was measured and REMOVED: round
    cost is real propagation work + the write, not job launches, so
    composing 3 lazy steps per sync saved nothing — 36.4 s vs 35.9 s
    for sim_graph_clusters at sf0.1.)"""
    import shutil

    spark = edges.sparkSession
    master = spark.sparkContext.master or ""
    if scratch_dir is None and not master.startswith("local"):
        # a driver-local mkdtemp is invisible to remote executors: the
        # per-round parquet writes would fail (or worse, scatter over
        # per-node local disks) with a confusing IO error deep in round
        # 1 — fail loud at the API boundary instead (r9 ADVICE)
        raise ValueError(
            "connected_components: on a non-local master "
            f"({master!r}) pass scratch_dir= on a SHARED filesystem "
            "(HDFS/S3/NFS); the default driver-local temp dir is only "
            "valid for local[*] sessions"
        )
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # symmetric edges are reused every round: materialize once (a
    # single non-iterated checkpoint is safe — the doubling pathology
    # documented above needs a chain of checkpoints feeding self-joins)
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "componente", F.col("id")
    )
    own_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="components_")

    def step(lbl: DataFrame) -> DataFrame:
        neighbor_min = (
            sym.join(lbl, sym["b"] == lbl["id"])
            .groupBy("a")
            .agg(F.min("componente").alias("viz_min"))
        )
        updated = lbl.join(
            neighbor_min, lbl["id"] == neighbor_min["a"], "left"
        ).select(
            "id",
            F.col("componente").alias("_old"),
            F.least(
                F.col("componente"),
                F.coalesce("viz_min", F.col("componente")),
            ).alias("componente"),
        )
        if shortcut:
            upd2 = updated.select(
                "id", "_old", F.col("componente").alias("_c")
            )
            enc = updated.select(
                F.col("id").alias("_c"),
                F.col("componente").alias("_scomp"),
            )
            updated = upd2.join(enc, "_c", "left").select(
                "id",
                "_old",
                F.least(
                    F.col("_c"), F.coalesce("_scomp", F.col("_c"))
                ).alias("componente"),
            )
        return updated

    try:
        for i in range(max_iter):
            updated = step(labels)
            # parquet severance (see module docstring): write the
            # round's label table and read it back fresh; alternating
            # slots so the read of round k never races the overwrite
            # of round k+1
            path = f"{scratch}/r{i % 2}"
            updated.write.mode("overwrite").parquet(path)
            updated = spark.read.parquet(path)
            changed = updated.filter(
                F.col("componente") != F.col("_old")
            ).count()
            labels = updated.select("id", "componente")
            if changed == 0:
                # materialize off the scratch files before cleanup
                return labels.localCheckpoint(eager=True)
        # silent non-convergence would hand back WRONG components — the
        # one failure mode worse than a loud stop.
        raise RuntimeError(
            f"connected_components: labels still changing after {max_iter} "
            "iterations; raise max_iter for extreme-diameter graphs"
        )
    finally:
        if own_scratch:
            shutil.rmtree(scratch, ignore_errors=True)
