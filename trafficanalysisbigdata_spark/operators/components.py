"""Connected components over a near-duplicate pair graph — the transitive
closure step that turns pairwise "A~B" verdicts into dedup CLUSTERS (chain
A–B–C collapses to one keeper even though A≁C directly). This is the final
stage of a production dedup pipeline; the pairwise operators (dd2/dd4/sim4)
produce its edge list.

Algorithm: iterative min-label propagation with pointer jumping —
label(v) starts as min(v, neighbors), then each round takes the min over
neighbors' labels AND follows label chains one hop (label(label(v))).
Pointer jumping makes chain-shaped components converge in O(log diameter)
rounds instead of O(diameter). Each round is two shuffles (one neighbor
join + one label self-join); the loop runs driver-side with a convergence
check, the standard Spark shape for iterative graph algorithms (GraphX /
GraphFrames do the same under the hood). ``localCheckpoint`` truncates the
growing lineage each round — without it, round k replays rounds 1..k-1.

The fixpoint is exactly "label(v) = min vertex id reachable from v", so a
recursive-CTE reachability closure (DuckDB oracle) checks it bit-for-bit —
rare for an iterative distributed algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrized_edges(pairs: DataFrame, src: str = "doc1", dst: str = "doc2") -> DataFrame:
    """Undirected edge list (v, w): each input pair in both directions."""
    a = pairs.select(F.col(src).alias("v"), F.col(dst).alias("w"))
    b = pairs.select(F.col(dst).alias("v"), F.col(src).alias("w"))
    return a.unionByName(b).distinct()


def connected_components(
    pairs: DataFrame, src: str = "doc1", dst: str = "doc2", max_iter: int = 25
) -> DataFrame:
    """(v, component) for every vertex in ``pairs``; component = min vertex
    id reachable from v. Converges in ≤ max_iter rounds (raises if not —
    silent non-convergence would return wrong clusters)."""
    edges = symmetrized_edges(pairs, src, dst).localCheckpoint(eager=True)
    labels = (
        edges.groupBy("v")
        .agg(F.min("w").alias("nbr_min"))
        .select("v", F.least(F.col("v"), F.col("nbr_min")).alias("l"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.select(F.col("v").alias("w"), F.col("l").alias("lw")), "w")
            .groupBy("v")
            .agg(F.min("lw").alias("nl"))
        )
        stepped = labels.join(nbr, "v", "left").select(
            "v", F.least("l", F.coalesce("nl", "l")).alias("l")
        )
        # pointer jump: follow the label chain one hop
        jumped = (
            stepped.join(
                stepped.select(F.col("v").alias("l"), F.col("l").alias("ll")),
                "l",
                "left",
            )
            .select("v", F.least("l", F.coalesce("ll", "l")).alias("l"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.withColumnRenamed("l", "old")
            .join(jumped, "v")
            .filter(F.col("old") != F.col("l"))
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels.select("v", F.col("l").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
