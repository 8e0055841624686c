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


def _persistent_rdd_ids(sc) -> set[int]:
    """Ids of currently-persisted RDDs (localCheckpoint stores its blocks as
    a persisted RDD; this is how we find — and later free — them)."""
    try:
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
    except Exception:  # noqa: BLE001 — introspection only; degrade to no-op
        return set()


def _unpersist_rdds(sc, ids: set[int]) -> None:
    """Free the cached blocks behind previously-checkpointed rounds. Without
    this, every round of every dedup-closure run leaks one label set for the
    session lifetime (a real memory leak in a long-lived driver). Best-effort:
    failure just means the old behavior (blocks freed at session end)."""
    if not ids:
        return
    try:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in ids:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist(False)
    except Exception:  # noqa: BLE001
        pass


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
    silent non-convergence would return wrong clusters).

    Convergence is decided from the round's OWN output: ``old_l`` rides
    along through the neighbor-min and pointer-jump selects, and
    ``max(l != old_l)`` over the just-checkpointed result replaces the
    former separate labels⋈jumped count — one cheap scan over cached blocks
    instead of an extra shuffle join + count action per round. Each round
    also unpersists the previous round's checkpointed blocks, so peak cached
    state is one label set + the edge list, not O(rounds)."""
    sc = pairs.sparkSession.sparkContext
    pre = _persistent_rdd_ids(sc)
    edges = symmetrized_edges(pairs, src, dst).localCheckpoint(eager=True)
    labels = (
        edges.groupBy("v")
        .agg(F.min("w").alias("nbr_min"))
        .select("v", F.least(F.col("v"), F.col("nbr_min")).alias("l"))
        .localCheckpoint(eager=True)
    )
    setup_ids = _persistent_rdd_ids(sc) - pre
    round_ids: set[int] = set()
    try:
        for _ in range(max_iter):
            before = _persistent_rdd_ids(sc)
            nbr = (
                edges.join(labels.select(F.col("v").alias("w"), F.col("l").alias("lw")), "w")
                .groupBy("v")
                .agg(F.min("lw").alias("nl"))
            )
            stepped = labels.join(nbr, "v", "left").select(
                "v",
                F.col("l").alias("old_l"),
                F.least("l", F.coalesce("nl", "l")).alias("l"),
            )
            # pointer jump: follow the label chain one hop. The checkpoint is
            # LAZY (r14 optimization pass): the convergence aggregate below is
            # the action that materializes it, so each round runs ONE job
            # (materialize + check) instead of two (eager checkpoint, then
            # check over the cached blocks) — A/B'd ~1.5× on the dd6/pipe12
            # round loop, identical labels.
            jumped = (
                stepped.join(
                    stepped.select(F.col("v").alias("l"), F.col("l").alias("ll")),
                    "l",
                    "left",
                )
                .select("v", "old_l", F.least("l", F.coalesce("ll", "l")).alias("l"))
                .localCheckpoint(eager=False)
            )
            changed = jumped.agg(
                F.max((F.col("l") != F.col("old_l")).cast("int")).alias("c")
            ).first()["c"]
            # ids appear once the checkpoint materializes — read them AFTER
            # the action above, or this round's blocks would be unprotected
            # from the next round's cleanup
            new_ids = _persistent_rdd_ids(sc) - before
            # the previous round's labels are no longer reachable — free them
            # (never the ids backing `jumped`, which the caller may consume)
            _unpersist_rdds(sc, round_ids - new_ids)
            round_ids = new_ids
            labels = jumped.drop("old_l")
            if not changed:
                return labels.select("v", F.col("l").alias("component"))
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    finally:
        # edges + round-0 labels back only intermediate rounds, never the
        # returned DataFrame (its lineage stops at its own checkpoint)
        _unpersist_rdds(sc, setup_ids - round_ids)
