#!/usr/bin/env python
"""Interleaved A/B: old 3-join connected_components vs new 2-join+self-loop
form, on dd6's real edge set at sf0.1, min-of-N inside one JVM (the r14
measurement discipline). Also asserts identical labels once per variant."""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def old_connected_components(pairs, src="doc1", dst="doc2", max_iter=25):
    from trafficanalysisbigdata_spark.operators.components import (
        _persistent_rdd_ids,
        _unpersist_rdds,
        symmetrized_edges,
    )

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
    round_ids = set()
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
            new_ids = _persistent_rdd_ids(sc) - before
            _unpersist_rdds(sc, round_ids - new_ids)
            round_ids = new_ids
            labels = jumped.drop("old_l")
            if not changed:
                return labels.select("v", F.col("l").alias("component"))
        raise RuntimeError("no converge")
    finally:
        _unpersist_rdds(sc, setup_ids - round_ids)


def main() -> None:
    from pyspark.sql import SparkSession

    from trafficanalysisbigdata_spark.operators.components import (
        connected_components as new_cc,
    )
    from trafficanalysisbigdata_spark.operators.dedup import minhash_lsh_scores
    from trafficanalysisbigdata_spark.plans.queries_dedup import DD2_MAX_BUCKET

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-cc")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def edges():
        return (
            minhash_lsh_scores(docs, max_bucket=DD2_MAX_BUCKET)
            .filter(F.col("jaccard") >= 0.5)
            .select("doc1", "doc2")
        )

    # one-time identical-labels check
    got_old = {(r.v, r.component) for r in old_connected_components(edges()).collect()}
    got_new = {(r.v, r.component) for r in new_cc(edges()).collect()}
    assert got_old == got_new, f"LABEL MISMATCH: {len(got_old)} vs {len(got_new)}"
    print(f"labels identical ({len(got_new)} vertices)", flush=True)

    # warm edge path once
    ts = {"old": [], "new": []}
    for i in range(n):
        for name, fn in (("old", old_connected_components), ("new", new_cc)):
            t0 = time.perf_counter()
            fn(edges()).write.format("noop").mode("overwrite").save()
            ts[name].append(time.perf_counter() - t0)
    for name, runs in ts.items():
        print(
            f"{name}: min {min(runs):.3f}  " + " ".join(f"{t:.3f}" for t in runs),
            flush=True,
        )


if __name__ == "__main__":
    main()
