#!/usr/bin/env python
"""Round-15 continuation interleaved A/Bs (one JVM, min-of-N, results
asserted identical once per experiment before any timing):

  pipe14   old: sh = doc_shingle_sets(docs) ⋈ split(doc_id, is_train)
           new: is_train attached as the derivable _hash_frac expression
                (no join — the static plan drops one BroadcastHashJoin per
                replicated shingle subtree)

  minhash  old: explode(token set) -> groupBy(doc_id).agg(min(md5(i|t)))
           new: row-local array_min(transform(arr, md5(i|t))) — no explode,
                no aggregate; timed through the full dd2 pipeline shape

Usage: python scripts/ab_r15c.py {pipe14|minhash} [N]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def build_spark():
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[32]")
        .appName("ab-r15c")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("AB_BIG"):  # rehearsal-scale corpora (local[32] JVM
        builder = builder.config("spark.driver.memory", "48g")  # holds all executors)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# ---------------------------------------------------------------- pipe14


def pipe14_variant(spark, use_join: bool, fanout: bool = False, docs=None) -> DataFrame:
    from trafficanalysisbigdata_spark.io import fan_out_small_scan
    from trafficanalysisbigdata_spark.operators.dedup import (
        df_capped,
        doc_shingle_sets,
    )
    from trafficanalysisbigdata_spark.plans.queries_pipeline import _hash_frac

    if docs is None:
        docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    if fanout:
        docs = fan_out_small_scan(docs.select("doc_id", "source", "text"), "doc_id")
    split = docs.select(
        "doc_id", "source", (_hash_frac(F.col("doc_id")) < 0.9).alias("is_train")
    )
    if use_join:
        sh = doc_shingle_sets(docs).join(
            split.select("doc_id", "is_train"), "doc_id"
        )
    else:
        sh = doc_shingle_sets(docs).withColumn(
            "is_train", _hash_frac(F.col("doc_id")) < 0.9
        )
    ev = sh.filter(~F.col("is_train")).select("doc_id", "token")
    n_ev = ev.select("doc_id").distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    evc = df_capped(ev, n_ev, 0.05, 256).withColumnRenamed("doc_id", "e")
    sizes = evc.groupBy("e").agg(F.count(F.lit(1)).alias("n_e"))
    tr = sh.filter(F.col("is_train")).select(F.col("doc_id").alias("t"), "token")
    common = (
        tr.join(evc, "token").groupBy("e", "t").agg(F.count(F.lit(1)).alias("n_common"))
    )
    best = (
        common.join(sizes, "e")
        .groupBy("e")
        .agg(F.max(F.col("n_common").cast("double") / F.col("n_e")).alias("max_cont"))
    )
    return (
        best.join(split.select(F.col("doc_id").alias("e"), "source"), "e")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_eval_scored"),
            F.sum((F.col("max_cont") >= 0.8).cast("bigint")).alias("n_leaked"),
            F.round(F.sum("max_cont"), 4).alias("sum_max_containment"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------- dd6/pipe12


def cc_repart(pairs, src="doc1", dst="doc2", max_iter=25):
    """connected_components with the edge union re-keyed through one
    AQE-coalesced exchange before the eager checkpoint, so the checkpointed
    partition count tracks the edge DATA size instead of whatever the
    caller's derivation pipeline happened to leave (a fanned-out derivation
    leaves cores-many near-empty partitions, and every label round pays a
    task per partition per stage)."""
    from trafficanalysisbigdata_spark.operators.components import (
        _persistent_rdd_ids,
        _unpersist_rdds,
    )

    sc = pairs.sparkSession.sparkContext
    pre = _persistent_rdd_ids(sc)
    edges = (
        pairs.select(F.col(src).alias("v"), F.col(dst).alias("w"))
        .unionByName(pairs.select(F.col(dst).alias("v"), F.col(src).alias("w")))
        .repartition(F.col("w"))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy("v")
        .agg(F.min("w").alias("nbr_min"))
        .select("v", F.least(F.col("v"), F.col("nbr_min")).alias("l"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("l").alias("s")).first()["s"]
    setup_ids = _persistent_rdd_ids(sc) - pre
    round_ids = set()
    try:
        for _ in range(max_iter):
            before = _persistent_rdd_ids(sc)
            nbr = (
                edges.join(labels.select(F.col("v").alias("w"), F.col("l").alias("lw")), "w")
                .select("v", "lw")
                .unionByName(labels.select("v", F.col("l").alias("lw")))
                .groupBy("v")
                .agg(F.min("lw").alias("l"))
            )
            jumped = (
                nbr.join(
                    nbr.select(F.col("v").alias("l"), F.col("l").alias("ll")),
                    "l",
                    "left",
                )
                .select("v", F.least("l", F.coalesce("ll", "l")).alias("l"))
                .localCheckpoint(eager=False)
            )
            new_sum = jumped.agg(F.sum("l").alias("s")).first()["s"]
            new_ids = _persistent_rdd_ids(sc) - before
            _unpersist_rdds(sc, round_ids - new_ids)
            round_ids = new_ids
            labels = jumped
            if new_sum == prev_sum:
                return labels.select("v", F.col("l").alias("component"))
            prev_sum = new_sum
        raise RuntimeError("no converge")
    finally:
        _unpersist_rdds(sc, setup_ids - round_ids)


def dd6_variant(spark, fanout: bool, repart: bool):
    from trafficanalysisbigdata_spark.io import fan_out_small_scan
    from trafficanalysisbigdata_spark.operators.components import connected_components
    from trafficanalysisbigdata_spark.operators.dedup import minhash_lsh_scores
    from trafficanalysisbigdata_spark.plans.queries_dedup import DD2_MAX_BUCKET

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    if fanout:
        docs = fan_out_small_scan(docs.select("doc_id", "text"), "doc_id")
    edges = (
        minhash_lsh_scores(docs, max_bucket=DD2_MAX_BUCKET)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc1", "doc2")
    )
    comp = (cc_repart if repart else connected_components)(edges)
    comps = comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return (
        comps.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_components"),
            F.sum("component").cast("bigint").alias("keeper_id_sum"),
        )
        .select(F.col("size").cast("bigint").alias("size"), "n_components", "keeper_id_sum")
        .orderBy("size")
    )


# ---------------------------------------------------------------- s14


def s14_variant(spark, trim: bool):
    import os
    import tempfile

    from trafficanalysisbigdata_spark.io import load_table
    from trafficanalysisbigdata_spark.plans.queries_sources import correction_delta

    cols = ["ts", "value"] if trim else ["event_id", "ts", "value"]
    ev = (
        load_table(spark, "/root/testdata/sf0.1", "events")
        .select(*cols)
        .withColumn("d", F.to_date("ts").cast("string"))
    )
    if trim:
        ev = ev.select("value", "d", "ts")
        write_cols = ["value", "d"]
    else:
        write_cols = ["event_id", "ts", "value", "d"]
    work = tempfile.mkdtemp(prefix=f"s14ab_{os.getpid()}_")
    base = os.path.join(work, "events")
    ev.select(*write_cols).write.partitionBy("d").mode("overwrite").parquet(base)
    last_day = ev.agg(F.max("d")).first()[0]
    delta = correction_delta(ev, last_day)
    (
        delta.select(*write_cols)
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("d")
        .mode("overwrite")
        .parquet(base)
    )
    back = spark.read.parquet(base)
    return (
        back.groupBy(F.col("d").cast("string").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------- minhash


def sig_local(docs: DataFrame, num_perm: int = 8, text_col: str = "text") -> DataFrame:
    from trafficanalysisbigdata_spark.functions.text import tokens

    arr = F.array_distinct(tokens(F.col(text_col)))
    cols = [
        F.array_min(
            F.transform(arr, lambda t: F.md5(F.concat(F.lit(f"{i}|"), t)))
        ).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    return docs.select("doc_id", *cols)


def dd2_shape(spark, local_sig: bool, fanout: bool = False) -> DataFrame:
    from trafficanalysisbigdata_spark.io import fan_out_small_scan
    from trafficanalysisbigdata_spark.operators.dedup import (
        doc_token_arrays,
        doc_token_sets,
        jaccard_scores,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from trafficanalysisbigdata_spark.plans.queries_dedup import DD2_MAX_BUCKET

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    if fanout:
        docs = fan_out_small_scan(docs.select("doc_id", "text"), "doc_id")
    if local_sig:
        sig = sig_local(docs, num_perm=8)
    else:
        sig = minhash_signatures(doc_token_sets(docs), num_perm=8)
    pairs = lsh_candidate_pairs(sig, num_perm=8, rows_per_band=2, max_bucket=DD2_MAX_BUCKET)
    scores = jaccard_scores(pairs, doc_token_arrays(docs))
    # dd2's reported shape (histogram over score bands) is tiny; time the
    # score pipeline itself, which is where the signature path lives
    return scores.groupBy(F.round("jaccard", 1).alias("b")).agg(
        F.count(F.lit(1)).alias("n")
    )


def run_ab(name: str, variants, n: int) -> None:
    # identical-results check once
    frames = {k: fn() for k, fn in variants}
    rows = {k: sorted(map(tuple, f.collect())) for k, f in frames.items()}
    keys = [k for k, _ in variants]
    assert rows[keys[0]] == rows[keys[1]], f"{name}: RESULT MISMATCH"
    print(f"{name}: results identical ({len(rows[keys[0]])} rows)", flush=True)
    ts: dict[str, list[float]] = {k: [] for k in keys}
    for _ in range(n):
        for k, fn in variants:
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts[k].append(time.perf_counter() - t0)
    for k, runs in ts.items():
        print(f"{k}: min {min(runs):.3f}  " + " ".join(f"{t:.3f}" for t in runs), flush=True)


def run_gate_ab(spark, names: list[str], n: int) -> None:
    """A/B the REAL registered queries with the fan-out gate forced off
    (identity) vs live, interleaved in one JVM. Results asserted identical
    once per query before timing."""
    from trafficanalysisbigdata_spark import io as io_mod
    from trafficanalysisbigdata_spark.plans.registry import load_all, release_caches

    real = io_mod.fan_out_small_scan
    identity = lambda df, key: df  # noqa: E731
    specs = load_all()

    def run_one(name, fanout):
        io_mod.fan_out_small_scan = real if fanout else identity
        try:
            return specs[name].run(spark, "/root/testdata/sf0.1")
        finally:
            io_mod.fan_out_small_scan = real

    for name in names:
        a = sorted(map(tuple, run_one(name, False).collect()))
        release_caches()
        b = sorted(map(tuple, run_one(name, True).collect()))
        release_caches()
        assert a == b, f"{name}: RESULT MISMATCH under fan-out"
        print(f"{name}: results identical ({len(a)} rows)", flush=True)
        order = (("off", False), ("on", True))
        if os.environ.get("AB_REVERSE"):
            order = (("on", True), ("off", False))
        ts = {"off": [], "on": []}
        for _ in range(n):
            for key, fanout in order:
                t0 = time.perf_counter()
                run_one(name, fanout).write.format("noop").mode("overwrite").save()
                release_caches()
                ts[key].append(time.perf_counter() - t0)
        for key, runs in ts.items():
            print(
                f"{name} {key}: min {min(runs):.3f}  "
                + " ".join(f"{t:.3f}" for t in runs),
                flush=True,
            )


def main() -> None:
    which = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_spark()
    # warmup
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    if which == "pipe14":
        run_ab(
            "pipe14",
            [
                ("old-join", lambda: pipe14_variant(spark, True)),
                ("new-expr", lambda: pipe14_variant(spark, False)),
            ],
            n,
        )
    elif which == "pipe14scale":
        # Scale receipt for the is_train-as-expression change on a REAL
        # multi-file layout (64 files — the fan-out gate no-ops there, so
        # this isolates the removed broadcast probes). Synthetic source
        # column: the old/new delta never touches the source attach.
        import os as _os

        n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
        path = f"/tmp/spark_graft_rehearsal/docs_dist_{n_docs}"
        if not _os.path.exists(f"{path}/_SUCCESS"):
            sys.path.insert(0, _os.path.join(ROOT, "scripts"))
            from scale_rehearsal import gen_documents_dist

            gen_documents_dist(spark, n_docs, path)
        docs = spark.read.parquet(path).select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(4)).cast("string").alias("source"),
            "text",
        )
        print(f"corpus partitions: {docs.rdd.getNumPartitions()}", flush=True)
        run_ab(
            "pipe14scale",
            [
                ("old-join", lambda: pipe14_variant(spark, True, fanout=True, docs=docs)),
                ("new-expr", lambda: pipe14_variant(spark, False, fanout=True, docs=docs)),
            ],
            n,
        )
    elif which == "pipe14fan":
        run_ab(
            "pipe14fan",
            [
                ("expr", lambda: pipe14_variant(spark, False)),
                ("expr+fanout", lambda: pipe14_variant(spark, False, fanout=True)),
            ],
            n,
        )
    elif which == "dd2fan":
        run_ab(
            "dd2fan",
            [
                ("plain", lambda: dd2_shape(spark, False)),
                ("fanout", lambda: dd2_shape(spark, False, fanout=True)),
            ],
            n,
        )
    elif which == "dd6":
        run_ab(
            "dd6",
            [
                ("cur", lambda: dd6_variant(spark, False, False)),
                ("fan+repart", lambda: dd6_variant(spark, True, True)),
            ],
            n,
        )
    elif which == "s14":
        run_ab(
            "s14",
            [
                ("full", lambda: s14_variant(spark, False)),
                ("trim", lambda: s14_variant(spark, True)),
            ],
            n,
        )
    elif which == "gate":
        run_gate_ab(spark, sys.argv[3].split(","), n)
    elif which == "minhash":
        run_ab(
            "minhash/dd2",
            [
                ("old-groupby", lambda: dd2_shape(spark, False)),
                ("new-rowlocal", lambda: dd2_shape(spark, True)),
            ],
            n,
        )
    else:
        raise SystemExit(f"unknown experiment {which!r}")


if __name__ == "__main__":
    main()
