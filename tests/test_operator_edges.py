"""Edge-case unit tests the oracle harness can't express cleanly:
as-of tie determinism, degenerate histogram ranges, bigram guards."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trafficanalysisbigdata_spark.functions.text import token_bigrams
from trafficanalysisbigdata_spark.functions.timeparts import date_from_parts
from trafficanalysisbigdata_spark.operators.aggregates import histogram
from trafficanalysisbigdata_spark.operators.asof import asof_join
from trafficanalysisbigdata_spark.session import prep


def test_asof_tie_determinism(spark):
    prep(spark)
    t = dt.datetime(2024, 1, 1, 12)
    left = spark.createDataFrame([(1, t)], "k int, lts timestamp")
    # three right rows at the SAME (key, ts): greatest value tuple must win
    right = spark.createDataFrame(
        [(1, t, 10.0), (1, t, 30.0), (1, t, 20.0)], "k int, rts timestamp, v double"
    )
    outs = set()
    for _ in range(3):
        r = asof_join(
            left, right.repartition(3), "lts", "rts", by=["k"], value_cols=["v"]
        ).collect()
        assert len(r) == 1
        outs.add(r[0]["v_asof"])
    assert outs == {30.0}


def test_asof_no_prior_row_is_null(spark):
    prep(spark)
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1), 5.0)], "k int, rts timestamp, v double"
    )
    r = asof_join(left, right, "lts", "rts", by=["k"], value_cols=["v"]).collect()
    assert r[0]["v_asof"] is None


def test_histogram_constant_column(spark):
    prep(spark)
    df = spark.createDataFrame([(7.0,)] * 42, "x double")
    rows = histogram(df, "x", bins=20).collect()
    assert [(r.bin, r.n) for r in rows] == [(0, 42)]


def test_token_bigrams_short_docs(spark):
    prep(spark)
    df = spark.createDataFrame(
        [("a b c",), ("single",), ("",)], "text string"
    ).select(token_bigrams(F.col("text")).alias("bg"))
    got = [r.bg for r in df.collect()]
    assert got[0] == ["a b", "b c"]
    assert got[1] == []  # 1 token: no fabricated unigram shingle
    assert got[2] == []  # split('') yields [''] — still a single token


def test_date_from_parts_null_propagation(spark):
    prep(spark)
    df = spark.createDataFrame(
        [(2024, 5, 17), (2024, None, 5), (2024, 2, 30)], "y int, m int, d int"
    ).select(date_from_parts(F.col("y"), F.col("m"), F.col("d")).alias("dt"))
    got = [r.dt for r in df.collect()]
    assert got[0] == dt.date(2024, 5, 17)
    assert got[1] is None  # NULL part must NOT collapse into '2024-05'
    assert got[2] is None  # out of range coerces like pandas NaT


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL++ is the 100 TB distinct path (olap4 keeps the oracle exact);
    its estimate must land within 5% of truth on the fixture."""
    from trafficanalysisbigdata_spark.io import load_table

    prep(spark)
    ev = load_table(spark, sf_dir, "events")
    r = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id").alias("approx"),
    ).collect()[0]
    assert abs(r.approx - r.exact) / r.exact < 0.05


def test_salted_join_left_outer_and_determinism(spark):
    """Unmatched left rows carry exactly one salt, so a left join keeps them
    exactly once; deterministic salts mean two runs agree row-for-row."""
    from trafficanalysisbigdata_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "orphan")], "k int, v string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, w string")
    out = salted_join(left, right, key="k", n_salts=4, how="left")
    rows = sorted((r.k, r.v, r.w) for r in out.collect())
    assert rows == [(1, "a", "X"), (1, "b", "X"), (2, "c", "Y"), (99, "orphan", None)]
    again = sorted((r.k, r.v, r.w) for r in salted_join(left, right, "k", 4, "left").collect())
    assert again == rows


def test_token_ngrams_short_doc_guard(spark):
    """<n-token docs yield NO shingles (sequence would step downward)."""
    from pyspark.sql import functions as F

    from trafficanalysisbigdata_spark.functions.text import token_ngrams

    df = spark.createDataFrame(
        [("a b c d e",), ("a b c d",), ("a",), ("",)], "text string"
    )
    got = [r.g for r in df.select(token_ngrams(F.col("text"), 5).alias("g")).collect()]
    assert got == [["a b c d e"], [], [], []]


def test_compaction_collapses_file_count(spark, sf_dir, tmp_path):
    """s11's layout claim, checked on disk: 64 fragments become 4 files with
    identical rows."""
    import glob
    import os

    from trafficanalysisbigdata_spark.io import load_table
    from trafficanalysisbigdata_spark.session import prep

    prep(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    frag = str(tmp_path / "frag")
    compact = str(tmp_path / "compact")
    ev.repartition(64).write.parquet(frag)
    assert len(glob.glob(os.path.join(frag, "*.parquet"))) == 64
    spark.read.parquet(frag).repartition(4).write.parquet(compact)
    assert len(glob.glob(os.path.join(compact, "*.parquet"))) == 4
    assert spark.read.parquet(compact).count() == ev.count()


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """Skew-injected fixture: 400 identical boilerplate docs collide into one
    mega-bucket per band. With the cap those buckets are dropped — candidate
    volume stays bounded — while a genuine near-dup pair with discriminative
    tokens (small buckets) survives. Uncapped, the same fixture produces the
    O(bucket²) explosion the cap exists to prevent."""
    from trafficanalysisbigdata_spark.operators.dedup import (
        doc_token_sets,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    boiler = [(i, "terms of service apply all rights reserved") for i in range(400)]
    neardup = [
        (1000, "quantum entanglement drives superconducting qubit gates"),
        (1001, "quantum entanglement drives superconducting qubit arrays"),
    ]
    docs = spark.createDataFrame(boiler + neardup, "doc_id long, text string")
    sig = minhash_signatures(doc_token_sets(docs), num_perm=8)

    capped = lsh_candidate_pairs(sig, num_perm=8, rows_per_band=2, max_bucket=100)
    got = {(r.doc1, r.doc2) for r in capped.collect()}
    assert (1000, 1001) in got  # discriminative near-dup survives the cap
    assert len(got) <= 100  # bounded: mega-buckets (400 docs) were dropped

    uncapped = lsh_candidate_pairs(sig, num_perm=8, rows_per_band=2)
    # 400 identical docs alone contribute C(400,2) = 79800 pairs
    assert uncapped.count() >= 79800


def test_connected_components_chain_and_islands(spark):
    """Chain 1-2-3-4 collapses to one component labeled min=1 (transitivity —
    the semantics pairwise dedup rules approximate); disjoint pair and
    triangle keep their own min labels; pointer jumping converges."""
    from trafficanalysisbigdata_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc1 long, doc2 long",
    )
    got = {(r.v, r.component) for r in connected_components(edges).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_long_chain_converges(spark):
    """A 64-vertex path is the pointer-jumping stress case: plain min
    propagation needs 63 rounds, jumping needs ~log2(63); max_iter=12 would
    fail without it."""
    from trafficanalysisbigdata_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc1 long, doc2 long"
    )
    comp = connected_components(edges, max_iter=12)
    labels = {r.component for r in comp.collect()}
    assert labels == {0}


def test_sorted_layout_footers_are_disjoint(spark, sf_dir, tmp_path):
    """write_sorted's data-skipping claim, checked on disk: every parquet
    file's ts min/max span is tight and the per-file spans are pairwise
    disjoint — which is exactly what lets a range predicate prune whole
    files. An unsorted write of the same rows has every file spanning
    ~the full time range."""
    import glob

    import pyarrow.parquet as pq

    from trafficanalysisbigdata_spark.io import load_table, write_sorted
    from trafficanalysisbigdata_spark.session import prep

    prep(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    path = str(tmp_path / "sorted")
    write_sorted(ev, path, "ts", n_files=8)

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns) if md.schema.column(i).name == "ts"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(col_idx).statistics
            mins.append(stats.min)
            maxs.append(stats.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) >= 2
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file spans overlap: {hi1} > {lo2}"

    # a sorted-layout read with a range filter returns the same rows
    lo, hi = spans[1]
    back = spark.read.parquet(path).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    orig = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
    assert back.count() == orig.count()


def test_partition_upsert_touches_only_target_partition(spark, sf_dir, tmp_path):
    """s14's dynamic-overwrite contract: the delta write must leave every
    non-target partition byte-identical (same files, same sizes, same
    mtimes) and replace the target partition's files."""
    import os

    from trafficanalysisbigdata_spark.io import load_table

    prep(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "value")
        .withColumn("d", F.to_date("ts").cast("string"))
    )
    base = str(tmp_path / "events")
    ev.write.partitionBy("d").mode("overwrite").parquet(base)

    def snapshot() -> dict[str, dict[str, tuple[int, float]]]:
        parts = {}
        for entry in os.listdir(base):
            if not entry.startswith("d="):
                continue
            pdir = os.path.join(base, entry)
            parts[entry] = {
                f: (os.path.getsize(os.path.join(pdir, f)),
                    os.path.getmtime(os.path.join(pdir, f)))
                for f in os.listdir(pdir)
                if not f.startswith(".")
            }
        return parts

    before = snapshot()
    last_day = ev.agg(F.max("d")).first()[0]
    target = f"d={last_day}"
    assert target in before and len(before) > 1

    delta = ev.filter(F.col("d") == last_day).withColumn("value", F.col("value") * 2)
    (
        delta.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("d")
        .mode("overwrite")
        .parquet(base)
    )

    after = snapshot()
    assert set(after) == set(before), "partition set must be unchanged"
    for part in before:
        if part == target:
            assert after[part] != before[part], "target partition must be rewritten"
        else:
            assert after[part] == before[part], f"{part} was touched by the upsert"

    # and the merged table is exactly: all rows, last day's values doubled
    back = spark.read.parquet(base)
    n_before = ev.count()
    assert back.count() == n_before
    got = back.filter(F.col("d").cast("string") == last_day).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("t")
    ).first()["t"]
    want = ev.filter(F.col("d") == last_day).agg(
        F.sum((F.col("value") * 2).cast("decimal(18,6)")).cast("double").alias("t")
    ).first()["t"]
    assert got == want


def test_zorder_footers_are_boxes_on_both_dims(spark, sf_dir, tmp_path):
    """write_zorder's claim on disk: each file's (user_id, value) footer box
    covers a small fraction of the 2-D domain — a round-robin write of the
    same rows has every file spanning ~the whole domain on both dims, and a
    single-column sort is tight on one dim but full-range on the other."""
    import glob

    import pyarrow.parquet as pq

    from trafficanalysisbigdata_spark.io import load_table, write_zorder

    prep(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath, rpath = str(tmp_path / "zord"), str(tmp_path / "rrobin")
    write_zorder(ev, zpath, "user_id", "value", n_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(rpath)

    glo = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    uspan, vspan = float(glo[1] - glo[0]), float(glo[3] - glo[2])

    def file_areas(path):
        areas = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            lo, hi = {}, {}
            for name in ("user_id", "value"):
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(cols[name]).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                lo[name], hi[name] = min(mins), max(maxs)
            u_frac = (hi["user_id"] - lo["user_id"]) / uspan
            v_frac = (hi["value"] - lo["value"]) / vspan
            areas.append(u_frac * v_frac)
        return sorted(areas)

    z_areas, r_areas = file_areas(zpath), file_areas(rpath)
    assert len(z_areas) >= 4
    # medians, not extremes: one z file legitimately straddles a curve seam
    # (measured 0.84-0.96 area), and small per-file samples keep round-robin
    # boxes slightly under the full domain (measured medians: z ~0.08,
    # round-robin ~0.75 at sf0.001/sf0.01)
    z_med = z_areas[len(z_areas) // 2]
    r_med = r_areas[len(r_areas) // 2]
    assert r_med > 0.4, f"round-robin baseline unexpectedly tight: {r_areas}"
    assert z_med < 0.25, f"median z-file box area {z_med} too large: {z_areas}"
    assert z_med < 0.3 * r_med

    # a literal box predicate over the z layout returns the same rows as
    # over the original (pruning must never change results)
    box = (
        (F.col("user_id") >= 10) & (F.col("user_id") <= 20)
        & (F.col("value") >= 50.0) & (F.col("value") <= 150.0)
    )
    got = spark.read.parquet(zpath).filter(box)
    want = ev.filter(box)
    assert got.count() == want.count()
    assert got.agg(F.sum("event_id")).first()[0] == want.agg(F.sum("event_id")).first()[0]


def test_incremental_agg_refresh_prunes_and_preserves(spark, sf_dir, tmp_path):
    """s16's maintenance contract: (a) the refresh's fact scan is pruned to
    the corrected day's partition; (b) every non-target AGG partition is
    byte-identical across the refresh; (c) the refreshed agg table equals a
    full recompute over the corrected fact lake."""
    import os

    from trafficanalysisbigdata_spark.io import load_table

    prep(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "value")
        .withColumn("d", F.to_date("ts").cast("string"))
    )
    fact = str(tmp_path / "fact")
    agg = str(tmp_path / "agg")
    ev.write.partitionBy("d").mode("overwrite").parquet(fact)

    def day_agg(df):
        return df.groupBy("d").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_dec"),
        )

    day_agg(spark.read.parquet(fact)).write.partitionBy("d").mode(
        "overwrite"
    ).parquet(agg)

    def snapshot(base):
        parts = {}
        for entry in os.listdir(base):
            if entry.startswith("d="):
                pdir = os.path.join(base, entry)
                parts[entry] = {
                    f: (os.path.getsize(os.path.join(pdir, f)),
                        os.path.getmtime(os.path.join(pdir, f)))
                    for f in os.listdir(pdir)
                    if not f.startswith(".")
                }
        return parts

    before = snapshot(agg)
    last_day = ev.agg(F.max("d")).first()[0]
    corr = ev.filter(F.col("d") == last_day).withColumn("value", F.col("value") * 2)
    corr.write.option("partitionOverwriteMode", "dynamic").partitionBy("d").mode(
        "overwrite"
    ).parquet(fact)

    changed = spark.read.parquet(fact).filter(F.col("d") == last_day)
    # (a) partition pruning on the refresh scan
    plan = changed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and last_day in plan, plan

    day_agg(changed).write.option("partitionOverwriteMode", "dynamic").partitionBy(
        "d"
    ).mode("overwrite").parquet(agg)

    # (b) untouched agg partitions byte-identical
    after = snapshot(agg)
    target = f"d={last_day}"
    assert set(after) == set(before)
    for part in before:
        if part == target:
            assert after[part] != before[part]
        else:
            assert after[part] == before[part], f"{part} touched by refresh"

    # (c) incremental result == full recompute
    inc = {
        (r.d, r.n, float(r.total_dec))
        for r in spark.read.parquet(agg).collect()
    }
    full = {
        (r.d, r.n, float(r.total_dec))
        for r in day_agg(spark.read.parquet(fact)).collect()
    }
    assert inc == full


def test_sink_queries_run_concurrently(spark, sf_dir):
    """Round-6 ADVICE regression: s13/s15/s16/ops2 write scratch layouts —
    per-process + per-run paths mean two concurrent executions of the SAME
    sink queries must not clobber each other (the old fixed shared path
    failed exactly here under bench + tests overlap). Runs the four
    layout-writing queries in two racing threads and checks both get
    identical, complete results."""
    import threading

    from trafficanalysisbigdata_spark.plans.registry import load_all

    prep(spark)
    specs = load_all()
    names = ["s13_sorted_layout_scan", "s16_incremental_agg_refresh"]
    results: dict[tuple[int, str], list] = {}
    errors: list[Exception] = []

    def run(tid: int):
        try:
            for n in names:
                results[(tid, n)] = sorted(
                    map(tuple, specs[n].run(spark, sf_dir).collect())
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=run, args=(t,)) for t in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(600)
    assert not errors, errors
    for n in names:
        assert results[(0, n)] == results[(1, n)], f"{n} diverged across threads"
        assert results[(0, n)], f"{n} returned no rows"


def test_rolling_median_short_frames(spark):
    """w10's composition must yield the discrete median on frames shorter
    than the window width (warm-up rows) — element_at(ceil(n/2)) on n=1..3."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, 1.0), (1, 3, 9.0), (1, 4, 3.0)],
        "user_id long, event_id long, value double",
    )
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("value").over(w))
    out = {
        r.event_id: r.med
        for r in df.select(
            "event_id",
            F.element_at(arr, F.ceil(F.size(arr) / 2).cast("int")).alias("med"),
        ).collect()
    }
    # frames: [5] -> 5; [1,5] -> 1 (disc lower-middle); [1,5,9] -> 5;
    # [1,3,5,9] -> 3
    assert out == {1: 5.0, 2: 1.0, 3: 5.0, 4: 3.0}


def test_multiset_ops_empty_sides(spark):
    """set2's ALL forms on empty/disjoint sides: INTERSECT ALL with an
    empty side is empty; EXCEPT ALL with an empty subtrahend is the bag
    itself, multiplicity preserved."""
    from trafficanalysisbigdata_spark.operators.setops import except_all, intersect_all

    a = spark.createDataFrame([(1,), (1,), (2,)], "user_id long")
    empty = spark.createDataFrame([], "user_id long")
    assert intersect_all(a, empty).count() == 0
    assert sorted(r.user_id for r in except_all(a, empty).collect()) == [1, 1, 2]
    # multiplicity arithmetic: {1,1,2} ∩all {1} = {1}; {1,1,2} \all {1} = {1,2}
    b = spark.createDataFrame([(1,)], "user_id long")
    assert sorted(r.user_id for r in intersect_all(a, b).collect()) == [1]
    assert sorted(r.user_id for r in except_all(a, b).collect()) == [1, 2]


def test_two_stage_rerank_small_corpus(spark):
    """sim9 when the corpus is smaller than the shortlist: every non-self,
    nonzero-norm neighbor survives to the rerank and top-k truncates
    correctly."""
    from trafficanalysisbigdata_spark.operators.similarity import (
        two_stage_rerank_topk,
    )

    df = spark.createDataFrame(
        [(i, [float(i + 1), 1.0, 0.5, 2.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = two_stage_rerank_topk(df, df.filter("vec_id = 0"), k=10)
    rows = out.collect()
    assert {r.neighbor_id for r in rows} == {1, 2, 3}
    cos = [r.cos for r in sorted(rows, key=lambda r: -r.cos)]
    assert cos == sorted(cos, reverse=True)


def test_olap9_empty_catalog(spark, tmp_path):
    """olap9's range-bounds driver action returns NULL percentiles over an
    empty catalog; the `or []` guard must degrade to one bucket and an
    empty result instead of raising at plan-build time (round-9 advice).
    The registry wrapper re-registers views from sf_dir, so the empty
    catalog must BE an sf_dir: a zero-row lineitem.parquet in a tmpdir
    (a temp view would be clobbered by register_views)."""
    from trafficanalysisbigdata_spark.plans.registry import queries

    spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = queries()["olap9_pareto_abc"](spark.newSession(), str(tmp_path))
    assert out.count() == 0


def test_two_phase_prefix_sum_matches_naive_window(spark):
    """two_phase_prefix_sum == a naive single-partition window cumsum on a
    frame with duplicate keys (tie groups spanning bucket cut candidates),
    both directions."""
    from pyspark.sql.window import Window

    from trafficanalysisbigdata_spark.operators.prefixsum import (
        two_phase_prefix_sum,
    )

    rows = [(i, float(k), v) for i, (k, v) in enumerate(
        [(5, 10), (1, 1), (5, 20), (3, 7), (1, 2), (9, 100), (3, 5), (5, 30)]
    )]
    df = spark.createDataFrame(rows, "id long, key double, v long")
    for desc in (False, True):
        order = [F.desc("key") if desc else F.asc("key"), F.asc("id")]
        naive = {
            r["id"]: r["cum"]
            for r in df.withColumn(
                "cum",
                F.sum("v").over(
                    Window.partitionBy(F.lit(0))
                    .orderBy(*order)
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
            ).collect()
        }
        got = two_phase_prefix_sum(
            df.repartition(4),
            key="key",
            value="v",
            out="cum",
            descending=desc,
            tiebreak=("id",),
            n_buckets=3,
            total_out="tot",
        ).collect()
        assert {r["id"]: r["cum"] for r in got} == naive
        assert all(r["tot"] == 175 for r in got)


def test_two_phase_prefix_sum_empty_frame(spark):
    """Zero rows: the bounds action yields NULL cuts and the operator must
    return an empty (not raising) frame with the new columns."""
    from trafficanalysisbigdata_spark.operators.prefixsum import (
        two_phase_prefix_sum,
    )

    df = spark.createDataFrame([], "id long, key double, v long")
    out = two_phase_prefix_sum(
        df, key="key", value="v", out="cum", total_out="tot"
    )
    assert out.count() == 0
    assert {"cum", "tot"} <= set(out.columns)


def test_connected_components_no_edges(spark):
    """pipe12's singleton path: an empty edge list must yield an empty label
    frame (every doc then coalesces to its own cluster downstream), not an
    error from the fixpoint loop."""
    from trafficanalysisbigdata_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame([], "doc1 long, doc2 long")
    assert connected_components(pairs).count() == 0


def test_two_phase_prefix_sums_grouped_matches_naive(spark):
    """two_phase_prefix_sums (grouped, multi-column) == per-group naive
    window cumsums, on a frame with duplicate keys spanning bucket-cut
    candidates and groups of unequal size; empty frame returns empty."""
    from pyspark.sql.window import Window

    from trafficanalysisbigdata_spark.operators.prefixsum import (
        two_phase_prefix_sums,
    )

    rows = [
        (i, g, float(k), v, w)
        for i, (g, k, v, w) in enumerate(
            [
                ("a", 5, 10, 1), ("a", 1, 1, 2), ("a", 5, 20, 3),
                ("b", 3, 7, 4), ("a", 1, 2, 5), ("b", 9, 100, 6),
                ("b", 3, 5, 7), ("a", 5, 30, 8), ("c", 2, 11, 9),
            ]
        )
    ]
    df = spark.createDataFrame(rows, "id long, g string, key double, v long, w long")
    naive_w = (
        Window.partitionBy("g")
        .orderBy(F.asc("key"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = {
        r["id"]: (r["cv"], r["cw"])
        for r in df.withColumn("cv", F.sum("v").over(naive_w))
        .withColumn("cw", F.sum("w").over(naive_w))
        .collect()
    }
    got = two_phase_prefix_sums(
        df.repartition(4),
        key="key",
        values={"cv": "v", "cw": "w"},
        group=("g",),
        tiebreak=("id",),
        n_buckets=3,
    ).collect()
    assert {r["id"]: (r["cv"], r["cw"]) for r in got} == naive

    empty = spark.createDataFrame([], "id long, g string, key double, v long")
    out = two_phase_prefix_sums(
        empty, key="key", values={"cv": "v"}, group=("g",)
    )
    assert out.count() == 0
    assert "cv" in out.columns
