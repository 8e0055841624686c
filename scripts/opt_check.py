#!/usr/bin/env python
"""Round-14 optimization loop: for the named queries, (1) verify against the
DuckDB oracle at sf0.01 and sf0.001 exactly like the driver mirror, then
(2) time each with the noop sink at sf0.1 (median of N passes after warmup).

Usage: python scripts/opt_check.py [--time N] [--skip-verify] names...
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--time", type=int, default=3)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from trafficanalysisbigdata_spark.plans.registry import load_all, release_caches

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("opt-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    fails = 0
    if not args.skip_verify:
        from oracle_harness import compare

        for sf in ("sf0.001", "sf0.01"):
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('/root/testdata/{sf}/{t}.parquet')"
                )
            for name in args.names:
                spec = specs[name]
                sdf = spec.run(spark, f"/root/testdata/{sf}")
                if spec.oracle:
                    probs = compare(name, sdf, con.execute(spec.oracle).df())
                    release_caches()
                    if probs:
                        fails += 1
                        print(f"VERIFY FAIL {name} @{sf}: {probs}")
                    else:
                        print(f"verify ok {name} @{sf}")
                else:
                    print(f"{name}: rows-only, {sdf.count()} rows")
                    release_caches()
            con.close()
    if fails:
        print(f"FAILS: {fails}")
        sys.exit(1)

    if args.time:
        # warmup (mirrors bench.py)
        specs["a1_totals_by_event_type"].run(spark, "/root/testdata/sf0.1").write.format(
            "noop"
        ).mode("overwrite").save()
        release_caches()
        for name in args.names:
            runs = []
            for i in range(args.time):
                # time construction + execution, exactly like bench.py — some
                # queries run driver-side planning actions (counts, CC rounds,
                # prefix-sum cuts) inside run()
                t0 = time.perf_counter()
                specs[name].run(spark, "/root/testdata/sf0.1").write.format(
                    "noop"
                ).mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
                release_caches()
            print(
                f"TIME {name}: median {statistics.median(runs):.3f}  "
                + " ".join(f"{t:.3f}" for t in runs)
            )
    print("FAILS: 0")


if __name__ == "__main__":
    main()
