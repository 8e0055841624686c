"""Focused tests for the r14 small-scan fan-out (io.fan_out_small_scan).

The optimization: a single-file parquet table smaller than one scan split is
one scan task (single row group in the fixtures), so a fused expression-heavy
pipeline above it — tokenize, per-gram md5, explode, int8 folds — runs on one
core. The measured winners (dd4/dd7/dd10/tx16/tx9/pipe5/tx11/pipe16) opt in
PER OPERATOR via ``fan_out_small_scan(df, key)``: a KEYED hash repartition
to ``defaultParallelism`` (round-robin pays sortBeforeRepartition on the
full rows — A/B-measured as a 2–3× tax on light queries), gated on
partitions < cores AND estimated bytes under one scan split so cluster-scale
layouts never pay the shuffle. These tests pin the gate's behaviors.
"""

from __future__ import annotations

import pytest

import trafficanalysisbigdata_spark.io as io_mod
from trafficanalysisbigdata_spark.io import fan_out_small_scan, load_table


@pytest.fixture(autouse=True)
def _restore_gate():
    orig = io_mod._FANOUT_MAX_BYTES
    yield
    io_mod._FANOUT_MAX_BYTES = orig


def test_small_scan_fans_out_to_parallelism(spark, sf_dir):
    cores = spark.sparkContext.defaultParallelism
    df = fan_out_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    n = df.rdd.getNumPartitions()
    assert n == cores, f"expected {cores} partitions after fan-out, got {n}"


def test_gate_off_past_size_bound(spark, sf_dir):
    io_mod._FANOUT_MAX_BYTES = 0  # every frame now estimates "big enough"
    base = load_table(spark, sf_dir, "embeddings")
    df = fan_out_small_scan(base, "vec_id")
    assert df is base  # untouched — no repartition node added


def test_gate_off_when_partitions_cover_cores(spark, sf_dir):
    cores = spark.sparkContext.defaultParallelism
    base = load_table(spark, sf_dir, "documents").repartition(cores, "doc_id")
    df = fan_out_small_scan(base, "doc_id")
    assert df is base  # already cores-wide: adding another exchange is waste


def test_fanout_is_keyed_not_roundrobin(spark, sf_dir):
    # keyed hash partitioning — round-robin's sortBeforeRepartition was the
    # measured light-query tax; the plan must show hashpartitioning(doc_id)
    df = fan_out_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(doc_id" in plan, plan
    assert "roundrobinpartitioning" not in plan, plan


def test_fanout_changes_no_rows(spark, sf_dir):
    base = load_table(spark, sf_dir, "documents")
    fanned = fan_out_small_scan(base, "doc_id")
    rows_plain = sorted(r.doc_id for r in base.select("doc_id").collect())
    rows_fanned = sorted(r.doc_id for r in fanned.select("doc_id").collect())
    assert rows_plain == rows_fanned
