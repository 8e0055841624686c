"""Differential tests: every registry query with an oracle must match DuckDB
exactly at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from trafficanalysisbigdata_spark.plans.registry import load_all

from .oracle_harness import compare, duck_connection

SPECS = load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    sdf = spec.run(spark, sf_dir)
    ddf = duck.execute(spec.oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, "\n".join(problems)


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must execute and return a schema."""
    for name, spec in SPECS.items():
        if spec.oracle:
            continue
        df = spec.run(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
        assert df.count() >= 0


def test_a14_hll_error_bound(spark, sf_dir):
    """HLL++ at rsd=0.01 must land within 2% of the exact distinct count."""
    from trafficanalysisbigdata_spark.io import register_views
    from trafficanalysisbigdata_spark.plans.registry import queries
    from trafficanalysisbigdata_spark.session import prep

    prep(spark)
    register_views(spark, sf_dir, "events")
    rows = queries()["a14b_hll_estimate_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.n_approx - r.n_exact) <= max(1, 0.02 * r.n_exact), r
