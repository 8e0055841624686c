"""ML pipeline sanity tests (SURVEY.md §5.4, M1–M7).

Value-exact parity with the reference is impossible (sklearn ≠ MLlib tree
internals), so the gates are structural: pipelines fit distributed, metrics
land in sane ranges, classifiers beat (or match) the constant
majority-class predictor, confusion matrices account for every test row.
The reference's observed accuracies (M3 0.87 / M4 0.93 / M5 0.99,
SC/classification.png) are properties of the real NYC data; the synthetic
events fixture has different class structure, hence relative baselines.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trafficanalysisbigdata_spark.io import load_table
from trafficanalysisbigdata_spark.ml import models
from trafficanalysisbigdata_spark.session import prep


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    prep(spark)
    df = load_table(spark, sf_dir, "events").cache()
    yield df
    # a leaked cache makes Spark substitute the InMemoryRelation into any
    # later logically-equal scan, silently defeating pushdown (and the
    # plan-shape assertions in test_plans.py)
    df.unpersist()


def _majority_share(df, label_col):
    counts = df.groupBy(label_col).count().collect()
    total = sum(r["count"] for r in counts)
    return max(r["count"] for r in counts) / total


def _check_classifier(result, df, label_col, slack=0.05):
    assert 0.0 < result["accuracy"] <= 1.0
    assert 0.0 < result["f1"] <= 1.0
    # in the neighborhood of the constant majority-class predictor or better
    # (the synthetic features carry little signal about value, so majority IS
    # roughly the ceiling; slack covers test-split variance at sf0.001)
    assert result["accuracy"] >= _majority_share(df, label_col) - slack
    confusion = result["confusion"].collect()
    labels = {r[label_col] for r in confusion}
    preds = {r["prediction"] for r in confusion}
    assert preds <= labels  # predictions stay within observed label space


def test_m1_rf_regression(events):
    r = models.rf_regression(events)
    assert r["mse"] > 0
    assert -1.0 < r["r2"] <= 1.0
    assert r["n_test"] > 0


def test_m2_feature_importance(events):
    rows = models.rf_feature_importance(events).collect()
    # reference parity: six features (TrafficAnalysis.py:201-214)
    assert sorted(r.feature for r in rows) == [
        "day_of_week", "hour_of_day", "is_weekend", "month", "user_id", "year",
    ]
    imps = [r.importance for r in rows]
    assert abs(sum(imps) - 1.0) < 1e-6
    assert imps == sorted(imps, reverse=True)
    assert all(i >= 0 for i in imps)


def test_m3_volume_classification(events):
    from trafficanalysisbigdata_spark.functions.binning import traffic_category

    r = models.volume_class_model(events)
    labeled = models.feature_frame(events).withColumn(
        "label",
        F.when(traffic_category(F.col("value")) == "Low", 0)
        .when(traffic_category(F.col("value")) == "Medium", 1)
        .otherwise(2)
        .cast("double"),
    )
    # 3-class RF on near-noise features scatters across bins more than a
    # constant predictor would — allow a wider band than the binary models
    _check_classifier(r, labeled, "label", slack=0.15)


def test_m4_peak_hour(events):
    r = models.peak_hour_model(events)
    p75 = events.agg(F.percentile("value", F.lit(0.75)).alias("t"))
    labeled = events.crossJoin(F.broadcast(p75)).withColumn(
        "label", (F.col("value") >= F.col("t")).cast("double")
    )
    _check_classifier(r, labeled, "label", slack=0.15)
    # P75 label split means the majority (below-threshold) class is ~75%
    assert r["accuracy"] >= 0.6


def test_m5_abnormal_detection(events):
    r = models.abnormal_traffic_model(events)
    stats = events.agg(F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma"))
    labeled = events.crossJoin(F.broadcast(stats)).withColumn(
        "label",
        (
            (F.col("value") > F.col("mu") + 3 * F.col("sigma"))
            | (F.col("value") < F.col("mu") - 3 * F.col("sigma"))
        ).cast("double"),
    )
    _check_classifier(r, labeled, "label")
    # 3σ outliers are rare → accuracy must be near the ~99% majority share
    assert r["accuracy"] >= 0.95


def test_m6_gbt_regression(events):
    r = models.gbt_regression(events)
    assert r["mse"] >= 0
    assert r["n_test"] > 0


def test_confusion_counts_cover_test_split(events):
    r = models.volume_class_model(events)
    n_conf = sum(row["count"] for row in r["confusion"].collect())
    assert n_conf > 0
    # 80/20 split of the fixture: the confusion matrix must cover every test
    # row exactly once
    total = events.count()
    assert 0.1 * total < n_conf < 0.3 * total


def test_m8_quality_filter(spark, sf_dir):
    """The learned filter must recover the heuristic on held-out docs far
    better than chance, and keep a sane fraction of the corpus."""
    from trafficanalysisbigdata_spark.io import register_views

    prep(spark)
    register_views(spark, sf_dir, "documents")
    r = models.quality_filter_model(spark.table("documents"))
    assert r["n_test"] > 0
    # the three features literally determine the label, so the linear model
    # should separate it almost perfectly; 0.9 leaves margin for the
    # band edges (label is a box, LR is a plane)
    assert r["accuracy"] >= 0.9, r["accuracy"]
    assert 0.0 < r["keep_rate"] <= 1.0


def test_m6_boosted_regressor_probe(spark, monkeypatch):
    """_boosted_regressor picks SparkXGBRegressor when xgboost.spark is
    importable and GBTRegressor otherwise — the parity-upgrade seam for
    environments that ship xgboost (the sandbox doesn't)."""
    import sys
    import types

    from pyspark.ml.regression import GBTRegressor

    # sandbox path: no xgboost installed → GBT fallback
    est = models._boosted_regressor(featuresCol="features", labelCol="total", seed=7)
    assert isinstance(est, GBTRegressor)
    assert est.getFeaturesCol() == "features" and est.getLabelCol() == "total"

    # fake the xgboost.spark module: probe must select it
    class FakeXGB:
        def __init__(self, **kw):
            self.kw = kw

    fake_pkg = types.ModuleType("xgboost")
    fake_spark = types.ModuleType("xgboost.spark")
    fake_spark.SparkXGBRegressor = FakeXGB
    fake_pkg.spark = fake_spark
    monkeypatch.setitem(sys.modules, "xgboost", fake_pkg)
    monkeypatch.setitem(sys.modules, "xgboost.spark", fake_spark)
    est = models._boosted_regressor(featuresCol="features", labelCol="total", seed=7)
    assert isinstance(est, FakeXGB)
    assert est.kw == {
        "features_col": "features",
        "label_col": "total",
        "n_estimators": 20,
        "random_state": 7,
    }


def test_tuned_rf_cv_ranges(spark, sf_dir):
    """ml9: the CV sweep must pick params FROM the grid, its fold metrics
    must cover the full grid (4 candidates), and test RMSE must land in the
    same band as the untuned M1 fit (tuning on noise features can't win big,
    but the machinery must not lose big either)."""
    from trafficanalysisbigdata_spark.io import register_views
    from trafficanalysisbigdata_spark.ml.models import tuned_rf_regression
    from trafficanalysisbigdata_spark.session import prep

    prep(spark)
    register_views(spark, sf_dir, "events")
    r = tuned_rf_regression(spark.table("events"))
    assert r["best_num_trees"] in (20, 50)
    assert r["best_max_depth"] in (3, 5)
    assert len(r["avg_fold_rmse"]) == 4  # one avg metric per grid point
    assert all(m > 0 for m in r["avg_fold_rmse"])
    assert r["n_test"] > 0
    # value ~ U(0,100)-ish noise vs weak features: RMSE near the data's
    # own σ; r2 may hover at 0 but must not be catastrophically negative
    assert 0 < r["rmse"] < 200
    assert r["r2"] > -0.5
    # the concurrent-fold claim is wiring, not prose: candidate fits run
    # parallelism-wide (measured 9.6s -> 6.3s wall vs parallelism=1 on
    # local[32] at sf0.001 — BENCH_LOCAL.md; single-node gain is bounded by
    # the folds sharing one executor pool)
    assert r["parallelism"] > 1


def test_model_persistence_roundtrip(spark, sf_dir, tmp_path):
    """Ops contract: a fitted model must survive save/load with identical
    predictions — the artifact a training pipeline persists IS the model,
    and a silent scoring drift after reload is a production incident."""
    from pyspark.ml import PipelineModel

    from trafficanalysisbigdata_spark.io import register_views
    from trafficanalysisbigdata_spark.ml.models import rf_regression
    from trafficanalysisbigdata_spark.session import prep

    prep(spark)
    register_views(spark, sf_dir, "events")
    r = rf_regression(spark.table("events"))
    model = r["model"]
    path = str(tmp_path / "rf_model")
    model.save(path)
    reloaded = PipelineModel.load(path)

    from trafficanalysisbigdata_spark.ml.models import feature_frame

    df = feature_frame(spark.table("events")).limit(200)
    a = model.transform(df).select("prediction").collect()
    b = reloaded.transform(df).select("prediction").collect()
    assert [x.prediction for x in a] == [x.prediction for x in b]


def test_mlx6_decimal_mse_agrees_with_evaluator(spark, sf_dir):
    """mlx6 reports MSE recomputed from DECIMAL(18,6)-cast predictions (so
    the sum is exact/order-independent and oracle-checkable); it must agree
    with RegressionEvaluator's double-precision MSE on the same predictions
    to well inside the 1e-6 quantization the cast introduces."""
    from pyspark.sql import functions as F

    from trafficanalysisbigdata_spark.io import register_views
    from trafficanalysisbigdata_spark.ml.models import rf_regression
    from trafficanalysisbigdata_spark.session import prep

    prep(spark)
    register_views(spark, sf_dir, "events")
    r = rf_regression(spark.table("events"))
    err = F.col("value").cast("decimal(18,6)") - F.col("prediction").cast(
        "decimal(18,6)"
    )
    row = r["pred"].agg(
        (F.sum(err * err).cast("double") / F.count(F.lit(1))).alias("mse_dec")
    ).collect()[0]
    assert abs(row.mse_dec - r["mse"]) <= 1e-4 * max(1.0, r["mse"])


def test_mlx8_decimal_mse_agrees_with_evaluator(spark, sf_dir):
    """mlx8 reports M6's MSE recomputed from DECIMAL(18,6)-cast predictions;
    like mlx6 it must agree with the evaluator's double-precision MSE on the
    same predictions to well inside the cast's quantization."""
    from pyspark.sql import functions as F

    from trafficanalysisbigdata_spark.io import register_views
    from trafficanalysisbigdata_spark.ml.models import gbt_regression
    from trafficanalysisbigdata_spark.session import prep

    prep(spark)
    register_views(spark, sf_dir, "events")
    r = gbt_regression(spark.table("events"))
    err = F.col("total").cast("decimal(18,6)") - F.col("prediction").cast(
        "decimal(18,6)"
    )
    row = r["pred"].agg(
        (F.sum(err * err).cast("double") / F.count(F.lit(1))).alias("mse_dec")
    ).collect()[0]
    assert abs(row.mse_dec - r["mse"]) <= 1e-4 * max(1.0, r["mse"])


def test_mlx9_grid_matches_ml9_sweep():
    """mlx9's contract grid and ml9's swept grid derive from the same
    constants; the registered oracle's VALUES clause must contain exactly
    that cross product, so neither can drift from the other."""
    from trafficanalysisbigdata_spark.ml import models
    from trafficanalysisbigdata_spark.plans.registry import load_all

    oracle = load_all()["mlx9_cv_fold_grid_contract"].oracle
    for t in models.CV_NUM_TREES:
        for d in models.CV_MAX_DEPTH:
            assert f"({t}, {d})" in oracle
    assert f"% {models.CV_NUM_FOLDS} AS fold" in oracle
