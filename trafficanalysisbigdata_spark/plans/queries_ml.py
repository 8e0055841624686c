"""ML queries (SURVEY.md §2.11) — rows-only checks (model fits are not
SQL-expressible; metric sanity ranges are asserted in tests/test_ml.py).

Each returns a small metrics/summary DataFrame so the driver's rows-only
check still pins schema and row count. Seeds are fixed; results are
deterministic for a given Spark version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import models
from .registry import register


@register("ml1_rf_regression", oracle=None, tags=("ml", "M1"), tables=("events",))
def ml1_rf_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 RF regression: returns one metrics row (mse, r2, n_test)."""
    r = models.rf_regression(spark.table("events"))
    return spark.createDataFrame(
        [(float(r["mse"]), float(r["r2"]), int(r["n_test"]))],
        "mse double, r2 double, n_test long",
    )


@register("ml2_feature_importance", oracle=None, tags=("ml", "M2"), tables=("events",))
def ml2_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 feature-importance ranking (feature, importance) rows."""
    return models.rf_feature_importance(spark.table("events"))


@register("ml3_volume_classification", oracle=None, tags=("ml", "M3"), tables=("events",))
def ml3_volume_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 three-class volume model: confusion matrix as (label, prediction, count)."""
    r = models.volume_class_model(spark.table("events"))
    return r["confusion"].withColumn("accuracy", F.round(F.lit(r["accuracy"]), 4))


@register("ml4_peak_hour_classification", oracle=None, tags=("ml", "M4"), tables=("events",))
def ml4_peak_hour_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 peak-hour (≥P75) binary model confusion matrix."""
    r = models.peak_hour_model(spark.table("events"))
    return r["confusion"].withColumn("accuracy", F.round(F.lit(r["accuracy"]), 4))


@register("ml5_abnormal_detection", oracle=None, tags=("ml", "M5"), tables=("events",))
def ml5_abnormal_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 μ±3σ abnormal-traffic binary model confusion matrix."""
    r = models.abnormal_traffic_model(spark.table("events"))
    return r["confusion"].withColumn("accuracy", F.round(F.lit(r["accuracy"]), 4))


@register("ml7_rf_melted", oracle=None, tags=("ml", "M7"), tables=("events",))
def ml7_rf_melted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 (ref proto:139-174): RF regression on MELTED long-format data —
    pivot events to a wide per-(user, date) hourly layout, melt back with the
    F13 hour parse, fit volume ~ [user_id, hour]. Exercises the wide→long
    reshape feeding a model, the proto pipeline's distinguishing move."""
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    ev = spark.table("events")
    wide = (
        ev.groupBy("user_id", F.to_date("ts").alias("d"))
        .pivot("event_type")
        .agg(F.sum("value"))
        .na.fill(0.0)
    )
    type_cols = [c for c in wide.columns if c not in ("user_id", "d")]
    long = wide.melt(
        ids=["user_id"],
        values=type_cols,
        variableColumnName="etype",
        valueColumnName="total",
    ).withColumn(
        "type_idx",
        F.array_position(F.array(*[F.lit(c) for c in sorted(type_cols)]), F.col("etype")).cast("int"),
    )
    assembler = VectorAssembler(inputCols=["user_id", "type_idx"], outputCol="features")
    rf = RandomForestRegressor(
        featuresCol="features", labelCol="total", numTrees=50, seed=models.SEED
    )
    train, test = long.randomSplit([0.8, 0.2], seed=models.SEED)
    model = Pipeline(stages=[assembler, rf]).fit(train)
    pred = model.transform(test)
    mse = RegressionEvaluator(
        labelCol="total", predictionCol="prediction", metricName="mse"
    ).evaluate(pred)
    r2 = RegressionEvaluator(
        labelCol="total", predictionCol="prediction", metricName="r2"
    ).evaluate(pred)
    return spark.createDataFrame(
        [(float(mse), float(r2), int(pred.count()))], "mse double, r2 double, n_test long"
    )


@register("ml6_gbt_regression", oracle=None, tags=("ml", "M6"), tables=("events",))
def ml6_gbt_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 GBT regression of daily totals (ref proto:234-288, cleaned — no
    target leakage): one metrics row (mse, n_test)."""
    r = models.gbt_regression(spark.table("events"))
    return spark.createDataFrame(
        [(float(r["mse"]), int(r["n_test"]))], "mse double, n_test long"
    )


@register(
    "ml8_quality_filter",
    oracle=None,  # LR coefficients are engine-specific; agreement with the
    # heuristic label and the keep rate are asserted in tests/test_ml.py
    tags=("ml", "pipeline", "quality"),
    tables=("documents",),
)
def ml8_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus quality filter (the fastText-classifier pass of an
    LLM data pipeline): logistic regression trained on heuristic labels from
    the engine's Catalyst text signals; one metrics row."""
    r = models.quality_filter_model(spark.table("documents"))
    return spark.createDataFrame(
        [
            (
                float(r["accuracy"]),
                float(r["f1"]),
                float(r["keep_rate"]),
                int(r["n_test"]),
            )
        ],
        "accuracy double, f1 double, keep_rate double, n_test long",
    )


@register("ml9_tuned_rf_cv", oracle=None, tags=("ml", "tuning", "cv"), tables=("events",))
def ml9_tuned_rf_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M-extension: CrossValidator-tuned RF (3 folds × 4-point grid,
    parallelism=2) — the distributed hyperparameter sweep the reference's
    fixed sklearn settings imply. One row: winning params + test metrics."""
    r = models.tuned_rf_regression(spark.table("events"))
    return spark.createDataFrame(
        [
            (
                int(r["best_num_trees"]),
                int(r["best_max_depth"]),
                float(r["rmse"]),
                float(r["r2"]),
                int(r["n_test"]),
            )
        ],
        "best_num_trees long, best_max_depth long, rmse double, r2 double, n_test long",
    )
