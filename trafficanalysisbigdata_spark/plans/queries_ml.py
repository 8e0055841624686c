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


@register("ml6_gbt_regression", oracle=None, tags=("ml", "M6"), tables=("events",))
def ml6_gbt_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 GBT regression of daily totals (ref proto:234-288, cleaned — no
    target leakage): one metrics row (mse, n_test)."""
    r = models.gbt_regression(spark.table("events"))
    return spark.createDataFrame(
        [(float(r["mse"]), int(r["n_test"]))], "mse double, n_test long"
    )
