"""Table loaders / sinks over the driver's parquet fixtures.

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning, and (when the layout is partitioned) partition pruning. At
cluster scale the same loaders work against a partitioned/bucketed lakehouse
layout — see ``write_partitioned``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (region and
# nation are bounded by geography; supplier/part/customer grow with SF but the
# *driver fixtures* keep them tiny — joins against them take a broadcast hint
# only where the table is bounded in principle).
BROADCAST_SAFE = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (see session.RUNTIME_CONFS); convert
        # to microsecond timestamp with integer division — ts/1000 in floating
        # point would lose precision above 2^53 ns (~1970+104 days).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the named tables (default: all) as temp views for spark.sql."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Scale-path sink: date/key-partitioned, optionally bucketed, parquet.

    Bucketing co-locates later joins/aggregations on the bucket keys without a
    shuffle; it requires a managed table (``saveAsTable``).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketed writes need table_name for saveAsTable")
        writer.option("path", path).bucketBy(n, *cols).sortBy(*cols).saveAsTable(table_name)
        return
    writer.save(path)


def write_sorted(df: DataFrame, path: str, sort_col: str, n_files: int) -> None:
    """Range-partitioned, sorted parquet layout — the zone-map/data-skipping
    strategy for range-filtered scans (time-series facts above all): rows are
    range-partitioned on ``sort_col`` into ``n_files`` disjoint spans and
    sorted within each, so every file's parquet footer carries a TIGHT
    min/max for the column. A later range predicate prunes whole files and
    row groups at planning/scan time — bytes read scale with the predicate's
    span, not the table. The same layout is what table formats call
    clustering/Z-ordering in the single-column case.
    """
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )
