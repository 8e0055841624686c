"""Versioned keyed-upsert sink for foreachBatch (the st11 pattern).

Each micro-batch merges its per-key aggregate into the latest state version
STRICTLY OLDER than the batch and publishes the result as an immutable new
version directory ``v{batch_id:05d}`` — the plain-parquet expression of what
Delta/Iceberg MERGE does under snapshot isolation.

Effectively-once under replay: Structured Streaming may re-run a batch whose
version directory was written but whose checkpoint commit was lost. Because
the merge reads only versions with id < batch_id, the replay recomputes the
SAME output and the ``mode("overwrite")`` publish is idempotent — reading
"latest version" unconditionally would instead double-count the batch into
its own partial output (covered by tests/test_streaming.py's replay test).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_upsert_batch(state_root: str) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch writer: counter columns accumulate, the
    latest-attribute columns resolve by event recency (max event_id) — the
    CDC materialization contract. The merge is a full-outer join on the key
    of two one-row-per-key frames, so each batch's cost is bounded by its
    own key set plus the state width, never the stream's history."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_dec"),
            F.max("event_id").alias("last_event_id"),
            F.max_by("value", "event_id").alias("last_value"),
        )
        versions = sorted(
            d
            for d in os.listdir(state_root)
            if d.startswith("v") and int(d[1:]) < batch_id
        )
        if versions:
            s = batch_df.sparkSession.read.parquet(
                os.path.join(state_root, versions[-1])
            )
            joined = s.alias("s").join(b.alias("b"), "user_id", "full_outer")
            merged = joined.select(
                "user_id",
                (
                    F.coalesce(F.col("s.n"), F.lit(0))
                    + F.coalesce(F.col("b.n"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("s.total_dec"), F.lit(0).cast("decimal(18,6)"))
                    + F.coalesce(F.col("b.total_dec"), F.lit(0).cast("decimal(18,6)"))
                ).alias("total_dec"),
                F.greatest(
                    F.coalesce(F.col("s.last_event_id"), F.lit(-1)),
                    F.coalesce(F.col("b.last_event_id"), F.lit(-1)),
                ).alias("last_event_id"),
                F.when(
                    F.coalesce(F.col("b.last_event_id"), F.lit(-1))
                    > F.coalesce(F.col("s.last_event_id"), F.lit(-1)),
                    F.col("b.last_value"),
                )
                .otherwise(F.col("s.last_value"))
                .alias("last_value"),
            )
        else:
            merged = b
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{batch_id:05d}")
        )

    return upsert


def latest_state(spark, state_root: str) -> DataFrame:
    """Read the most recently published version."""
    final = sorted(d for d in os.listdir(state_root) if d.startswith("v"))[-1]
    return spark.read.parquet(os.path.join(state_root, final))
