"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's dashboard thread accumulates a global in-memory frame across
snapshot fetches (Dash.py:119-131 — one process, one variable). The
Spark-native generalization is per-key managed state: each key's running
aggregate lives in the state store (checkpointed, partitioned, recoverable),
updated once per micro-batch from Arrow-batched pandas — the escape hatch for
stateful logic that watermarked windows can't express (running totals that
never expire, custom counters, per-key model state).

State is bounded by key cardinality, not stream length; at 100 TB/day the
state store shards with the shuffle partitioning of the groupBy key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)
RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})


def stateful_running_totals(stream: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) over an unbounded stream.

    Emits one updated row per key per micro-batch (output mode ``update``);
    the cumulative totals after the final batch equal the batch-mode
    ``groupBy(user_id).agg(count, sum)`` over everything seen — asserted in
    tests/test_streaming.py. NoTimeout: running totals intentionally never
    expire (bounded by key cardinality, not time)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_OUTPUT,
            stateStructType=RUNNING_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
