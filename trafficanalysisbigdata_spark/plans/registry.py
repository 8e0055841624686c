"""Named-query registry — the contract surface consumed by __spark_entry__.py.

Each entry pairs a Spark implementation (DataFrame API or spark.sql) with an
ANSI-SQL oracle string that DuckDB runs on the same parquet tables. The driver
compares row-count + schema + order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* floating aggregates are either computed over DECIMAL(18,6) casts (exact,
  order-independent — double sums are not) or rounded on both sides;
* top-k queries carry deterministic tie-breaker keys.

Queries registered without an oracle (``oracle=None``) are non-SQL-expressible
(ML fits, LSH, streaming) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views
from ..session import prep

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import (kept lazy so importing the package
# root stays cheap).
_QUERY_MODULES = (
    "queries_core",
    "queries_ingest",
    "queries_sources",
    "queries_topk",
    "queries_functions",
    "queries_joins",
    "queries_windows",
    "queries_wide",
    "queries_setops",
    "queries_sql",
    "queries_text",
    "queries_olap",
    "queries_pipeline",
    "queries_geo",
    "queries_multimodal",
    "queries_dedup",
    "queries_similarity",
    "queries_streaming",
    "queries_ml",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""
    # tables the query reads; registered as temp views before running
    tables: tuple[str, ...] = field(default_factory=tuple)

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        prep(spark)
        if self.tables:
            register_views(spark, sf_dir, *self.tables)
        return self.fn(spark, sf_dir)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    tables: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a DataFrame-API query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "", tables=tables
        )
        return fn

    return deco


def register_sql(
    name: str,
    sql: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    tables: tuple[str, ...] = (),
    doc: str = "",
) -> None:
    """Register a query whose Spark side is ``spark.sql(sql)``.

    When ``oracle`` is omitted the same ANSI string is used for DuckDB — the
    strongest possible guarantee the two sides agree on semantics.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.sql(sql)

    if name in REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    REGISTRY[name] = QuerySpec(
        name=name,
        fn=fn,
        oracle=sql if oracle is None else oracle,
        tags=tags,
        doc=doc,
        tables=tables,
    )


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # allow partially-built registries while the engine grows
            if mod not in str(e):
                raise
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: spec.run for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}
