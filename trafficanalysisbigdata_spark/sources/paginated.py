"""S1 as a first-class Spark source: a custom Python DataSource for
paginated JSON ingest.

The reference fetches its corpus page by page from a rate-limited HTTP API
(QuickFetch-style limit/offset pagination) and concatenates pages in the
driver process. The Spark-native shape is a DataSourceV2: each PAGE becomes
an InputPartition, so page fetches run as parallel tasks on executors, the
driver never holds the corpus, and Catalyst treats the result like any other
relation (projection/filter sit above the scan; a real API source would
implement ``pushFilters`` to turn predicates into server-side query params —
the reference's S3 operator).

No network in this environment, so pagination is simulated over a directory
of page files (``page-*.json``, one JSON object per line) — the partition
planning, per-task parsing, all-strings schema, and permissive NULLs are the
real contract, identical to what an HTTP ``read()`` would return. Register
and read with:

    spark.dataSource.register(PaginatedJsonDataSource)
    spark.read.format("paginated_json").load("/path/to/pages")
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

from .traffic import RAW_COLUMNS, RAW_SCHEMA


@dataclass
class PagePartition(InputPartition):
    path: str


class PaginatedJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.columns = schema.fieldNames()
        self.dir = options["path"]
        self.pushed: dict[str, str] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """S3 — server-side filtering: accept top-level equality filters
        (what the reference's API encodes as query params, QuickFetch-style
        ``?borough=Queens``) and apply them during the page read, so filtered
        rows never enter Spark. Everything else is returned for Spark to
        evaluate above the scan — partial pushdown is the contract."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self.pushed[f.attribute[0]] = str(f.value)
            else:
                yield f

    def partitions(self) -> list[PagePartition]:
        """One partition per page — the parallel unit is the page fetch."""
        pages = sorted(
            f for f in os.listdir(self.dir) if f.startswith("page-") and f.endswith(".json")
        )
        return [PagePartition(os.path.join(self.dir, f)) for f in pages]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        """Runs on an executor: parse one page, emit all-strings rows with
        permissive NULLs for absent keys (the Socrata JSON contract)."""
        with open(partition.path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if any(
                    rec.get(k) is None or str(rec[k]) != v
                    for k, v in self.pushed.items()
                ):
                    continue
                yield tuple(
                    None if rec.get(c) is None else str(rec[c]) for c in self.columns
                )


class PaginatedJsonDataSource(DataSource):
    """``spark.read.format("paginated_json").load(dir)`` — the reference's
    paginated ingest as a planned, partitioned Spark scan."""

    @classmethod
    def name(cls) -> str:
        return "paginated_json"

    def schema(self) -> StructType:
        return RAW_SCHEMA

    def reader(self, schema: StructType) -> PaginatedJsonReader:
        return PaginatedJsonReader(schema, self.options)


__all__ = ["PaginatedJsonDataSource", "PaginatedJsonReader", "RAW_COLUMNS", "RAW_SCHEMA"]
