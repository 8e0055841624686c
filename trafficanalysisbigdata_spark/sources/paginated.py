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
    spark.read.format("paginated_json").load("/path/to/pages")        # backfill
    spark.readStream.format("paginated_json").load("/path/to/pages")  # continuous

The streaming form (``PaginatedJsonStreamReader``) turns the reference's
polling refetch loop into a checkpointed Structured Streaming source:
offsets count consumed pages, new pages are picked up per micro-batch, and
committed ranges replay deterministically after restart — exactly-once,
proven in tests/test_ingest.py.
"""

from __future__ import annotations

import importlib
import json
import os
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .traffic import RAW_COLUMNS, RAW_SCHEMA

# A fetcher is the page-transport seam: given a page "address" (here a file
# path; for a live API, a URL with $limit/$offset query params — the
# reference's Socrata contract, TrafficAnalysis.py:31-53) it returns the
# page's records. Swapping file transport for HTTP is a config change
# (`fetcher` option naming a module:callable), not an edit to read().
PageFetcher = Callable[[str], "list[dict]"]


def fetch_page_file(path: str) -> list[dict]:
    """Default fetcher: one JSONL page file → its records."""
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
    return out


class FetchError(RuntimeError):
    """A page fetch failed after exhausting its retry budget."""


# Per-process fetch-start times by rate group. Spacing state must OUTLIVE one
# RetryingFetcher: the DataSource builds a fresh fetcher per partition and a
# partition fetches exactly one page, so instance-local state would make the
# rate limit a silent no-op. Keyed module state spans the sequential tasks a
# reused Python worker executes — per-worker spacing = min_interval_s, so the
# aggregate rate against the API is n_parallel_workers / min_interval_s.
_RATE_STATE: dict[str, float] = {}


class RetryingFetcher:
    """Wrap a fetcher with retry + rate-limit — the operational half of the
    reference's paginated-API contract its driver loop never had.

    * ``retries``: attempts after the first failure; exponential backoff
      ``backoff_s * 2**attempt`` between tries.
    * ``min_interval_s``: minimum spacing between fetch *starts*. With
      ``rate_key`` set the spacing state is PER WORKER PROCESS (module
      level), so it holds across the one-page-per-task DataSource pattern;
      with N parallel workers the aggregate rate is N/min_interval — size
      accordingly for a rate-limited API. Without ``rate_key`` the state is
      per instance (driver-side multi-page loops, unit tests).
    * ``sleep``/``clock`` are injectable for deterministic tests.
    """

    def __init__(
        self,
        fetch: PageFetcher,
        retries: int = 3,
        backoff_s: float = 0.5,
        min_interval_s: float = 0.0,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
        rate_key: str | None = None,
    ) -> None:
        self.fetch = fetch
        self.retries = retries
        self.backoff_s = backoff_s
        self.min_interval_s = min_interval_s
        self.sleep = sleep
        self.clock = clock
        self.rate_key = rate_key
        self._last_start: float | None = None

    def _get_last(self) -> float | None:
        if self.rate_key is not None:
            return _RATE_STATE.get(self.rate_key)
        return self._last_start

    def _set_last(self, t: float) -> None:
        if self.rate_key is not None:
            _RATE_STATE[self.rate_key] = t
        else:
            self._last_start = t

    def __call__(self, address: str) -> list[dict]:
        last = self._get_last()
        if self.min_interval_s and last is not None:
            wait = last + self.min_interval_s - self.clock()
            if wait > 0:
                self.sleep(wait)
        self._set_last(self.clock())
        err: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                return self.fetch(address)
            except Exception as e:  # noqa: BLE001 — transport errors are opaque
                err = e
                if attempt < self.retries:
                    delay = self.backoff_s * (2**attempt)
                    # HTTP 429 contract: when the transport attached the
                    # server's Retry-After (sources/http.py sets
                    # ``retry_after_s``), honor it — sleep at least that
                    # long, never less because our backoff happened to be
                    # smaller.
                    retry_after = getattr(e, "retry_after_s", None)
                    if retry_after is not None:
                        delay = max(delay, float(retry_after))
                    self.sleep(delay)
        raise FetchError(f"page fetch failed after {self.retries + 1} attempts: {address}") from err


def _resolve_fetcher(options: dict) -> PageFetcher:
    """Build the configured fetcher: ``fetcher`` is a ``module:callable``
    dotted path (default: the file transport); retry/rate options apply on
    top. Resolution happens on the executor (the reader is pickled by
    reference to its options), so the callable must be importable there."""
    spec = options.get("fetcher")
    if spec:
        mod, _, attr = spec.partition(":")
        base: PageFetcher = getattr(importlib.import_module(mod), attr)
    else:
        base = fetch_page_file
    retries = int(options.get("retries", 0))
    min_interval_s = float(options.get("min_interval_s", 0.0))
    if retries or min_interval_s:
        return RetryingFetcher(
            base,
            retries=retries,
            backoff_s=float(options.get("backoff_s", 0.5)),
            min_interval_s=min_interval_s,
            # per-process spacing across this source's one-page tasks
            rate_key=options.get("path", "paginated_json"),
        )
    return base


@dataclass
class PagePartition(InputPartition):
    path: str


class PaginatedJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.columns = schema.fieldNames()
        self.dir = options["path"]
        self.options = dict(options)
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
        """Runs on an executor: fetch one page via the configured transport,
        emit all-strings rows with permissive NULLs for absent keys (the
        Socrata JSON contract). Pushed equality filters apply here, before
        rows enter Spark."""
        fetcher = _resolve_fetcher(self.options)
        for rec in fetcher(partition.path):
            if any(
                rec.get(k) is None or str(rec[k]) != v
                for k, v in self.pushed.items()
            ):
                continue
            yield tuple(
                None if rec.get(c) is None else str(rec[c]) for c in self.columns
            )


class PaginatedJsonStreamReader(SimpleDataSourceStreamReader):
    """CONTINUOUS paginated ingest (Spark 4 Python streaming source): the
    reference's polling refetch loop (TrafficAnalysis.py re-pulls the feed
    each run) as a real Structured Streaming source with exactly-once
    offsets. The offset is the count of pages consumed — ``read`` picks up
    every page past it (new pages appearing in the directory = new data at
    the API), and ``readBetweenOffsets`` replays a committed range
    deterministically after restart, which is what makes checkpoint
    recovery exactly-once.

    Scale note: the Simple stream-reader API reads on the DRIVER (Spark
    ships the rows to executors) — right for a rate-limited API feed whose
    ingest volume is bounded by the API, not the cluster; the batch
    DataSource above stays the bulk-backfill path with one TASK per page."""

    def __init__(self, schema: StructType, options: dict):
        self.columns = schema.fieldNames()
        self.dir = options["path"]
        self.options = dict(options)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _pages(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.dir) if f.startswith("page-") and f.endswith(".json")
        )

    def _rows(self, names: list[str]) -> list[tuple]:
        # a LIST, not a generator: the streaming runner pickles the
        # prefetched batch to replay it into the micro-batch plan
        fetcher = _resolve_fetcher(self.options)
        return [
            tuple(None if rec.get(c) is None else str(rec[c]) for c in self.columns)
            for name in names
            for rec in fetcher(os.path.join(self.dir, name))
        ]

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        pages = self._pages()
        n0 = int(start["page"])
        batch = pages[n0:]
        return self._rows(batch), {"page": n0 + len(batch)}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._rows(self._pages()[int(start["page"]) : int(end["page"])])


class PaginatedJsonDataSource(DataSource):
    """``spark.read.format("paginated_json").load(dir)`` — the reference's
    paginated ingest as a planned, partitioned Spark scan; or
    ``spark.readStream`` for the continuous polling form."""

    @classmethod
    def name(cls) -> str:
        return "paginated_json"

    def schema(self) -> StructType:
        return RAW_SCHEMA

    def reader(self, schema: StructType) -> PaginatedJsonReader:
        return PaginatedJsonReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> PaginatedJsonStreamReader:
        return PaginatedJsonStreamReader(schema, self.options)


__all__ = [
    "FetchError",
    "PaginatedJsonDataSource",
    "PaginatedJsonReader",
    "PaginatedJsonStreamReader",
    "RAW_COLUMNS",
    "RAW_SCHEMA",
    "RetryingFetcher",
    "fetch_page_file",
]
