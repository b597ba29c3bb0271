"""Custom PySpark DataSource: the reference's crawl source, Spark-first.

The reference's "table scan" is a Selenium crawl: one listing page per
keyword (S1, reference test.py:129-144), an infinite-scroll pagination
loop with a no-new-rows stop (S2, test.py:151-170, 557-566), and
time.sleep politeness between fetches (O3, test.py:135,178,525,560).
Here that becomes a `spark.dataSource.register`-able source:

- batch:   one InputPartition per (keyword, page) — the fetch fan-out
           the reference does serially runs as parallel Spark tasks.
- stream:  SimpleDataSourceStreamReader; each micro-batch is one page
           ("scroll") per keyword until max_pages — the scheduled
           incremental scan, with the empty batch as the stop signal.
- politeness: option("page_delay_ms") sleeps per fetched page inside
           the reader task — rate limiting lives in the source, not
           the query plan.

The TRANSPORT — the thing that fetches one listing page — is a
pluggable seam: `option("transport", "my_module:fetch")` names a
callable `(kidx, keyword, page, slots) -> iterable[tuple]` resolved by
dotted path INSIDE the reader (worker-side), so a real HTTP fetcher
drops in via a packaged module or `sc.addPyFile` without editing this
file; `option("transport", "http://host/listing")` short-cuts to the
built-in urllib listing transport
(operators/transport.http_page_transport) against that endpoint. The
default is a deterministic fake (the no-network test/CI configuration;
field derivation is pure arithmetic so the whole source is
DuckDB-oracle-checkable).

Resilience wraps the transport, mirroring the reference's per-fetch
try/except + give-up counter (test.py:129-144):

- option("fetch_retries", default 2): attempts per page = retries + 1.
- option("error_budget", default 0): pages allowed to fail ALL their
  attempts before the reader raises; a budgeted failure yields no rows
  (the page is skipped, like the reference logging-and-continuing).
  The budget is per reader instance: per input partition in batch
  (one page each, so >0 means "tolerate this page"), cumulative across
  micro-batches in the stream (the reader lives on the driver for the
  whole run — the reference's sequential crawl-loop semantics).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

CRAWL_SCHEMA = (
    "keyword string, page int, slot int, job_id bigint, "
    "title string, company_url string"
)

DEFAULT_KEYWORDS = "spark,etl,data"
DEFAULT_PAGES = 3
DEFAULT_SLOTS = 10


def _fetch_page(kidx: int, keyword: str, page: int, slots: int) -> list[tuple]:
    """Deterministic fake of one listing-page fetch (the reference's
    driver.get + card scan, test.py:135,160) — the default transport."""
    rows = []
    for slot in range(slots):
        job_id = kidx * 10_000 + page * 100 + slot
        rows.append(
            (
                keyword,
                page,
                slot,
                job_id,
                f"job-{keyword}-{job_id}",
                f"https://example.com/company/{job_id % 37}",
            )
        )
    return rows


def _resolve_transport(spec: str | None) -> Callable[[int, str, int, int], list]:
    """Transport lookup, resolved at first fetch IN THE PROCESS THAT
    FETCHES — workers for batch, the driver for the simple stream
    reader — so addPyFile-shipped modules resolve:

    - ``http://...`` / ``https://...``: a real listing endpoint —
      operators/transport.http_page_transport bound to that base URL
      (one GET per page, JSON rows).
    - ``pkg.mod:fn`` (or ``pkg.mod.fn``): dotted-path callable.
    - empty: the deterministic no-network fake."""
    if not spec:
        return _fetch_page
    if spec.startswith(("http://", "https://")):
        from etl_dagster_service_crawler_spark.operators.transport import (
            http_page_transport,
        )

        return http_page_transport(spec)
    import importlib

    mod, _, attr = spec.partition(":")
    if not attr:
        mod, _, attr = spec.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


class _Options:
    def __init__(self, options: dict):
        self.keywords = [
            k for k in options.get("keywords", DEFAULT_KEYWORDS).split(",") if k
        ]
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.slots = int(options.get("slots", DEFAULT_SLOTS))
        self.delay_ms = int(options.get("page_delay_ms", 0))
        self.transport = options.get("transport") or None
        self.retries = int(options.get("fetch_retries", 2))
        self.error_budget = int(options.get("error_budget", 0))


class _Fetcher:
    """Transport + politeness + retry + error budget, shared by both
    readers. One instance per reader object — its failure count IS the
    budget scope (see module docstring)."""

    def __init__(self, opts: _Options):
        self.opts = opts
        self.failed = 0
        self._fn: Callable | None = None

    def fetch(self, kidx: int, keyword: str, page: int) -> list[tuple]:
        if self._fn is None:
            self._fn = _resolve_transport(self.opts.transport)
        if self.opts.delay_ms:
            time.sleep(self.opts.delay_ms / 1000.0)
        from etl_dagster_service_crawler_spark.operators.enrich import (
            PermanentFetchError,
        )

        last: Exception | None = None
        for _attempt in range(self.opts.retries + 1):
            try:
                return list(self._fn(kidx, keyword, page, self.opts.slots))
            except PermanentFetchError as exc:
                last = exc
                break  # 4xx: re-fetching cannot change the answer
            except Exception as exc:  # transport errors only — policy decides
                last = exc
        self.failed += 1
        if self.failed > self.opts.error_budget:
            raise RuntimeError(
                f"crawl error budget exhausted: {self.failed} page(s) failed "
                f"all {self.opts.retries + 1} attempts "
                f"(budget {self.opts.error_budget}); last page "
                f"({keyword!r}, {page})"
            ) from last
        return []


class CrawlBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.opts = _Options(options)

    def partitions(self) -> list[InputPartition]:
        # one task per (keyword, page): the unit of fetch parallelism —
        # at scale this is exactly the fan-out knob (#keywords x #pages
        # tasks spread over executors, each rate-limited independently)
        o = self.opts
        return [
            InputPartition((k, kw, p))
            for k, kw in enumerate(o.keywords)
            for p in range(o.pages)
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        kidx, keyword, page = partition.value
        # fresh fetcher per partition: the error budget scopes to the
        # task, and the transport import happens worker-side
        yield from _Fetcher(self.opts).fetch(kidx, keyword, page)


class CrawlStreamReader(SimpleDataSourceStreamReader):
    """One page per keyword per micro-batch; stops advancing at
    max_pages (the reference's no-new-rows scroll stop)."""

    def __init__(self, options: dict):
        self.opts = _Options(options)
        # one fetcher for the reader's whole life (driver-side): the
        # error budget accumulates across micro-batches, like the
        # reference's sequential crawl loop's give-up counter
        self.fetcher = _Fetcher(self.opts)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        page = start["page"]
        if page >= self.opts.pages:
            return iter([]), start  # no new rows: empty batch, offset holds
        rows: list[tuple] = []
        for kidx, kw in enumerate(self.opts.keywords):
            rows.extend(self.fetcher.fetch(kidx, kw, page))
        return iter(rows), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows: list[tuple] = []
        for page in range(start["page"], end["page"]):
            for kidx, kw in enumerate(self.opts.keywords):
                rows.extend(self.fetcher.fetch(kidx, kw, page))
        return iter(rows)


class CrawlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawl"

    def schema(self) -> str:
        return CRAWL_SCHEMA

    def reader(self, schema) -> CrawlBatchReader:
        return CrawlBatchReader(self.options)

    def simpleStreamReader(self, schema) -> CrawlStreamReader:
        return CrawlStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CrawlDataSource)
