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

No network: the fetcher is a deterministic fake (this is the test/CI
configuration; a real deployment swaps `_fetch_page` for an HTTP call
— the Spark plumbing is identical). Field derivation is pure
arithmetic so the whole source is DuckDB-oracle-checkable.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

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


def _fetch_page(
    kidx: int, keyword: str, page: int, slots: int, delay_ms: int
) -> list[tuple]:
    """Deterministic fake of one listing-page fetch (the reference's
    driver.get + card scan, test.py:135,160). Swap for HTTP in prod."""
    if delay_ms:
        time.sleep(delay_ms / 1000.0)
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


class _Options:
    def __init__(self, options: dict):
        self.keywords = [
            k for k in options.get("keywords", DEFAULT_KEYWORDS).split(",") if k
        ]
        self.pages = int(options.get("pages", DEFAULT_PAGES))
        self.slots = int(options.get("slots", DEFAULT_SLOTS))
        self.delay_ms = int(options.get("page_delay_ms", 0))


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
        yield from _fetch_page(kidx, keyword, page, self.opts.slots, self.opts.delay_ms)


class CrawlStreamReader(SimpleDataSourceStreamReader):
    """One page per keyword per micro-batch; stops advancing at
    max_pages (the reference's no-new-rows scroll stop)."""

    def __init__(self, options: dict):
        self.opts = _Options(options)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        page = start["page"]
        if page >= self.opts.pages:
            return iter([]), start  # no new rows: empty batch, offset holds
        rows: list[tuple] = []
        for kidx, kw in enumerate(self.opts.keywords):
            rows.extend(
                _fetch_page(kidx, kw, page, self.opts.slots, self.opts.delay_ms)
            )
        return iter(rows), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows: list[tuple] = []
        for page in range(start["page"], end["page"]):
            for kidx, kw in enumerate(self.opts.keywords):
                rows.extend(
                    _fetch_page(kidx, kw, page, self.opts.slots, self.opts.delay_ms)
                )
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
