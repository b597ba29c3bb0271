"""Tests for the custom crawl DataSource (reference S1/S2/O3)."""

from __future__ import annotations

from etl_dagster_service_crawler_spark.sources.crawl_source import register
from etl_dagster_service_crawler_spark.workloads.sources_wl import (
    q_source_crawl_scan,
    q_source_crawl_stream,
)


def test_batch_scan_fans_out_one_task_per_keyword_page(spark):
    register(spark)
    df = (
        spark.read.format("crawl")
        .option("keywords", "a,b")
        .option("pages", "2")
        .option("slots", "3")
        .load()
    )
    assert df.count() == 2 * 2 * 3
    assert df.rdd.getNumPartitions() == 2 * 2


def test_stream_drain_equals_batch_scan(spark, sf_dir):
    batch = {tuple(r) for r in q_source_crawl_scan(spark, sf_dir).collect()}
    streamed = {tuple(r) for r in q_source_crawl_stream(spark, sf_dir).collect()}
    assert streamed == batch and len(batch) > 0


_FLAKY_SRC = '''
"""Injected test transports (shipped to workers via addPyFile)."""
CALLS = {}

def marked(kidx, keyword, page, slots):
    return [(keyword, page, s, kidx * 10_000 + page * 100 + s,
             f"CUSTOM-{keyword}-{page}-{s}", "https://example.com/x")
            for s in range(slots)]

def fail_first_attempt(kidx, keyword, page, slots):
    key = (keyword, page)
    CALLS[key] = CALLS.get(key, 0) + 1
    if CALLS[key] == 1:
        raise ConnectionError(f"injected transient failure for {key}")
    return marked(kidx, keyword, page, slots)

def always_fail_etl(kidx, keyword, page, slots):
    if keyword == "etl":
        raise ConnectionError("injected permanent failure for etl")
    return marked(kidx, keyword, page, slots)
'''


def _write_transport_module(tmp_path):
    mod = tmp_path / "crawl_test_transport.py"
    mod.write_text(_FLAKY_SRC)
    return mod


def test_batch_transport_plugs_in_by_dotted_path(spark, tmp_path):
    """A custom transport named by option('transport') must be resolved
    on the WORKER (addPyFile-shipped module) — the deployment seam the
    reference fills with driver.get (test.py:135)."""
    mod = _write_transport_module(tmp_path)
    spark.sparkContext.addPyFile(str(mod))
    register(spark)
    df = (
        spark.read.format("crawl")
        .option("keywords", "a,b")
        .option("pages", "2")
        .option("slots", "2")
        .option("transport", "crawl_test_transport:marked")
        .load()
    )
    titles = [r.title for r in df.collect()]
    assert len(titles) == 2 * 2 * 2
    assert all(t.startswith("CUSTOM-") for t in titles)


def test_transport_retry_recovers_transient_failures(spark, tmp_path):
    """One transient failure per page must be absorbed by fetch_retries
    — the reference's per-fetch try/except (test.py:129-144)."""
    import sys

    from etl_dagster_service_crawler_spark.sources.crawl_source import (
        CrawlStreamReader,
    )

    _write_transport_module(tmp_path)
    sys.path.insert(0, str(tmp_path))
    try:
        reader = CrawlStreamReader(
            {
                "keywords": "a,b",
                "pages": "2",
                "slots": "2",
                "transport": "crawl_test_transport:fail_first_attempt",
                "fetch_retries": "1",
            }
        )
        rows, off = reader.read(reader.initialOffset())
        rows = list(rows)
        assert off == {"page": 1}
        assert len(rows) == 2 * 2  # both keywords recovered on attempt 2
        assert all(r[4].startswith("CUSTOM-") for r in rows)
    finally:
        sys.path.remove(str(tmp_path))


def test_transport_error_budget_skips_then_trips(spark, tmp_path):
    """A permanently failing keyword consumes one budget unit per page
    (rows skipped); once failures exceed the budget the reader raises —
    the reference's give-up counter (test.py:129-144)."""
    import sys

    import pytest

    from etl_dagster_service_crawler_spark.sources.crawl_source import (
        CrawlStreamReader,
    )

    _write_transport_module(tmp_path)
    sys.path.insert(0, str(tmp_path))
    try:
        opts = {
            "keywords": "a,etl,b",
            "pages": "2",
            "slots": "2",
            "transport": "crawl_test_transport:always_fail_etl",
            "fetch_retries": "0",
            "error_budget": "1",
        }
        reader = CrawlStreamReader(opts)
        rows, _ = reader.read(reader.initialOffset())
        rows = list(rows)
        # page 0: 'etl' failed within budget -> skipped, others fetched
        assert len(rows) == 2 * 2
        assert {r[0] for r in rows} == {"a", "b"}
        # page 1: second failure exceeds budget=1 -> raises
        with pytest.raises(RuntimeError, match="error budget exhausted"):
            list(reader.read({"page": 1})[0])

        # budget 0: the very first failure trips
        strict = CrawlStreamReader({**opts, "error_budget": "0"})
        with pytest.raises(RuntimeError, match="error budget exhausted"):
            list(strict.read(strict.initialOffset())[0])
    finally:
        sys.path.remove(str(tmp_path))


def test_frontier_schedule_politeness_invariants(spark, sf_dir):
    """Per host: slots strictly FRONTIER_HOST_DELAY apart, priority by
    n_chars desc (doc_id tiebreak), stagger stable per host and inside
    [0, delay)."""
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        FRONTIER_HOST_DELAY,
        q_crawl_frontier_schedule,
    )

    rows = q_crawl_frontier_schedule(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    assert any(len(v) > 1 for v in by_host.values())
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["host_rank"])
        assert [r["host_rank"] for r in rs] == list(range(len(rs)))
        staggers = {r["fetch_slot"] - r["host_rank"] * FRONTIER_HOST_DELAY
                    for r in rs}
        assert len(staggers) == 1
        assert 0 <= staggers.pop() < FRONTIER_HOST_DELAY
        # priority order: n_chars desc, doc_id asc
        key = [( -docs[r["doc_id"]]["n_chars"], r["doc_id"]) for r in rs]
        assert key == sorted(key)
        # politeness: consecutive fetches of one host are >= delay apart
        slots = [r["fetch_slot"] for r in rs]
        assert all(b - a == FRONTIER_HOST_DELAY
                   for a, b in zip(slots, slots[1:]))


def test_frontier_fetch_executes_politeness(spark, sf_dir):
    """r12 verdict item 6: the frontier plan is load-bearing at fetch
    time. Pins the execution contract of frontier_fetch: (a) every
    host's fetches land in exactly ONE partition (http_enrich's
    politeness domain), (b) rows reach the transport in ascending
    fetch_slot order within each partition (mapInPandas consumes rows
    in partition order, and the fetched output preserves it), and
    (c) consecutive fetches of a host are >= FRONTIER_HOST_DELAY slots
    apart — so a slot-paced worker enforces the reference's per-host
    delays by construction."""
    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        FRONTIER_HOST_DELAY,
        frontier_fetch,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    with_url = d.withColumn(
        "url", F.expr("'https://example.com/job/' || CAST(doc_id AS STRING)")
    )
    fetched = frontier_fetch(with_url, "url", "source", "n_chars")
    # spark_partition_id AFTER the fetch: a projection moves no rows,
    # so this is the partition the transport ran in, and collect()
    # preserves each partition's row order = execution order
    rows = (
        fetched.withColumn("pid", F.spark_partition_id())
        .select("pid", "source", "fetch_slot", "fetch_status")
        .collect()
    )
    assert rows and all(r["fetch_status"] == "ok" for r in rows)

    by_pid: dict[int, list] = {}
    host_pids: dict[str, set] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r)
        host_pids.setdefault(r["source"], set()).add(r["pid"])
    # (a) one politeness domain per host
    assert all(len(pids) == 1 for pids in host_pids.values()), host_pids
    for pid, rs in by_pid.items():
        # (b) execution order is ascending slot order
        slots = [r["fetch_slot"] for r in rs]
        assert slots == sorted(slots), f"partition {pid} not slot-ordered"
        # (c) per-host spacing >= FRONTIER_HOST_DELAY in execution order
        last: dict[str, int] = {}
        for r in rs:
            if r["source"] in last:
                assert r["fetch_slot"] - last[r["source"]] >= FRONTIER_HOST_DELAY
            last[r["source"]] = r["fetch_slot"]


def _assert_record_fetch_politeness(rows, delay):
    """Shared contract assertions for _record_fetch_stage execution
    order: one partition per host, ascending slot order per partition,
    exact per-host slot spacing, and within a host ascending doc_id —
    the reference's scan order (constant priority -> id tiebreak)."""
    assert rows
    by_pid: dict[int, list] = {}
    host_pids: dict[str, set] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r)
        host_pids.setdefault(r["source"], set()).add(r["pid"])
    assert all(len(pids) == 1 for pids in host_pids.values()), host_pids
    for pid, rs in by_pid.items():
        slots = [r["fetch_slot"] for r in rs]
        assert slots == sorted(slots), f"partition {pid} not slot-ordered"
        last: dict[str, tuple] = {}
        for r in rs:
            if r["source"] in last:
                lslot, ldoc = last[r["source"]]
                assert r["fetch_slot"] - lslot == delay
                assert r["doc_id"] > ldoc, "not reference scan order"
            last[r["source"]] = (r["fetch_slot"], r["doc_id"])


def test_record_fetch_stage_executes_politeness(spark, sf_dir):
    """r13: politeness is executed in the TERMINAL-RECORD pipeline too
    — _record_fetch_stage drives the detail fetch through
    frontier_fetch, and the analysis fetch (second narrow map, order
    preserved) inherits the spacing. Both payloads land."""
    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        FRONTIER_HOST_DELAY,
        _record_fetch_stage,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    both = _record_fetch_stage(d)
    rows = (
        both.withColumn("pid", F.spark_partition_id())
        .select("pid", "source", "fetch_slot", "doc_id",
                F.col("detail_html").isNotNull().alias("has_detail"),
                F.col("ana_html").isNotNull().alias("has_ana"))
        .collect()
    )
    assert all(r["has_detail"] and r["has_ana"] for r in rows)
    _assert_record_fetch_politeness(rows, FRONTIER_HOST_DELAY)


def test_record_fetch_stage_politeness_holds_per_microbatch_slice(spark, sf_dir):
    """The at-ingest shape: q_stream_crawl_record applies the transform
    per micro-batch inside foreachBatch, so the politeness contract
    must hold on an arbitrary SLICE of the corpus — the frontier window
    re-slots within whatever the epoch delivered."""
    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        FRONTIER_HOST_DELAY,
        _record_fetch_stage,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    ).where(F.col("doc_id") % 4 == 1)
    assert d.count() > 0
    rows = (
        _record_fetch_stage(d)
        .withColumn("pid", F.spark_partition_id())
        .select("pid", "source", "fetch_slot", "doc_id")
        .collect()
    )
    _assert_record_fetch_politeness(rows, FRONTIER_HOST_DELAY)
