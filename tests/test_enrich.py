"""http_enrich: the production-shaped per-row fetch stage (reference
test.py:176-178, 419-421 detail/analysis fetches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.operators.enrich import (
    fake_transport,
    flaky_transport,
    http_enrich,
)


def _urls(spark, n=6):
    return spark.range(n).select(
        F.concat(F.lit("https://x/item/"), F.col("id")).alias("url")
    )


def test_enrich_appends_payload_and_passes_rows_through(spark):
    df = _urls(spark)
    out = http_enrich(df, "url").collect()
    assert len(out) == 6
    for r in out:
        assert r.fetch_status == "ok"
        assert r.n_attempts == 1
        assert r.payload == fake_transport(r.url)


def test_enrich_retries_transient_failures_with_attempt_count(spark):
    # each URL fails twice then succeeds -> ok on the 3rd attempt.
    # coalesce(1): the flaky transport's memory is per-process, so the
    # whole frame must flow through one partition for the count to hold.
    df = _urls(spark, 4).coalesce(1)
    out = http_enrich(
        df, "url", transport=flaky_transport(2), max_retries=3, backoff_s=0.001
    ).collect()
    assert len(out) == 4
    assert all(r.fetch_status == "ok" and r.n_attempts == 3 for r in out)


def test_enrich_exhausted_retries_keep_row_with_error_status(spark):
    df = _urls(spark, 3).coalesce(1)
    out = http_enrich(
        df, "url", transport=flaky_transport(99), max_retries=2, backoff_s=0.001
    ).collect()
    assert len(out) == 3  # no dropped rows: budget is enforced downstream
    assert all(r.fetch_status == "error" and r.payload is None for r in out)
    assert all(r.n_attempts == 2 for r in out)


def test_enrich_error_budget_rides_observe(spark):
    from etl_dagster_service_crawler_spark.io.observability import observe_quality

    df = _urls(spark, 5).coalesce(1)
    enriched = http_enrich(
        df, "url", transport=flaky_transport(99), max_retries=1, backoff_s=0.001
    ).withColumn("payload", F.coalesce("payload", F.lit("")))
    gated, obs = observe_quality(enriched, ["payload"])
    gated.collect()
    assert obs.get["n_rows"] == 5
    assert obs.get["n_empty_fields"] == 5  # every fetch failed -> budget data


def test_enrich_rate_limit_spaces_requests(spark):
    import time

    df = _urls(spark, 5).coalesce(1)
    t0 = time.monotonic()
    http_enrich(df, "url", rate_limit_per_sec=20.0).collect()
    # 5 requests at >=50ms spacing -> at least ~200ms wall
    assert time.monotonic() - t0 >= 0.2
