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
