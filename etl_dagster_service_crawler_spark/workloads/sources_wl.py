"""Custom-source operator surface (SURVEY §2.A S1/S2/O3): the crawl
DataSource registered through spark.dataSource.register, scanned in
batch and incrementally in streaming.

The fake fetcher is deterministic arithmetic, so BOTH entries are
fully oracle-checkable — the source contract itself (fan-out,
pagination, exactly-once file sink) is what's under test, not the
fake content.
"""

from __future__ import annotations

import hashlib
import shutil

from pyspark.sql import DataFrame, SparkSession

from etl_dagster_service_crawler_spark.core import QuerySpec
from etl_dagster_service_crawler_spark.sources.crawl_source import (
    CRAWL_SCHEMA,
    DEFAULT_KEYWORDS,
    DEFAULT_PAGES,
    register,
)

_KEYWORDS = DEFAULT_KEYWORDS.split(",")

_ORACLE_BASE = f"""
WITH kw AS (
  SELECT * FROM (VALUES {", ".join(f"('{k}', {i})" for i, k in enumerate(_KEYWORDS))})
       AS t(keyword, kidx)
), p AS (SELECT CAST(unnest(range(0, {DEFAULT_PAGES})) AS INT) AS page),
   s AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS slot)
SELECT keyword, page, slot,
       CAST(kidx * 10000 + page * 100 + slot AS BIGINT) AS job_id,
       'job-' || keyword || '-' || CAST(kidx * 10000 + page * 100 + slot AS VARCHAR) AS title,
       'https://example.com/company/'
         || CAST((kidx * 10000 + page * 100 + slot) % 37 AS VARCHAR) AS company_url
FROM kw, p, s
"""


def q_source_crawl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: batch scan of the registered source — one task per
    (keyword, page)."""
    register(spark)
    return spark.read.format("crawl").load()


def q_source_crawl_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/O1: incremental scan — each availableNow run consumes one
    page per keyword from the stream offset (one "cron tick" of the
    reference, definitions.py:35); the checkpointed file sink makes the
    union of runs exactly-once. Drained result == the batch scan."""
    register(spark)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/crawl"
    shutil.rmtree(base, ignore_errors=True)
    out_dir, ckpt = f"{base}/out", f"{base}/ckpt"
    for _ in range(DEFAULT_PAGES + 1):
        s = spark.readStream.format("crawl").load()
        q = (
            s.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise TimeoutError("crawl stream drain still running after 120s")
    return spark.read.schema(CRAWL_SCHEMA).parquet(out_dir)


def q_pipeline_crawl_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4 production shape: scan -> per-row detail fetch
    (mapInPandas http_enrich: per-partition rate limit, bounded retry,
    deterministic md5 transport) -> error-budget observation. The fake
    transport is md5-derived, so even the FETCHED payload is
    oracle-checked — the operator contract (row fan-through, status
    columns, no dropped rows) is verified end to end."""
    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.io.observability import observe_quality
    from etl_dagster_service_crawler_spark.operators.enrich import http_enrich

    register(spark)
    raw = spark.read.format("crawl").load()
    enriched = http_enrich(raw, "company_url", rate_limit_per_sec=None)
    gated, _obs = observe_quality(
        enriched.withColumn(
            "payload", F.coalesce(F.col("payload"), F.lit(""))
        ),
        ["payload"],
    )
    return gated.where(F.col("fetch_status") == "ok").select(
        "keyword", "job_id", "payload", "fetch_status", "n_attempts"
    )


_ORACLE_ENRICHED = f"""
WITH base AS ({_ORACLE_BASE})
SELECT keyword, job_id,
       'd-' || substr(md5(company_url), 1, 8) AS payload,
       'ok' AS fetch_status,
       CAST(1 AS INT) AS n_attempts
FROM base
"""


SPECS = [
    QuerySpec("pipeline_crawl_enriched", q_pipeline_crawl_enriched, _ORACLE_ENRICHED),
    QuerySpec("source_crawl_scan", q_source_crawl_scan, _ORACLE_BASE),
    QuerySpec("source_crawl_stream", q_source_crawl_stream, _ORACLE_BASE),
]
