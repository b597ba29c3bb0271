"""Declared engine capability surface: every SURVEY.md §2 operator as a
QuerySpec (PySpark query + DuckDB oracle). Assembled by registry()."""

from __future__ import annotations

from etl_dagster_service_crawler_spark.core import QuerySpec


def registry() -> dict[str, QuerySpec]:
    from etl_dagster_service_crawler_spark.workloads import (
        io_wl,
        joins_wl,
        relational,
        udf_wl,
    )

    from etl_dagster_service_crawler_spark.plans.pipeline import (
        CRAWL_E2E_SQL,
        PIPELINE_SUMMARY_SQL,
        crawl_e2e,
        pipeline_summary,
    )

    specs: list[QuerySpec] = []
    specs += relational.SPECS
    specs += joins_wl.SPECS
    specs += io_wl.SPECS
    specs += udf_wl.SPECS
    specs.append(
        QuerySpec("pipeline_crawl_summary", pipeline_summary, PIPELINE_SUMMARY_SQL, bench=True)
    )
    specs.append(QuerySpec("pipeline_crawl_e2e", crawl_e2e, CRAWL_E2E_SQL))
    for mod_name in ("llm", "streaming_wl", "sources_wl"):
        try:
            mod = __import__(
                f"etl_dagster_service_crawler_spark.workloads.{mod_name}",
                fromlist=["SPECS"],
            )
            specs += mod.SPECS
        except ImportError:
            pass
    out: dict[str, QuerySpec] = {}
    for s in specs:
        if s.name in out:
            raise ValueError(f"duplicate query name {s.name}")
        out[s.name] = s
    return out
