"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` maps the same
keys to DuckDB-runnable ANSI SQL for the driver's differential check.
Specs live in etl_dagster_service_crawler_spark/workloads/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

try:
    from etl_dagster_service_crawler_spark.plans.flagship import revenue_by_nation
    from etl_dagster_service_crawler_spark.workloads import registry
except ModuleNotFoundError:  # not pip-installed: resolve next to this file
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from etl_dagster_service_crawler_spark.plans.flagship import revenue_by_nation
    from etl_dagster_service_crawler_spark.workloads import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() key (tables pre-registered).

    Keys absent here are non-SQL-expressible ops (streaming/stateful/
    approximate) — the driver records a rows-only check for those.
    """
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }


def bench_queries() -> list[str]:
    """Headline subset timed by bench.py."""
    return [name for name, spec in registry().items() if spec.bench]
