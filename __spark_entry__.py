"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` maps the same
keys to DuckDB-runnable ANSI SQL for the driver's differential check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from etl_dagster_service_crawler_spark.plans.flagship import (  # noqa: E402
    FLAGSHIP_ORACLE_SQL,
    revenue_by_nation,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "flagship_revenue_by_nation": revenue_by_nation,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() key (tables pre-registered)."""
    return {
        "flagship_revenue_by_nation": FLAGSHIP_ORACLE_SQL,
    }
