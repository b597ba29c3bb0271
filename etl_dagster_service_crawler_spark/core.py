"""Query registry plumbing shared by workloads and __spark_entry__."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One declared engine capability.

    name    registry key (appears in queries()/oracle_sql()).
    fn      (spark, sf_dir) -> DataFrame.
    oracle  DuckDB-runnable ANSI SQL producing the same rows/columns,
            or None for ops the driver checks rows-only (streaming,
            approximate, UDF-stateful).
    bench   include in bench.py's headline set.
    """

    name: str
    fn: QueryFn
    oracle: str | None
    bench: bool = False
