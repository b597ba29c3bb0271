"""SQL query surface: one call registers every fixture table (and the
engine's derived views) as temp views, so users query with plain
`spark.sql(...)` — the engine-side equivalent of the reference's
`sqlite3 jobs.db` / `SELECT * FROM jobs` surface (reference
README.md:64-69).

The views are lazy DataFrames: registering costs nothing, and every
Catalyst optimization (pushdown, pruning, broadcast) applies to SQL over
them exactly as to the DataFrame API — it IS the same plan space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_dagster_service_crawler_spark.io.tables import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every fixture table as a temp view; returns the names."""
    names = []
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        names.append(name)
    return names


def register_clean_corpus(spark: SparkSession, sf_dir: str) -> str:
    """Register the corpus-clean flagship's output as `clean_corpus` —
    the table downstream training jobs read."""
    from etl_dagster_service_crawler_spark.workloads.llm import (
        q_pipeline_corpus_clean,
    )

    q_pipeline_corpus_clean(spark, sf_dir).createOrReplaceTempView("clean_corpus")
    return "clean_corpus"


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Convenience one-shot: register tables, run one SQL query."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
