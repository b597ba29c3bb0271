"""PySpark-native analytics engine with the capability surface of
ONE-PIECE-KING/ETL-dagster-service-crawler (see SURVEY.md).

Built Spark-first: DataFrame/SQL column expressions for every
record-level transform, broadcast/theta joins for legend lookups,
group/window aggregations for distribution maps, Structured Streaming
for the scheduled-incremental behavior, plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.
"""

from etl_dagster_service_crawler_spark.session import get_spark


def __getattr__(name: str):
    """Lazy public API — keeps `import etl_dagster_service_crawler_spark`
    cheap while exposing the main entry points at package level."""
    lazy = {
        "load_table": "etl_dagster_service_crawler_spark.io.tables",
        "load_tables": "etl_dagster_service_crawler_spark.io.tables",
        "registry": "etl_dagster_service_crawler_spark.workloads",
        "asof_join": "etl_dagster_service_crawler_spark.operators.joins",
        "salted_join": "etl_dagster_service_crawler_spark.operators.joins",
        "broadcast_dim_join": "etl_dagster_service_crawler_spark.operators.joins",
        "dedup_exact": "etl_dagster_service_crawler_spark.operators.dedup",
        "minhash_dedup_pairs": "etl_dagster_service_crawler_spark.operators.dedup",
        "minhash_assign_representatives": "etl_dagster_service_crawler_spark.operators.dedup",
        "cosine_topk_bruteforce": "etl_dagster_service_crawler_spark.operators.similarity",
        "srp_neardup_pairs": "etl_dagster_service_crawler_spark.operators.similarity",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "registry",
    "asof_join",
    "salted_join",
    "broadcast_dim_join",
    "dedup_exact",
    "minhash_dedup_pairs",
    "minhash_assign_representatives",
    "cosine_topk_bruteforce",
    "srp_neardup_pairs",
]
__version__ = "0.1.0"
