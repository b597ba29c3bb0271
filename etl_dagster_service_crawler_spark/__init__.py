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

__all__ = ["get_spark"]
__version__ = "0.1.0"
