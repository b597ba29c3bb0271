from etl_dagster_service_crawler_spark.io.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
