from etl_dagster_service_crawler_spark.plans.flagship import revenue_by_nation

__all__ = ["revenue_by_nation"]
