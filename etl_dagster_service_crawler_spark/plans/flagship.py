"""Flagship query: revenue by nation.

scan -> filter -> join x3 (two broadcast) -> hash aggregate -> sort.

Scale notes (the part that matters at 100 TB):
- lineitem is the fact table; orders is 1/4 its size. Their join is the
  only real shuffle — both sides hash-partition on the order key. AQE
  handles skew splitting.
- customer/nation/region are dimensions; nation(25) and region(5) are
  broadcast explicitly. customer at SF100k is ~15B rows so it is NOT
  broadcast — it joins post-aggregation-pruning on o_custkey; Catalyst
  pushes the projection so only (c_custkey, c_nationkey) are read.
- The revenue expression stays inside whole-stage codegen; the partial
  aggregation (map-side combine) means the shuffle after the join
  carries one row per (partition, nation), not per lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.functions.compat import fround
from etl_dagster_service_crawler_spark.io.tables import load_table


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation for shipped lineitems before 1997-01-01."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    # Money sums in DECIMAL, not double: double summation is
    # order-dependent across partitionings/engines, so an exact fixed-
    # point sum is the only hash-stable (and audit-stable) choice. The
    # final cast back to double happens on an already-exact scalar.
    dec = "decimal(18,4)"
    revenue = (
        F.col("l_extendedprice").cast(dec) * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))
    ).alias("rev_term")

    return (
        lineitem.where(F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", revenue)
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(fround(F.sum("rev_term").cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


FLAGSHIP_ORACLE_SQL = """
SELECT n_name,
       floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""
