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

    # Money sums in integer fixed-point, not double: double summation is
    # order-dependent across partitionings/engines, so an exact sum is
    # the only hash-stable (and audit-stable) choice. Both 2-dp factors
    # are snapped to integer hundredths with the same IEEE op sequence
    # in both engines (floor(x*1e2 + 0.5)), the product is exact BIGINT
    # arithmetic in 1e-4 units, and the sum of BIGINTs is associative —
    # identical for every partition layout, and cheaper than the
    # decimal128 sums it replaces (r02 paid +12% flagship for those).
    # Overflow headroom: terms are <=~1e9 units, so int64 holds ~9e9
    # rows per GROUP — beyond that (TPC-H SF1e5 nation groups reach
    # ~2.4e10 lineitems) swap the accumulator to
    # sum(rev_units.cast('decimal(38,0)')), still exact, one line.
    price_c = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
    disc_c = F.floor(F.col("l_discount") * F.lit(1e2) + F.lit(0.5))
    revenue = (price_c * (F.lit(100) - disc_c)).alias("rev_units")

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
        .agg(fround(F.sum("rev_units").cast("double") / F.lit(1e4), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


FLAGSHIP_ORACLE_SQL = """
SELECT n_name,
       floor((CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)
                       * CAST(100 - floor(l_discount * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4)
             * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""
