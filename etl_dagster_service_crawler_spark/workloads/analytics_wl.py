"""Warehouse analytics shapes, round 4: the remaining classic decision-
support query patterns a reference user would expect from an analytics
engine (TPC-H Q14/Q15/Q17/Q18/Q19/Q21/Q22 shapes, adapted to the
fixture star schema — no partsupp/commitdate/phone columns, so each
query keeps the canonical PLAN shape on the columns that exist).

Scale discipline (100 TB): every query here shuffles at most once on a
fact key; every dimension and every aggregated join-back side is
broadcast. Money math is the BIGINT cent-unit idiom from
functions/compat so Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.core import QuerySpec
from etl_dagster_service_crawler_spark.functions.compat import (
    dsum,
    fround,
    sql_dsum,
    sql_fround,
)
from etl_dagster_service_crawler_spark.io.tables import load_table
from etl_dagster_service_crawler_spark.operators.ranking import (
    distributed_ntile,
)

def _rev_units():
    """Exact discounted revenue in BIGINT 1e-4 units (cents x
    (100 - disc%)): the order-independent money idiom shared with
    joins_wl. A function, not a module constant — Column construction
    needs an active SparkContext."""
    return F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5)) * (
        F.lit(100) - F.floor(F.col("l_discount") * F.lit(1e2) + F.lit(0.5))
    )
_SQL_REV_UNITS = (
    "CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT))"
)


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: per ship-month of 1996, the share of discounted
    revenue earned by PROMO-type parts. part is dimension-sized and
    broadcasts; the month filter pushes to the lineitem scan; the plan
    is one broadcast join + one small agg (12 groups) — map-side
    partials, no fact-fact exchange. Share = ratio of two exact BIGINT
    unit sums, one double division rounded 4dp."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    promo = F.sum(F.when(F.col("is_promo"), _rev_units()).otherwise(F.lit(0)))
    total = F.sum(_rev_units())
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").cast("int").alias("ship_month"))
        .agg(
            fround(promo.cast("double") / total.cast("double"), 4).alias(
                "promo_share"
            )
        )
        .orderBy("ship_month")
    )


SQL_PROMO_SHARE = f"""
SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
       {sql_fround(
           "CAST(sum(CASE WHEN p_type = 'PROMO' THEN " + _SQL_REV_UNITS
           + " ELSE 0 END) AS DOUBLE) / CAST(sum(" + _SQL_REV_UNITS
           + ") AS DOUBLE)", 4)} AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY month(l_shipdate)
ORDER BY ship_month
"""


def q_top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: suppliers whose revenue over 1996Q1 equals the
    maximum such revenue. The per-supplier agg is supplier-cardinality
    (small); the max is a scalar over that agg, broadcast back — Spark
    reuses the agg on both sides of the self-join, no second fact scan.
    Revenue stays in exact BIGINT units until the final 2dp render."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev_units()).alias("rev_units"))
    )
    max_rev = per_supp.agg(F.max("rev_units").alias("mx"))
    return (
        per_supp.join(F.broadcast(max_rev), F.col("rev_units") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            fround(F.col("rev_units").cast("double") / F.lit(1e4), 2).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


SQL_TOP_SUPPLIER = f"""
WITH per_supp AS (
  SELECT l_suppkey, sum({_SQL_REV_UNITS}) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       {sql_fround("CAST(rev_units AS DOUBLE) / 1e4", 2)} AS total_revenue
FROM per_supp
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_units = (SELECT max(rev_units) FROM per_supp)
ORDER BY s_suppkey
"""


def q_avg_qty_joinback_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: average yearly revenue lost if small-quantity
    orders of Brand#5 parts stopped shipping. The per-part avg-quantity
    threshold is an agg over the SAME brand-filtered join — part
    filters first (broadcast), so the fact scan is pruned to the brand
    before either pass; the threshold side aggregates to part
    cardinality and broadcasts back (no fact-fact exchange).
    l_quantity values are small integers stored as double, so sum and
    count — and therefore avg and 0.2*avg — are bit-exact in both
    engines."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#5")
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    thresholds = branded.groupBy("p_partkey").agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count("l_quantity"))).alias(
            "qty_threshold"
        )
    )
    small = branded.join(
        F.broadcast(thresholds.select("p_partkey", "qty_threshold")),
        on="p_partkey",
    ).where(F.col("l_quantity") < F.col("qty_threshold"))
    cents = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
    return small.agg(
        fround(
            F.sum(cents).cast("double") / F.lit(1e2) / F.lit(7.0), 2
        ).alias("avg_yearly")
    )


SQL_AVG_QTY_JOINBACK = f"""
WITH branded AS (
  SELECT l.*, p.p_partkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#5'
),
thresholds AS (
  SELECT p_partkey,
         0.2 * (sum(l_quantity) / count(l_quantity)) AS qty_threshold
  FROM branded GROUP BY p_partkey
)
SELECT {sql_fround(
    "CAST(sum(CAST(floor(b.l_extendedprice * 1e2 + 0.5) AS BIGINT)) AS DOUBLE)"
    " / 1e2 / 7.0", 2)} AS avg_yearly
FROM branded b
JOIN thresholds t ON b.p_partkey = t.p_partkey
WHERE b.l_quantity < t.qty_threshold
"""


def q_big_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: customers who placed orders totalling more
    than 300 units of quantity, top 100 by order value. The qty rollup
    shuffles lineitem once on l_orderkey; the surviving orderkeys are
    few, so that side broadcasts into orders (semi-like join-back) and
    customer broadcasts as a dimension; the final sort folds to
    TakeOrderedAndProject. Quantities are exact small integers."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            fround(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


SQL_BIG_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       {sql_fround("o_totalprice", 2)} AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_disjunctive_predicate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue from an OR-of-ANDs of brand/size/
    quantity bands. The disjunction mixes join-side (part) and
    scan-side (lineitem) predicates; Catalyst still pushes the
    quantity envelope (1..30, the union of the bands) to the parquet
    scan and broadcasts part, so the whole query is one broadcast join
    + scalar agg. One output row, exact unit sum."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 5))
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 10))
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15))
           & qty.between(20, 30))
    )
    return (
        li.where(qty.between(1, 30))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(band)
        .agg(
            fround(F.sum(_rev_units()).cast("double") / F.lit(1e4), 2).alias(
                "revenue"
            ),
            F.count("*").cast("int").alias("n_lines"),
        )
    )


SQL_DISJUNCTIVE = f"""
SELECT {sql_fround("CAST(sum(" + _SQL_REV_UNITS + ") AS DOUBLE) / 1e4", 2)}
         AS revenue,
       CAST(count(*) AS INT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_solo_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: suppliers who were the ONLY late shipper on a
    finished multi-supplier order (late = shipped >60 days after the
    order date; the fixture has no commit/receipt dates). The classic
    EXISTS / NOT EXISTS pair over lineitem is expressed as ONE
    per-order aggregation — count of distinct suppliers, count and max
    of distinct LATE suppliers — so the fact table is shuffled exactly
    once on l_orderkey (the orders join shares the same key and AQE
    plans it alongside); supplier/nation broadcast at the end. This is
    the shape that survives 100 TB: no correlated re-scan, no
    fact-fact self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    # two-phase, not two countDistincts in one agg: the distinct-agg
    # form plans an Expand (3x the pre-shuffle rows); aggregating to
    # (order, supplier) late-flags first and rolling those up is the
    # same answer through two NARROW exchanges — measured 1.6x faster
    # at sf0.1, and the Expand elimination compounds at 100 TB
    per_supp = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("sl"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("sl").alias("n_late_supp"),
            F.max(F.when(F.col("sl") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count("*").cast("int").alias("numwait"))
        .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


SQL_SOLO_LATE = """
WITH per_order AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate
                                  + INTERVAL 60 DAY
                             THEN l.l_suppkey END) AS n_late_supp,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN l.l_suppkey END) AS late_supp
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey
)
SELECT s_name, n_name, CAST(count(*) AS INT) AS numwait
FROM per_order
JOIN supplier ON late_supp = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_idle_customers_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: well-funded customers with no order since
    2000-01-01, rolled up by market segment (the fixture's stand-in
    for the phone country code; every fixture customer has SOME order,
    so "idle" is recency-scoped to keep the result non-degenerate).
    Three pieces, all cheap at scale: a scalar avg over positive
    balances (broadcast), a LEFT ANTI join against the recent-order
    custkeys (the only shuffle, on the customer key, and the date
    filter prunes the orders scan first), and a 5-group agg. acctbal
    sums use the exact cent idiom."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5)))
         / (F.lit(1e2) * F.count("*"))).alias("avg_pos_bal")
    )
    rich = c.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_pos_bal")
    )
    idle = rich.join(
        o.select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("int").alias("numcust"),
            dsum(F.col("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


SQL_IDLE_CUSTOMERS = f"""
SELECT c_mktsegment, CAST(count(*) AS INT) AS numcust,
       {sql_dsum("c_acctbal", 2)} AS total_bal
FROM customer
WHERE c_acctbal > (
        SELECT sum(CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT))
                 / (1e2 * count(*))
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: discounted revenue flowing between two nations
    (supplier nation -> customer nation, both directions), per ship
    year. Both nation filters reduce supplier/customer to broadcast
    dimensions, so the only exchanges are the lineitem-orders fact join
    and the final tiny agg; the pair filter prunes before either."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nations = F.broadcast(
        n.where(F.col("n_name").isin("NATION_1", "NATION_2")).select(
            "n_nationkey", "n_name"
        )
    )
    supp = F.broadcast(
        s.join(nations, s.s_nationkey == F.col("n_nationkey")).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    cust = F.broadcast(
        c.join(nations, c.c_nationkey == F.col("n_nationkey")).select(
            "c_custkey", F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            fround(F.sum(_rev_units()).cast("double") / F.lit(1e4), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


SQL_BILATERAL_TRADE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       {sql_fround("CAST(sum(" + _SQL_REV_UNITS.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount") + ") AS DOUBLE) / 1e4", 2)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, ship_year
"""


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per part family (TPC-H Q16 shape; the fixture
    has no partsupp, so the part-supplier relation is the DISTINCT
    (partkey, suppkey) projection of lineitem — same plan skeleton:
    distinct bridge, NOT-IN supplier exclusion, count-distinct agg).

    Scale: the bridge distinct partial-aggregates map-side before ONE
    exchange on (partkey, suppkey); the excluded-supplier set and the
    part dimension are broadcast (supplier/part are dimension-sized —
    at 100 TB you'd still broadcast the exclusion list, it is a filter
    output). The final count-distinct reuses the bridge's partitioning
    on l_partkey via the part join key, so no third fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")

    bridge = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    kept = bridge.join(
        F.broadcast(bad),
        bridge.l_suppkey == bad.s_suppkey,
        "left_anti",
    )
    dim = p.where(
        (F.col("p_brand") != "Brand#45") & (F.col("p_size") <= 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        kept.join(F.broadcast(dim), kept.l_partkey == dim.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_SUPPLIER_VARIETY = """
WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
kept AS (
  SELECT * FROM bridge
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM kept JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_size <= 25
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_retention_cohort_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream: cohort = a
    user's first active ISO week; cell (cohort, +k weeks) counts users
    from that cohort active k weeks later. The product-analytics
    staple missing from the funnel/sessionize family.

    Scale: ONE exchange on user_id covers everything — the per-user
    weekly activity distinct, the min-week cohort, and the
    activity-to-cohort join all share that partitioning (the cohort
    frame is derived from the activity frame, so Catalyst reuses the
    exchange); the final (cohort, offset) agg is cell-count-sized.
    Both week truncs are Monday-based so the day diff is an exact
    multiple of 7 in both engines."""
    ev = load_table(spark, sf_dir, "events")
    weekly = (
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .distinct()
    )
    cohort = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        weekly.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_wk") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


SQL_RETENTION_COHORT = """
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
cohort AS (SELECT user_id, min(wk) AS cohort_wk FROM weekly GROUP BY user_id)
SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
       CAST((wk - cohort_wk) / 7 AS INT) AS week_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM weekly JOIN cohort USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""


def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year for a product line
    (TPC-H Q9 shape — the widest join tree in the suite: lineitem x
    orders x part x supplier x nation; the fixture has no partsupp,
    so profit = discounted revenue in exact cent units).

    Scale: part (name-filtered scan-side), supplier, and nation are
    all BROADCAST — the only fact-fact edge is lineitem x orders on
    orderkey, ONE co-keyed shuffle (or zero with bucketed tables, see
    bucketed_colocated_join). The year comes from orders, so no
    second fact exchange; the final (nation, year) agg is tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    dim_p = p.where(F.col("p_name").contains("red")).select("p_partkey")
    return (
        li.join(F.broadcast(dim_p), li.l_partkey == dim_p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(fround(dsum(_rev_units()) / F.lit(1e4), 2).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


SQL_PRODUCT_PROFIT = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {sql_fround("CAST(" + sql_dsum(_SQL_REV_UNITS) + " AS DOUBLE) / 1e4", 2)} AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


SCD2_EFFECTIVE = "1998-06-01"
SCD2_OPEN_END = "9999-12-31"


def q_scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply a change batch to
    the customer dimension, closing the old version (valid_to = the
    effective date) and opening a new current one. The change batch is
    derived deterministically (every 7th customer gets a +100.00
    balance adjustment) so the oracle replays it exactly.

    Scale: ONE full-outer-ish edge — dim LEFT JOIN updates on the
    surrogate key (updates that are pure inserts would come from the
    join's right-null side; here the batch is updates-only). Both
    sides hash-partition once on c_custkey; version rows are emitted
    as a union of projections over the SAME joined frame — the union
    branches share the join's shuffles via Spark's ReusedExchange (the
    builder stays lazy: no persist side effects in a registry query)."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    dim = c.select(
        "c_custkey", "c_mktsegment", cents.alias("bal_cents")
    )
    upd = (
        c.where(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", (cents + F.lit(10000)).alias("new_bal_cents"))
    )
    j = dim.join(upd, "c_custkey", "left")

    current_unchanged = j.where(F.col("new_bal_cents").isNull()).select(
        "c_custkey",
        "c_mktsegment",
        F.col("bal_cents"),
        F.lit("1995-01-01").alias("valid_from"),
        F.lit(SCD2_OPEN_END).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed = j.where(F.col("new_bal_cents").isNotNull()).select(
        "c_custkey",
        "c_mktsegment",
        F.col("bal_cents"),
        F.lit("1995-01-01").alias("valid_from"),
        F.lit(SCD2_EFFECTIVE).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.where(F.col("new_bal_cents").isNotNull()).select(
        "c_custkey",
        "c_mktsegment",
        F.col("new_bal_cents").alias("bal_cents"),
        F.lit(SCD2_EFFECTIVE).alias("valid_from"),
        F.lit(SCD2_OPEN_END).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return current_unchanged.unionAll(closed).unionAll(opened)


SQL_SCD2 = f"""
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT) AS bal_cents
  FROM customer
),
upd AS (
  SELECT c_custkey, bal_cents + 10000 AS new_bal_cents
  FROM dim WHERE c_custkey % 7 = 0
),
j AS (SELECT dim.*, upd.new_bal_cents FROM dim LEFT JOIN upd USING (c_custkey))
SELECT c_custkey, c_mktsegment, bal_cents,
       '1995-01-01' AS valid_from, '{SCD2_OPEN_END}' AS valid_to,
       TRUE AS is_current
FROM j WHERE new_bal_cents IS NULL
UNION ALL
SELECT c_custkey, c_mktsegment, bal_cents,
       '1995-01-01', '{SCD2_EFFECTIVE}', FALSE
FROM j WHERE new_bal_cents IS NOT NULL
UNION ALL
SELECT c_custkey, c_mktsegment, new_bal_cents,
       '{SCD2_EFFECTIVE}', '{SCD2_OPEN_END}', TRUE
FROM j WHERE new_bal_cents IS NOT NULL
"""


def q_join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) dimension lookup: each order joins the
    SCD2 customer-history VERSION that was valid on its order date —
    the temporal join every versioned-dim mart needs for historically
    correct attribution. Interval semantics are half-open
    [valid_from, valid_to): an order dated exactly on the effective
    date sees the NEW version; every order matches exactly one
    version.

    Scale: equality on the surrogate key drives the join (Catalyst
    plans an equi-join on c_custkey with the date-range as a post-join
    filter — never a cross/theta join); the dim history is
    customer-sized, broadcastable here and bucketable at 100 TB. ISO
    yyyy-MM-dd strings compare lexicographically == chronologically,
    so the range filter needs no date parsing."""
    hist = q_scd2_customer_history(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
    )
    j = o.join(
        F.broadcast(hist),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_date") >= F.col("valid_from"))
        & (F.col("o_date") < F.col("valid_to")),
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        "o_date",
        "bal_cents",
        "is_current",
    )


SQL_SCD2_PIT = f"""
WITH hist AS ({SQL_SCD2})
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       bal_cents, is_current
FROM orders JOIN hist
  ON o_custkey = c_custkey
 AND strftime(o_orderdate, '%Y-%m-%d') >= valid_from
 AND strftime(o_orderdate, '%Y-%m-%d') < valid_to
"""


def q_snapshot_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: full-outer diff of two order snapshots
    keyed by orderkey, classifying every divergence as added / removed
    / changed — the data-quality audit run after every backfill or
    CDC replay ('same' rows are filtered out: the report is the
    divergence, not the table). Snapshots are derived
    deterministically (old drops every 10th key, new drops every 7th
    and bumps every 13th's total by 50.00) so the oracle replays them.

    Scale: ONE full outer hash join on the key — both snapshots
    partition once; the classification is a pure post-join map and the
    'same' filter drops the (dominant) unchanged mass before any
    downstream use. Cents compares are exact BIGINTs."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    old = o.where(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", cents.alias("old_cents")
    )
    new = o.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        (
            cents
            + F.when(F.col("o_orderkey") % 13 == 0, F.lit(5000)).otherwise(
                F.lit(0)
            )
        ).alias("new_cents"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    status = (
        F.when(F.col("old_cents").isNull(), F.lit("added"))
        .when(F.col("new_cents").isNull(), F.lit("removed"))
        .when(F.col("old_cents") != F.col("new_cents"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status") != "same")
        .select("o_orderkey", "old_cents", "new_cents", "status")
    )


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS old_cents
  FROM orders WHERE o_orderkey % 10 <> 0
),
new AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)
           + CASE WHEN o_orderkey % 13 = 0 THEN 5000 ELSE 0 END AS new_cents
  FROM orders WHERE o_orderkey % 7 <> 0
),
j AS (
  SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         old_cents, new_cents
  FROM old FULL OUTER JOIN new USING (o_orderkey)
)
SELECT o_orderkey, old_cents, new_cents,
       CASE WHEN old_cents IS NULL THEN 'added'
            WHEN new_cents IS NULL THEN 'removed'
            WHEN old_cents <> new_cents THEN 'changed'
            ELSE 'same' END AS status
FROM j
WHERE (CASE WHEN old_cents IS NULL THEN 'added'
            WHEN new_cents IS NULL THEN 'removed'
            WHEN old_cents <> new_cents THEN 'changed'
            ELSE 'same' END) <> 'same'
"""


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the
    user's most recent PRIOR click/view — touch type, touch event id,
    and the gap in whole seconds. The window encodes candidate touches
    as fixed-width sortable strings (zero-padded epoch-micros |
    event_id | type), so `max` over the strictly-before ROWS frame IS
    the latest touch — max() is order-insensitive, making the result
    identical across engines regardless of shuffle order; only the
    frame boundary depends on the pinned (ts, event_id) ordering.

    Scale: one user-partitioned window over the fact — parallel per
    user, no self-join of events against events (the naive
    touch-range join shuffles the fact twice and explodes on active
    users)."""
    return last_touch_attribution(load_table(spark, sf_dir, "events"))


def last_touch_attribution(e: DataFrame) -> DataFrame:
    """TRANSFORM behind attribution_last_touch over an events-shaped
    frame (event_id, user_id, event_type, ts). Property-tested against
    a pure-Python replay (tests/test_properties.py)."""
    us = F.unix_micros(F.col("ts"))
    enc = F.when(
        F.col("event_type").isin("click", "view"),
        F.concat(
            F.lpad(us.cast("string"), 16, "0"),
            F.lit("|"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
            F.lit("|"),
            F.col("event_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = e.select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("p_us"),
        F.max(enc).over(w).alias("last_t"),
    ).where(F.col("event_type") == "purchase")
    parts = F.split(F.col("last_t"), "\\|")
    # integer `div`, not double-divide-then-cast: micros quotients near
    # an integer boundary must truncate identically on both engines
    return staged.withColumn(
        "t_us", F.element_at(parts, 1).cast("bigint")
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.coalesce(F.element_at(parts, 3), F.lit("none")).alias("touch_type"),
        F.element_at(parts, 2).cast("bigint").alias("touch_event_id"),
        F.expr("(p_us - t_us) div 1000000").alias("gap_s"),
    )


SQL_ATTRIBUTION = """
WITH enc AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type IN ('click', 'view')
              THEN lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0') || '|'
                   || lpad(CAST(event_id AS VARCHAR), 10, '0') || '|'
                   || event_type END AS tstr
  FROM events
),
win AS (
  SELECT *, max(tstr) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_t
  FROM enc
)
SELECT event_id AS purchase_id, user_id,
       coalesce(string_split(last_t, '|')[3], 'none') AS touch_type,
       CAST(string_split(last_t, '|')[2] AS BIGINT) AS touch_event_id,
       CAST((us - CAST(string_split(last_t, '|')[1] AS BIGINT)) // 1000000
         AS BIGINT) AS gap_s
FROM win WHERE event_type = 'purchase'
"""


def q_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval style decile lift table: customers ranked into
    spend deciles (decile 1 = highest), each decile's exact revenue
    share and cumulative share in basis points — the gains chart
    every targeting/propensity model is judged against. The decile is
    `distributed_ntile` over the customer aggregate (global ordering,
    never a single-task window); the per-decile rollup is 10 rows and
    the cumulative window runs over those 10 rows only."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    per = o.groupBy("o_custkey").agg(F.sum(cents).alias("rev_c"))
    binned = distributed_ntile(
        per, 10, [F.desc("rev_c"), F.asc("o_custkey")], "decile"
    )
    per_d = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_c").alias("rev_c"),
    )
    total = per.agg(F.sum("rev_c").alias("tot_c"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_d.join(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            "rev_c",
            F.expr("(10000 * rev_c) div tot_c").alias("share_bp"),
            F.expr("tot_c").alias("tot_c"),
        )
        .withColumn(
            "cum_share_bp",
            F.expr("(10000 * sum(rev_c) OVER (ORDER BY decile ROWS BETWEEN "
                   "UNBOUNDED PRECEDING AND CURRENT ROW)) div tot_c"),
        )
        .drop("tot_c")
        .orderBy("decile")
    )


SQL_DECILE_LIFT = """
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY o_custkey
),
binned AS (
  SELECT o_custkey, rev_c,
         CAST(ntile(10) OVER (ORDER BY rev_c DESC, o_custkey) AS INT)
           AS decile
  FROM per
),
per_d AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(rev_c) AS BIGINT) AS rev_c
  FROM binned GROUP BY decile
),
tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c FROM per)
SELECT decile, n_customers, rev_c,
       CAST((10000 * rev_c) // tot_c AS BIGINT) AS share_bp,
       CAST((10000 * sum(rev_c) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW)) // tot_c AS BIGINT) AS cum_share_bp
FROM per_d CROSS JOIN tot
ORDER BY decile
"""


SLA_LATE_DAYS = 90


def q_order_priority_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders per priority having at least one line
    shipped more than SLA_LATE_DAYS after the order date (EXISTS
    semantics). The late-line side reduces to DISTINCT orderkeys
    BEFORE the join, so the semi join carries one row per late order,
    not per late line; one fact exchange each side on the orderkey;
    the priority rollup is priorities-sized."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == o.o_orderkey,
    )
    late_keys = (
        j.where(
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate"), SLA_LATE_DAYS)
        )
        .select("o_orderkey")
        .distinct()
    )
    return (
        o.join(late_keys, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_order_cnt"))
        .orderBy("o_orderpriority")
    )


SQL_ORDER_PRIORITY_SLA = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_order_cnt
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND CAST(l_shipdate AS DATE) >
        CAST(o_orderdate AS DATE) + INTERVAL {SLA_LATE_DAYS} DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


MAD_K = 3


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: |x - median| >
    3 * MAD (median absolute deviation) — unlike the z-score twin
    (events_anomaly_zscore), a few extreme values cannot drag the
    threshold because median and MAD are rank statistics.

    Scale: two tiny per-type aggregations (median over cents, then
    MAD over the broadcast-joined deviations) and one final broadcast
    of (median, mad) back onto the unshuffled fact scan. Everything
    compares exact BIGINTs: medians of integer cents are floored to
    integers on both engines."""
    e = load_table(spark, sf_dir, "events")
    v_c = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    med = e.groupBy("event_type").agg(
        F.floor(F.percentile(v_c, 0.5) + F.lit(0.5))
        .cast("bigint")
        .alias("med_c")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        v_c.alias("v_c"),
        F.col("med_c"),
        F.abs(v_c - F.col("med_c")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.floor(F.percentile(F.col("adev"), 0.5) + F.lit(0.5))
        .cast("bigint")
        .alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("adev") > MAD_K * F.col("mad_c"))
        .select("event_type", "event_id", "v_c", "med_c", "mad_c")
        .orderBy("event_type", "event_id")
    )


SQL_MAD_OUTLIERS = f"""
WITH c AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS v_c
  FROM events
),
med AS (
  SELECT event_type,
         CAST(floor(quantile_cont(v_c, 0.5) + 0.5) AS BIGINT) AS med_c
  FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type AS event_type, event_id, v_c, med_c,
         abs(v_c - med_c) AS adev
  FROM c JOIN med USING (event_type)
),
mad AS (
  SELECT event_type,
         CAST(floor(quantile_cont(adev, 0.5) + 0.5) AS BIGINT) AS mad_c
  FROM dev GROUP BY event_type
)
SELECT dev.event_type AS event_type, event_id, v_c, med_c, mad_c
FROM dev JOIN mad USING (event_type)
WHERE adev > {MAD_K} * mad_c
ORDER BY event_type, event_id
"""


def q_sales_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonality index: each calendar month's revenue
    share of the annual mean (10000 = average month, in basis points
    — exact integer div of BIGINT cent sums, no float index). One
    fact aggregation to 12 rows; the overall mean is a 1-row
    broadcast."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    per_m = o.groupBy(
        F.month("o_orderdate").cast("int").alias("cal_month")
    ).agg(F.sum(cents).alias("rev_c"))
    total = per_m.agg(
        F.sum("rev_c").alias("tot_c"),
        F.count(F.lit(1)).alias("n_months"),
    )
    return (
        per_m.join(F.broadcast(total))
        .select(
            "cal_month",
            "rev_c",
            F.expr("(10000 * rev_c * n_months) div tot_c").alias(
                "seasonality_bp"
            ),
        )
        .orderBy("cal_month")
    )


SQL_SALES_SEASONALITY = """
WITH per_m AS (
  SELECT CAST(month(o_orderdate) AS INT) AS cal_month,
         CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS tot_c,
               CAST(count(*) AS BIGINT) AS n_months FROM per_m)
SELECT cal_month, rev_c,
       CAST((10000 * rev_c * n_months) // tot_c AS BIGINT) AS seasonality_bp
FROM per_m CROSS JOIN tot
ORDER BY cal_month
"""


BASKET_TOP_K = 50


def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the top-50 part pairs co-purchased in
    the same order. The scalable shape is NOT the naive self-join
    (two fact shuffles): ONE orderkey exchange folds each order's
    distinct parts into a bounded array, then pairs are generated
    MAP-SIDE from the sorted array (per-order line count is bounded,
    so the pair blow-up is a constant per row — the plan survives a
    100× fact scale-up with the same single exchange). Tie order
    (cnt DESC, p1, p2) pinned on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return basket_pair_counts(
        li, "l_orderkey", "l_partkey", top_k=BASKET_TOP_K
    )


def basket_pair_counts(
    df: DataFrame, basket_col: str, item_col: str, top_k: int | None = None
) -> DataFrame:
    """TRANSFORM behind market_basket_pairs: (basket, item) rows →
    co-occurrence pair counts (p1 < p2), optionally top-k with pinned
    ties. Property-tested against an itertools.combinations recompute
    (tests/test_properties.py)."""
    baskets = df.groupBy(basket_col).agg(
        F.array_sort(F.collect_set(item_col)).alias("parts")
    )
    pairs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("parts"), i + F.lit(2), F.size(F.col("parts"))
                ),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
    out = (
        baskets.select(F.explode(pairs).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if top_k is not None:
        out = out.orderBy(F.desc("cnt"), "p1", "p2").limit(top_k)
    return out


SQL_MARKET_BASKET = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS cnt
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY cnt DESC, p1, p2
LIMIT {BASKET_TOP_K}
"""


FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: per FK
    edge, child row count and orphan count (child keys with no parent)
    — the post-load validation every warehouse runs. Each edge is ONE
    left join + conditional count (child + orphan in a single pass —
    an anti-join branch would scan/join the child twice); dimension
    parents broadcast, the two fact-fact edges hash-join on the key.
    Edges evaluate independently — on a cluster all five run
    concurrently; the result is five rows."""
    rows = []
    for edge, child, ck, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk), F.lit(1).alias("__present")
        )
        rows.append(
            c.join(p, c[ck] == p[pk], "left")
            .groupBy(F.lit(edge).alias("fk_edge"))
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.count(F.when(F.col("__present").isNull(), 1)).alias(
                    "n_orphan"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


SQL_FK_AUDIT = "\nUNION ALL\n".join(
    f"""SELECT '{edge}' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count(*) FILTER (WHERE NOT EXISTS
            (SELECT 1 FROM {parent} WHERE {pk} = {child}.{ck}))
         AS BIGINT) AS n_orphan
FROM {child}"""
    for edge, child, ck, parent, pk in FK_EDGES
)


PARETO_BP = 8000
PARETO_RANGE_PARTS = 16


def q_pareto_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC analysis: the customers whose cumulative revenue
    share reaches 80%, with rank and cumulative basis points. The
    cumulative sum over a GLOBAL ordering is the classic scale trap —
    `Window.orderBy(...)` with no partition key runs the whole table
    through ONE task. Since r13 the distributed prefix sum is the
    SHARED global_rank(sum_col=...) operator (operators/ranking.py —
    the same two-level range-partition decomposition the vocab
    coverage curve runs on; this entry's former inline copy is gone):
    per-customer revenue (one fact exchange, exact cents), then ONE
    range exchange for rank + exact integer running revenue, fully
    parallel — the only serial window is the constant-size
    per-partition offsets frame inside global_rank. Output is a pure
    function of the global ordering (ties broken by custkey), so
    range boundaries never affect values."""
    from etl_dagster_service_crawler_spark.operators.ranking import (
        global_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    per = o.groupBy("o_custkey").agg(F.sum(cents).alias("rev_cents"))
    total = per.agg(F.sum("rev_cents").alias("total_cents"))
    ranked = global_rank(
        per,
        [F.desc("rev_cents"), F.asc("o_custkey")],
        num_parts=PARETO_RANGE_PARTS,
        sum_col=F.col("rev_cents"),
    )
    return (
        ranked.join(F.broadcast(total))
        .select(
            "o_custkey",
            "rev_cents",
            F.col("__dnt_rank").cast("int").alias("rnk"),
            F.col("__dnt_cum").alias("cum_rev"),
            "total_cents",
        )
        # exact integer floor division — a double multiply first would
        # round the cumulative sum before the floor boundary
        .withColumn("cum_bp", F.expr("(10000 * cum_rev) div total_cents"))
        .where(F.col("cum_bp") <= PARETO_BP)
        .select("o_custkey", "rev_cents", "rnk", "cum_bp")
        .orderBy("rnk")
    )


SQL_PARETO = f"""
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT sum(rev_cents) AS total_cents FROM per),
c AS (
  SELECT o_custkey, rev_cents,
         CAST(row_number() OVER w AS INT) AS rnk,
         CAST((10000 * sum(rev_cents) OVER (w ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW)) // total_cents AS BIGINT) AS cum_bp
  FROM per CROSS JOIN tot
  WINDOW w AS (ORDER BY rev_cents DESC, o_custkey)
)
SELECT o_custkey, rev_cents, rnk, cum_bp
FROM c WHERE cum_bp <= {PARETO_BP}
ORDER BY rnk
"""


def q_pipeline_customer_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composed flagship: ONE customer feature table assembling the
    engine's derived signals — RFM segment, inter-purchase gap stats,
    Pareto revenue rank (null beyond the 80% band), and within-nation
    balance standing — the feature-store build a CRM/churn model
    trains on. Demonstrates operator composability: each input is the
    registered operator itself, joined on the customer key.

    Scale: every input is customer-cardinality (aggregates of the
    fact, never the fact), so the assembly joins are dim-sized; the
    heavy lifting (fact exchanges, distributed ntiles, the prefix
    sum) happens inside the composed operators and is already
    plan-disciplined there. Nullable features stay nullable (a
    single-order customer has no gaps; a tail customer has no Pareto
    rank) — imputation is the model's choice, not the pipeline's."""
    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_purchase_gap_stats,
        q_window_percent_rank,
    )

    rfm = q_rfm_segmentation(spark, sf_dir)
    gaps = q_purchase_gap_stats(spark, sf_dir)
    pareto = q_pareto_customer_share(spark, sf_dir).select(
        "o_custkey",
        F.col("rnk").alias("pareto_rnk"),
        F.col("cum_bp").alias("pareto_cum_bp"),
    )
    standing = q_window_percent_rank(spark, sf_dir).select(
        F.col("c_custkey").alias("o_custkey"),
        "c_nationkey",
        F.col("pct_rank").alias("balance_pct_rank"),
    )
    return (
        rfm.join(gaps, "o_custkey", "left")
        .join(pareto, "o_custkey", "left")
        .join(standing, "o_custkey")
        .select(
            "o_custkey",
            "c_nationkey",
            "recency_d",
            "frequency",
            "monetary_c",
            "rfm_segment",
            "max_gap_d",
            "n_gaps",
            "pareto_rnk",
            "pareto_cum_bp",
            "balance_pct_rank",
        )
    )


def _customer_features_sql() -> str:
    from etl_dagster_service_crawler_spark.workloads.relational import (
        SQL_PERCENT_RANK,
        SQL_PURCHASE_GAPS,
    )

    return f"""
WITH rfm AS ({SQL_RFM}),
gaps AS ({SQL_PURCHASE_GAPS}),
pareto AS ({SQL_PARETO}),
standing AS ({SQL_PERCENT_RANK})
SELECT rfm.o_custkey AS o_custkey, c_nationkey, recency_d, frequency,
       monetary_c, rfm_segment, max_gap_d, n_gaps,
       rnk AS pareto_rnk, cum_bp AS pareto_cum_bp,
       pct_rank AS balance_pct_rank
FROM rfm
LEFT JOIN gaps ON gaps.o_custkey = rfm.o_custkey
LEFT JOIN pareto ON pareto.o_custkey = rfm.o_custkey
JOIN standing ON standing.c_custkey = rfm.o_custkey
"""

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: counts of consecutive event-type
    pairs within each user's stream (the first-order Markov structure
    behind next-action models and anomaly rules). ONE exchange on
    user_id for the lag window (ts is unique per the fixture, id
    tiebreak anyway); the pair count partial-aggregates into a
    |types|^2-sized frame."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", prev)
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("prev_type", "event_type")
    )


SQL_EVENT_TRANSITIONS = """
SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_type
  FROM events
)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, event_type
"""


def q_open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting: how many orders are OPEN (placed,
    not yet fully shipped) at each month boundary — the backlog curve.
    The classic +1/-1 delta technique: +1 at the order month, -1 at
    the month of its LAST shipment; a running sum over month deltas is
    the live count. The running sum is a window over the MONTHS-sized
    delta frame (dozens of rows at any scale), so the global cumsum
    trap never touches the fact; the fact pays one orderkey exchange
    to find each order's last ship date."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    opens = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.lit(1).alias("delta"),
    )
    closes = close.select(
        F.date_format("close_ts", "yyyy-MM").alias("month"),
        F.lit(-1).alias("delta"),
    )
    deltas = (
        opens.unionAll(closes)
        .groupBy("month")
        .agg(F.sum("delta").alias("net"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.select(
        "month",
        F.col("net").cast("bigint").alias("net"),
        F.sum("net").over(w).cast("bigint").alias("open_orders"),
    ).orderBy("month")


SQL_OPEN_ORDERS = """
WITH close AS (
  SELECT l_orderkey, max(l_shipdate) AS close_ts FROM lineitem
  GROUP BY l_orderkey
),
deltas AS (
  SELECT month, CAST(sum(delta) AS BIGINT) AS net FROM (
    SELECT strftime(o_orderdate, '%Y-%m') AS month, 1 AS delta FROM orders
    UNION ALL
    SELECT strftime(close_ts, '%Y-%m') AS month, -1 AS delta FROM close
  ) GROUP BY month
)
SELECT month, net,
       CAST(sum(net) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_orders
FROM deltas
ORDER BY month
"""


RFM_ASOF = "1997-01-01"


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order as of
    a fixed date), frequency (order count), monetary (exact cents),
    each cut into quintiles; segment = R*100 + F*10 + M. Every ntile
    ordering carries the custkey tiebreak so both engines bin ties
    identically. One fact aggregation to customer cardinality; each
    quintile is `distributed_ntile` (operators/ranking.py) — range
    partition + per-partition rank + broadcast offsets — because even
    the customer AGGREGATE is billions of rows at 100 TB and an
    unpartitioned ntile would serialize it through one task three
    times. Three composable calls = three parallel range exchanges,
    zero single-task sorts."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    per = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ASOF), F.max("o_orderdate")).alias("recency_d"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents).alias("monetary_c"),
    )
    per = distributed_ntile(
        per, 5, [F.desc("recency_d"), F.asc("o_custkey")], "r_q"
    )
    per = distributed_ntile(
        per, 5, [F.asc("frequency"), F.asc("o_custkey")], "f_q"
    )
    per = distributed_ntile(
        per, 5, [F.asc("monetary_c"), F.asc("o_custkey")], "m_q"
    )
    return per.select(
        "o_custkey",
        "recency_d",
        "frequency",
        "monetary_c",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("int")
        .alias("rfm_segment"),
    )


SQL_RFM = f"""
WITH per AS (
  SELECT o_custkey,
         CAST(DATE '{RFM_ASOF}' - CAST(max(o_orderdate) AS DATE) AS INT)
           AS recency_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_c
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, recency_d, frequency, monetary_c,
       CAST(ntile(5) OVER (ORDER BY recency_d DESC, o_custkey) * 100
          + ntile(5) OVER (ORDER BY frequency, o_custkey) * 10
          + ntile(5) OVER (ORDER BY monetary_c, o_custkey) AS INT)
         AS rfm_segment
FROM per
"""


def q_change_point_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift change-point per event type: the split day that
    maximizes |mean(before) - mean(after)| over the daily value
    series — the "did the metric step-change and when" question asked
    after every deploy. Exactness: means are never materialized as
    doubles; the shift is the cross-multiplied integer
    |pre_sum*post_cnt - post_sum*pre_cnt| // (pre_cnt*post_cnt)
    (floor cents), so both engines pick the identical argmax with a
    pinned (shift DESC, day ASC) tiebreak. The cross product stays
    inside BIGINT up to ~1e9 rows/type at fixture value magnitudes
    (ANSI mode would fail loudly, not wrap, beyond that).

    Scale: the fact folds to a (day x type) aggregate in ONE exchange;
    the prefix sums and the argmax run on that calendar-bounded frame
    partitioned per type — never on the fact."""
    e = load_table(spark, sf_dir, "events")
    v_c = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"), F.sum(v_c).alias("sum_c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cur = daily.select(
        "event_type",
        "day",
        F.sum("cnt").over(w_cum).alias("pre_cnt"),
        F.sum("sum_c").over(w_cum).alias("pre_sum"),
        F.sum("cnt").over(w_all).alias("tot_cnt"),
        F.sum("sum_c").over(w_all).alias("tot_sum"),
    ).withColumns(
        {
            "post_cnt": F.col("tot_cnt") - F.col("pre_cnt"),
            "post_sum": F.col("tot_sum") - F.col("pre_sum"),
        }
    )
    scored = cur.where(F.col("post_cnt") > 0).select(
        "event_type",
        "day",
        "pre_cnt",
        "post_cnt",
        # abs(...) >= 0, so `div` (truncating) == floor division ==
        # the oracle's `//` — exact BIGINT, no double round-trip
        F.expr(
            "abs(pre_sum * post_cnt - post_sum * pre_cnt)"
            " div (pre_cnt * post_cnt)"
        )
        .cast("bigint")
        .alias("shift_c"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(F.desc("shift_c"), "day")
    return (
        scored.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("day").alias("split_day"), "shift_c", "pre_cnt", "post_cnt")
    )


SQL_CHANGE_POINT = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_c
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, day,
         CAST(sum(cnt) OVER w_cum AS BIGINT) AS pre_cnt,
         CAST(sum(sum_c) OVER w_cum AS BIGINT) AS pre_sum,
         CAST(sum(cnt) OVER w_all AS BIGINT) AS tot_cnt,
         CAST(sum(sum_c) OVER w_all AS BIGINT) AS tot_sum
  FROM daily
  WINDOW w_cum AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_all AS (PARTITION BY event_type)
),
scored AS (
  SELECT event_type, day, pre_cnt, tot_cnt - pre_cnt AS post_cnt,
         CAST(abs(CAST(pre_sum AS HUGEINT) * (tot_cnt - pre_cnt)
                  - CAST(tot_sum - pre_sum AS HUGEINT) * pre_cnt)
              // (CAST(pre_cnt AS HUGEINT) * (tot_cnt - pre_cnt))
              AS BIGINT) AS shift_c
  FROM cum WHERE tot_cnt - pre_cnt > 0
)
SELECT event_type, day AS split_day, shift_c, pre_cnt, post_cnt
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY shift_c DESC, day) AS rn
  FROM scored
)
WHERE rn = 1
ORDER BY event_type
"""


_EWMA_W = [64, 32, 16, 8, 4, 2, 1]  # halving weights, lag 0..6


def q_ewma_revenue_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-OBSERVATION exponentially weighted daily revenue —
    the smoothed ops-dashboard series. The frame is row-based (lag k
    rows over the observed-days series, the standard dashboard EWMA),
    so calendar gap days do not reset the window; lags are NULL only
    near the series start, where they drop out of both numerator and
    denominator. Weights are the integer halving ladder 64..1 so the
    smoothing is EXACT BIGINT arithmetic (weighted_sum // weight_sum)
    — no recursive float state, no cross-engine drift, and a
    restatement of any day reproduces bit-identically
    (property-tested against a Python recompute, gaps included).

    Scale: the fact folds to a calendar-bounded daily aggregate in one
    exchange; the lag window runs on that days-sized frame (same
    contract as mom_revenue_growth's months frame)."""
    o = load_table(spark, sf_dir, "orders")
    rev_c = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    daily = o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")).agg(
        F.sum(rev_c).alias("rev_c")
    )
    w = Window.orderBy("day")
    lags = [F.lag("rev_c", k).over(w) for k in range(len(_EWMA_W))]
    lags[0] = F.col("rev_c")
    num = sum(
        (F.coalesce(lag, F.lit(0)) * F.lit(wt) for lag, wt in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    den = sum(
        (
            F.when(lag.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
            for lag, wt in zip(lags, _EWMA_W)
        ),
        F.lit(0),
    )
    # num >= 0 and den > 0, so BIGINT `div` (truncating) == floor
    # division == DuckDB's `//` — exact at any magnitude, unlike
    # floor(double/double) which drifts past 2^53
    return daily.select(
        "day",
        "rev_c",
        num.alias("_num"),
        den.alias("_den"),
    ).select(
        "day",
        "rev_c",
        F.expr("_num div _den").cast("bigint").alias("ewma_c"),
    )


def _sql_ewma() -> str:
    num = " + ".join(
        f"coalesce(lag(rev_c, {k}) OVER w, 0) * {wt}" if k else f"rev_c * {wt}"
        for k, wt in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(rev_c, {k}) OVER w IS NOT NULL THEN {wt} ELSE 0 END"
        if k
        else f"{_EWMA_W[0]}"
        for k, wt in enumerate(_EWMA_W)
    )
    return f"""
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
)
SELECT day, rev_c,
       CAST(({num}) // ({den}) AS BIGINT) AS ewma_c
FROM daily
WINDOW w AS (ORDER BY day)
"""


SQL_EWMA = _sql_ewma()


def _supply_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed-supply bridge standing in for TPC-H's partsupp (the
    fixture schema has no partsupp table): per (part, supplier), the
    minimum observed unit price in cents over lineitem. Unit price is
    the exact integer pair (price_c, qty) compared by cross-
    multiplication — never a float division."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    qty = F.col("l_quantity").cast("bigint")
    # min unit price as exact scaled integer: floor(1e4 * price_c / qty)
    unit = F.expr("(10000 * price_c) div qty")
    return (
        li.select(
            "l_partkey", "l_suppkey", price_c.alias("price_c"), qty.alias("qty")
        )
        .select("l_partkey", "l_suppkey", unit.alias("unit_c4"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_c4").alias("min_unit_c4"))
    )


_SQL_SUPPLY_BRIDGE = """
  SELECT l_partkey, l_suppkey,
         min((10000 * CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT))
             // CAST(l_quantity AS BIGINT)) AS min_unit_c4
  FROM lineitem GROUP BY 1, 2
"""


Q2_REGION = "ASIA"


def q_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape on the observed-supply bridge: for each part of
    a size class, the supplier(s) in a target region offering the
    minimum unit price. The canonical plan: the bridge aggregates once
    (one (part, supp) exchange), region/nation/supplier dims broadcast
    onto it, the per-part minimum folds on the part key and joins BACK
    by (part, min) — a broadcast of the part-sized minima, never a
    second bridge shuffle. Top-100 by supplier balance, pinned ties."""
    br = _supply_bridge(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") >= 40)
    dims = (
        s.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .join(
            F.broadcast(n.select("n_nationkey", "n_regionkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = br.join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
    # per-part minimum as a WINDOW over the bridge frame, not an
    # aggregate joined back: a joined-back aggregate re-derives the
    # whole bridge subtree (lineitem scanned twice — Catalyst does not
    # reuse unpersisted DataFrame subtrees); the window re-keys the
    # bridge-sized frame once and the fact is scanned ONCE (plan-pinned)
    w_part = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("best_c4", F.min("min_unit_c4").over(w_part))
        .where(F.col("min_unit_c4") == F.col("best_c4"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.floor(F.col("s_acctbal") * F.lit(1e2) + F.lit(0.5))
            .cast("bigint")
            .alias("acctbal_c"),
            F.col("best_c4").cast("bigint").alias("best_c4"),
        )
        .orderBy(F.desc("acctbal_c"), "p_partkey", "s_name")
        .limit(100)
    )


SQL_MIN_COST_SUPPLIER_Q2 = f"""
WITH bridge AS ({_SQL_SUPPLY_BRIDGE}),
regional AS (
  SELECT b.l_partkey, b.min_unit_c4, s.s_name, n.n_name,
         CAST(floor(s.s_acctbal * 1e2 + 0.5) AS BIGINT) AS acctbal_c
  FROM bridge b
  JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size >= 40
  JOIN supplier s ON s.s_suppkey = b.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = '{Q2_REGION}'
),
mins AS (
  SELECT l_partkey, min(min_unit_c4) AS best_c4 FROM regional GROUP BY 1
)
SELECT regional.l_partkey AS p_partkey, s_name, n_name, acctbal_c,
       CAST(best_c4 AS BIGINT) AS best_c4
FROM regional
JOIN mins ON mins.l_partkey = regional.l_partkey
         AND regional.min_unit_c4 = mins.best_c4
ORDER BY acctbal_c DESC, p_partkey, s_name
LIMIT 100
"""


Q11_FRACTION_BP = 5  # parts holding > 0.05% of the nation's supply value
Q11_NATION = "NATION_7"


def q_important_stock_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing an outsized share of a
    nation's observed supply value. Supply value is the exact cent sum
    of price over supplying lines from that nation's suppliers; the
    threshold is a scalar (broadcast) fraction of the total — the
    having-over-global-scalar plan: one fact aggregation by part + a
    1-row broadcast, no second fact pass."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == Q11_NATION)
    price_c = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    nat_lines = li.join(
        F.broadcast(
            s.select("s_suppkey", "s_nationkey").join(
                F.broadcast(n.select("n_nationkey")),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ).select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select("l_partkey", price_c.alias("price_c"))
    per_part = nat_lines.groupBy("l_partkey").agg(
        F.sum("price_c").alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_c") * 10000 > F.col("total_c") * Q11_FRACTION_BP)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_c").cast("bigint").alias("value_c"),
        )
        .orderBy(F.desc("value_c"), "p_partkey")
    )


SQL_IMPORTANT_STOCK_Q11 = f"""
WITH nat_lines AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT) AS price_c
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey AND n_name = '{Q11_NATION}'
),
per_part AS (
  SELECT l_partkey, CAST(sum(price_c) AS BIGINT) AS value_c
  FROM nat_lines GROUP BY 1
),
t AS (SELECT CAST(sum(value_c) AS BIGINT) AS total_c FROM per_part)
SELECT l_partkey AS p_partkey, value_c
FROM per_part CROSS JOIN t
WHERE value_c * 10000 > total_c * {Q11_FRACTION_BP}
ORDER BY value_c DESC, p_partkey
"""


def q_excess_supply_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers providing more than 20% of the total
    supplied quantity of any promo-class part ("excess supply" — the
    candidates for stock rebalancing). Per-(part, supp) quantities and
    per-part totals fold from ONE lineitem aggregation (the totals
    derive from the (part, supp) frame, not a second fact pass); the
    part filter broadcasts into the scan side; the supplier dim
    broadcasts onto the survivors for naming."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    qty = F.col("l_quantity").cast("bigint")
    ps_qty = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", qty.alias("qty"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("supp_qty"))
    )
    # per-part total as a WINDOW over the (part, supp) frame — an
    # aggregate joined back would re-derive the frame and scan
    # lineitem twice (plan-pinned single fact scan)
    part_qty = F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
    flagged = (
        ps_qty.withColumn("part_qty", part_qty)
        .where(F.col("supp_qty") * 5 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(
            F.broadcast(flagged), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


SQL_EXCESS_SUPPLY_Q20 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS supp_qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
  FROM ps GROUP BY 1
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT DISTINCT ps.l_suppkey
  FROM ps JOIN tot ON tot.l_partkey = ps.l_partkey
  WHERE ps.supp_qty * 5 > tot.part_qty
)
ORDER BY s_suppkey
"""


SEGMENT_SPLIT_DATE = "1998-01-01"


def q_segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend-quintile migration across a date boundary: each
    customer's exact-cents spend before and after the split is cut
    into quintiles (distributed_ntile — customers with activity in
    both eras only), and the 5x5 transition matrix counts who moved
    where. The segment-drift report behind churn/upsell monitoring.

    Scale: ONE fact aggregation (conditional sums per era in the same
    pass — no second orders scan), two composable distributed_ntile
    range exchanges over the customer frame, and a 25-row regroup.
    Quintile order carries the custkey tiebreak, pinned in the
    oracle's ntile."""
    from etl_dagster_service_crawler_spark.operators.ranking import (
        distributed_ntile,
    )

    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    split = F.lit(SEGMENT_SPLIT_DATE).cast("timestamp")
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("o_orderdate") < split, cents).otherwise(0)).alias(
                "before_c"
            ),
            F.sum(F.when(F.col("o_orderdate") >= split, cents).otherwise(0)).alias(
                "after_c"
            ),
        )
        .where((F.col("before_c") > 0) & (F.col("after_c") > 0))
    )
    per = distributed_ntile(
        per, 5, [F.col("before_c"), F.col("o_custkey")], "seg_before"
    )
    per = distributed_ntile(
        per, 5, [F.col("after_c"), F.col("o_custkey")], "seg_after"
    )
    return (
        per.groupBy("seg_before", "seg_after")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .select(
            F.col("seg_before").cast("int").alias("seg_before"),
            F.col("seg_after").cast("int").alias("seg_after"),
            "n_customers",
        )
        .orderBy("seg_before", "seg_after")
    )


SQL_SEGMENT_MIGRATION = f"""
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '{SEGMENT_SPLIT_DATE}'
                  THEN CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS before_c,
         CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '{SEGMENT_SPLIT_DATE}'
                  THEN CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS after_c
  FROM orders GROUP BY o_custkey
),
act AS (SELECT * FROM per WHERE before_c > 0 AND after_c > 0),
seg AS (
  SELECT o_custkey,
         CAST(ntile(5) OVER (ORDER BY before_c, o_custkey) AS INT) AS seg_before,
         CAST(ntile(5) OVER (ORDER BY after_c, o_custkey) AS INT) AS seg_after
  FROM act
)
SELECT seg_before, seg_after, CAST(count(*) AS BIGINT) AS n_customers
FROM seg GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: for every co-occurring
    type pair, the shared-user count and Jaccard similarity in basis
    points — the segmentation question ("do viewers also click?")
    behind every cross-sell report. Reuses the basket machinery: ONE
    user_id exchange folds each user's distinct types into a bounded
    array; pairs generate map-side (types² ceiling), so there is never
    a distinct-frame self-join; per-type audience sizes fold from the
    same per-user frame and broadcast back twice."""
    e = load_table(spark, sf_dir, "events")
    du = e.select("user_id", "event_type")
    pairs = basket_pair_counts(du, "user_id", "event_type").withColumnsRenamed(
        {"p1": "ta", "p2": "tb", "cnt": "both_users"}
    )
    audience = (
        du.distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    a = audience.withColumnsRenamed({"event_type": "ta", "n_users": "a_users"})
    b = audience.withColumnsRenamed({"event_type": "tb", "n_users": "b_users"})
    return (
        pairs.join(F.broadcast(a), "ta")
        .join(F.broadcast(b), "tb")
        .select(
            "ta",
            "tb",
            F.col("both_users").cast("bigint").alias("both_users"),
            F.col("a_users").cast("bigint").alias("a_users"),
            F.col("b_users").cast("bigint").alias("b_users"),
            F.expr("int((10000 * both_users) div (a_users + b_users - both_users))")
            .alias("jaccard_bp"),
        )
    )


SQL_AUDIENCE_OVERLAP = """
WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
       FROM du GROUP BY 1),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(count(*) AS BIGINT) AS both_users
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.ta, p.tb, p.both_users,
       ta_c.n_users AS a_users, tb_c.n_users AS b_users,
       CAST((10000 * p.both_users)
            // (ta_c.n_users + tb_c.n_users - p.both_users) AS INT)
         AS jaccard_bp
FROM p
JOIN tc ta_c ON ta_c.event_type = p.ta
JOIN tc tb_c ON tb_c.event_type = p.tb
ORDER BY ta, tb
"""


def q_shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: the 10 highest-revenue orders not yet shipped
    as of the cutoff, for one market segment (fixture has no
    shippriority column; o_orderpriority carries the ranking role).
    Plan: the segment filter cuts customer to 1/5 and only c_custkey
    survives projection, so it broadcasts into orders; the only
    shuffle is the lineitem revenue rollup on l_orderkey; the top-10
    folds to TakeOrderedAndProject. The sort key is the exact BIGINT
    unit sum (tie-broken on the unique l_orderkey), so the LIMIT
    selection is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cust = F.broadcast(
        c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    return (
        li.where(F.col("l_shipdate") > F.lit("1998-06-01").cast("date"))
        .join(
            o.where(F.col("o_orderdate") < F.lit("1998-06-01").cast("date")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_units()).alias("rev_units"))
        .orderBy(F.col("rev_units").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            fround(F.col("rev_units").cast("double") / F.lit(1e4), 2).alias(
                "revenue"
            ),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
    )


SQL_SHIPPING_PRIORITY_Q3 = f"""
SELECT l_orderkey,
       {sql_fround("CAST(rev_units AS DOUBLE) / 1e4", 2)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       o_orderpriority
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum({_SQL_REV_UNITS}) AS rev_units
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < DATE '1998-06-01'
    AND l_shipdate > DATE '1998-06-01'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY rev_units DESC, l_orderkey
LIMIT 10
"""


def q_local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: discounted revenue per nation of one region for
    one order year, counting only LOCAL flows (supplier and customer in
    the same nation). Plan: region->nation prunes to a handful of keys,
    so nation-filtered supplier and customer both broadcast; lineitem
    joins orders on the fact key (the one real shuffle) and the
    same-nation predicate applies before the tiny final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = F.broadcast(
        n.join(
            r.where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    supp = F.broadcast(
        s.join(nat, F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", F.col("s_nationkey").alias("supp_nk"), "n_name"
        )
    )
    cust = F.broadcast(
        c.join(
            nat.select("n_nationkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey", F.col("c_nationkey").alias("cust_nk"))
    )
    orders_96 = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    return (
        li.join(orders_96, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nk") == F.col("cust_nk"))
        .groupBy("n_name")
        .agg(
            fround(F.sum(_rev_units()).cast("double") / F.lit(1e4), 2).alias(
                "revenue"
            ),
            F.count("*").cast("int").alias("n_lines"),
        )
        .orderBy("n_name")
    )


SQL_LOCAL_SUPPLIER_VOLUME_Q5 = f"""
SELECT n_name,
       {sql_fround("CAST(sum(" + _SQL_REV_UNITS + ") AS DOUBLE) / 1e4", 2)}
         AS revenue,
       CAST(count(*) AS INT) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY n_name
"""


def q_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: revenue increase from dropping small-quantity
    discounted lines in one ship year. Pure scan + scalar agg: all
    three predicates (date band, discount band, quantity cap) push to
    the parquet scan, no join, no shuffle beyond the 1-row partial-agg
    exchange. The discount band compares on the rounded integer
    percent (the cent idiom), so float storage noise can't flip band
    membership differently per engine."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.floor(F.col("l_discount") * F.lit(1e2) + F.lit(0.5))
    units = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5)) * pct
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & pct.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fround(F.sum(units).cast("double") / F.lit(1e4), 2).alias(
                "revenue"
            ),
            F.count("*").cast("int").alias("n_lines"),
        )
    )


_SQL_DISC_PCT = "CAST(floor(l_discount * 1e2 + 0.5) AS BIGINT)"

SQL_FORECAST_REVENUE_Q6 = f"""
SELECT {sql_fround(
    "CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT) * "
    + _SQL_DISC_PCT + ") AS DOUBLE) / 1e4", 2)} AS revenue,
       CAST(count(*) AS INT) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND {_SQL_DISC_PCT} BETWEEN 5 AND 7
  AND l_quantity < 24
"""


SPECS: list[QuerySpec] = [
    # r8: the remaining classic TPC-H plan shapes (Q3/Q5/Q6)
    QuerySpec(
        "shipping_priority_q3", q_shipping_priority_q3, SQL_SHIPPING_PRIORITY_Q3
    ),
    QuerySpec(
        "local_supplier_volume_q5",
        q_local_supplier_volume_q5,
        SQL_LOCAL_SUPPLIER_VOLUME_Q5,
    ),
    QuerySpec(
        "forecast_revenue_q6", q_forecast_revenue_q6, SQL_FORECAST_REVENUE_Q6
    ),
    QuerySpec(
        "audience_overlap_matrix", q_audience_overlap_matrix, SQL_AUDIENCE_OVERLAP
    ),
    QuerySpec(
        "segment_migration_matrix", q_segment_migration_matrix, SQL_SEGMENT_MIGRATION
    ),
    QuerySpec(
        "min_cost_supplier_q2", q_min_cost_supplier_q2, SQL_MIN_COST_SUPPLIER_Q2
    ),
    QuerySpec("important_stock_q11", q_important_stock_q11, SQL_IMPORTANT_STOCK_Q11),
    QuerySpec(
        "excess_supply_suppliers_q20",
        q_excess_supply_suppliers_q20,
        SQL_EXCESS_SUPPLY_Q20,
    ),
    QuerySpec(
        "bilateral_trade_volume", q_bilateral_trade_volume, SQL_BILATERAL_TRADE
    ),
    QuerySpec("promo_revenue_share", q_promo_revenue_share, SQL_PROMO_SHARE, bench=True),
    QuerySpec(
        "top_supplier_by_revenue", q_top_supplier_by_revenue, SQL_TOP_SUPPLIER
    ),
    QuerySpec(
        "avg_qty_joinback_small", q_avg_qty_joinback_small, SQL_AVG_QTY_JOINBACK
    ),
    QuerySpec("big_orders_customers", q_big_orders_customers, SQL_BIG_ORDERS),
    QuerySpec(
        "disjunctive_predicate_scan",
        q_disjunctive_predicate_scan,
        SQL_DISJUNCTIVE,
    ),
    QuerySpec("solo_late_supplier", q_solo_late_supplier, SQL_SOLO_LATE, bench=True),
    QuerySpec(
        "idle_customers_segment", q_idle_customers_segment, SQL_IDLE_CUSTOMERS
    ),
    QuerySpec(
        "supplier_part_variety", q_supplier_part_variety, SQL_SUPPLIER_VARIETY
    ),
    QuerySpec(
        "retention_cohort_weekly", q_retention_cohort_weekly, SQL_RETENTION_COHORT
    ),
    QuerySpec(
        "product_type_profit", q_product_type_profit, SQL_PRODUCT_PROFIT, bench=True
    ),
    QuerySpec("scd2_customer_history", q_scd2_customer_history, SQL_SCD2),
    QuerySpec(
        "pareto_customer_share", q_pareto_customer_share, SQL_PARETO, bench=True
    ),
    QuerySpec("event_transitions", q_event_transitions, SQL_EVENT_TRANSITIONS),
    QuerySpec("open_orders_timeline", q_open_orders_timeline, SQL_OPEN_ORDERS),
    QuerySpec("rfm_segmentation", q_rfm_segmentation, SQL_RFM, bench=True),
    QuerySpec("join_scd2_pointintime", q_join_scd2_pointintime, SQL_SCD2_PIT),
    QuerySpec(
        "snapshot_diff_reconcile", q_snapshot_diff_reconcile, SQL_SNAPSHOT_DIFF
    ),
    QuerySpec(
        "market_basket_pairs", q_market_basket_pairs, SQL_MARKET_BASKET, bench=True
    ),
    QuerySpec("order_priority_sla", q_order_priority_sla, SQL_ORDER_PRIORITY_SLA),
    QuerySpec("decile_lift_table", q_decile_lift_table, SQL_DECILE_LIFT),
    QuerySpec("mad_outliers", q_mad_outliers, SQL_MAD_OUTLIERS),
    QuerySpec("sales_seasonality", q_sales_seasonality, SQL_SALES_SEASONALITY),
    QuerySpec(
        "attribution_last_touch", q_attribution_last_touch, SQL_ATTRIBUTION
    ),
    QuerySpec(
        "pipeline_customer_features",
        q_pipeline_customer_features,
        _customer_features_sql(),
    ),
    QuerySpec("fk_integrity_audit", q_fk_integrity_audit, SQL_FK_AUDIT),
    QuerySpec("change_point_detect", q_change_point_detect, SQL_CHANGE_POINT),
    QuerySpec("ewma_revenue_daily", q_ewma_revenue_daily, SQL_EWMA),
]
