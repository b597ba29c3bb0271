"""Join operator surface (SURVEY.md §2.B join_* rows).

Scale notes per query are in the operator docstrings
(operators/joins.py). The only shuffle-heavy query here is the asof
join (one hash shuffle on the key); everything else broadcasts a dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.core import QuerySpec
from etl_dagster_service_crawler_spark.functions.compat import davg, dsum, fround, sql_davg, sql_dsum
from etl_dagster_service_crawler_spark.io.tables import load_table
from etl_dagster_service_crawler_spark.operators.joins import (
    asof_join,
    broadcast_dim_join,
    salted_join,
    theta_tolerance_join,
)
from etl_dagster_service_crawler_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    revenue_by_nation,
)


def q_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact x 2 broadcast dims -> group agg (reference P9 legend shape)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = broadcast_dim_join(
        broadcast_dim_join(c, n, F.col("c_nationkey") == F.col("n_nationkey")),
        r,
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return joined.groupBy("r_name").agg(
        F.count("*").alias("cnt"), davg(F.col("c_acctbal"), 2).alias("avg_bal")
    )


SQL_BROADCAST = f"""
SELECT r_name, count(*) AS cnt, {sql_davg("c_acctbal", 2)} AS avg_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_join_theta_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±5 tolerance join against a 5-row legend dim — the reference's
    is_similar_rgb gender-legend match (test.py:36-39, 436-449)."""
    e = load_table(spark, sf_dir, "events")
    legend = load_table(spark, sf_dir, "region").select(
        "r_name", (F.col("r_regionkey") * 40).cast("double").alias("center")
    )
    joined = theta_tolerance_join(
        e, legend, F.abs(F.col("value") - F.col("center")) <= 5.0
    )
    return joined.groupBy("r_name").agg(
        F.count("*").alias("cnt"), davg(F.col("value"), 2).alias("avg_value")
    )


SQL_THETA = f"""
SELECT r_name, count(*) AS cnt, {sql_davg("value", 2)} AS avg_value
FROM events
JOIN (SELECT r_name, CAST(r_regionkey * 40 AS DOUBLE) AS center FROM region) legend
  ON abs(value - center) <= 5.0
GROUP BY r_name
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS — customers that placed an order (Q2 seen-rows)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


SQL_SEMI = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — customers with no orders (Q2 new-rows)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """backward as-of: each event enriched with the customer's latest
    order at event time. Union-sort implementation — one shuffle."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders")
    # unique (key, time) on the right side for determinism
    latest = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    out = asof_join(
        e, latest,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate",
        right_values=["o_orderkey"],
    )
    return out.select("event_id", "o_orderkey")


SQL_ASOF = """
WITH latest AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, l.o_orderkey
FROM events e
ASOF LEFT JOIN latest l
  ON e.user_id = l.o_custkey AND e.ts >= l.o_orderdate
"""


def q_join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/banding join: value BETWEEN band lo AND hi against a small
    banded dim (broadcast nested loop — same physical story as the
    theta join; at scale, a banded dim is derived so the join becomes
    an equi join on floor(value/width) when bands are uniform)."""
    e = load_table(spark, sf_dir, "events")
    bands = load_table(spark, sf_dir, "region").select(
        "r_name",
        (F.col("r_regionkey") * 60.0).alias("lo"),
        (F.col("r_regionkey") * 60.0 + 59.999).alias("hi"),
    )
    joined = theta_tolerance_join(
        e, bands, F.col("value").between(F.col("lo"), F.col("hi"))
    )
    return joined.groupBy("r_name").agg(
        F.count("*").alias("cnt"), fround(F.min("value"), 2).alias("min_v"),
        fround(F.max("value"), 2).alias("max_v"),
    )


SQL_RANGE_BAND = """
SELECT r_name, count(*) AS cnt,
       floor((min(value)) * 100.0 + 0.5) / 100.0 AS min_v,
       floor((max(value)) * 100.0 + 0.5) / 100.0 AS max_v
FROM events
JOIN (SELECT r_name, r_regionkey * 60.0 AS lo, r_regionkey * 60.0 + 59.999 AS hi
      FROM region) bands
  ON value BETWEEN lo AND hi
GROUP BY r_name
"""


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi join via manual salting (hot-key splitting).
    The salt only changes partitioning, so the plain-join SQL is an
    exact oracle. Aggregated output keeps the result bounded."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(li, o, on="l_orderkey", n_salts=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        dsum(F.col("l_extendedprice"), 2).alias("sum_price"),
    )


SQL_SALTED = f"""
SELECT o_orderstatus, count(*) AS cnt,
       {sql_dsum("l_extendedprice", 2)} AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def q_histogram_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT join so zero-order customers count, then a
    second aggregation builds the distribution of order counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_HISTOGRAM = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_min_within_group_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group minimum then join back to recover the
    full row(s) at that minimum — the argmin pattern without a window
    over the whole fact (two small shuffles instead of one big sort)."""
    p = load_table(spark, sf_dir, "part").alias("p")
    mins = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_type").alias("m_type"))
        .agg(F.min("p_retailprice").alias("min_price"))
    )
    return (
        p.join(
            mins,
            (F.col("p.p_type") == F.col("m_type"))
            & (F.col("p.p_retailprice") == F.col("min_price")),
        )
        .select(
            F.col("p.p_type").alias("p_type"),
            "p_partkey",
            (F.floor(F.col("p.p_retailprice") * 1e2 + F.lit(0.5)) / 1e2).alias("price"),
        )
    )


SQL_MIN_JOINBACK = """
SELECT p.p_type, p_partkey,
       floor(p_retailprice * 100.0 + 0.5) / 100.0 AS price
FROM part p
JOIN (SELECT p_type, min(p_retailprice) AS min_price FROM part GROUP BY p_type) m
  ON p.p_type = m.p_type AND p.p_retailprice = m.min_price
"""


def q_topk_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped bench query: selective dim filter -> fact join ->
    agg -> top-k. Checks that the c_mktsegment filter prunes before the
    join and the limit becomes TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            # integer fixed-point on the FACTORS (not a double-product
            # snap: scaled double products can tie at .00005 and the
            # engines' tie rules differ). floor(x*1e2+0.5) is the same
            # IEEE sequence in both engines; BIGINT products/sums are
            # exact — see functions/compat.py for the overflow bound.
            fround(
                F.sum(
                    F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
                    * (F.lit(100) - F.floor(F.col("l_discount") * F.lit(1e2) + F.lit(0.5)))
                ).cast("double")
                / F.lit(1e4),
                2,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_TOPK_REVENUE = """
SELECT o_orderkey, o_orderpriority,
       floor((CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)
                       * CAST(100 - floor(l_discount * 1e2 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4)
             * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: NATION_3's supplier share of revenue earned from
    ASIA customers, per order year. Five joins, but only lineitem and
    orders are fact-sized — every dimension (customer-keys-in-region,
    supplier-nation flags, nation/region) broadcasts, so the plan pays
    exactly the two fact shuffles of the lineitem-orders join + agg.
    Share = ratio of two exact BIGINT cent-sums; one double division
    rounded 4dp (same IEEE op both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_cust = F.broadcast(
        c.join(
            F.broadcast(
                n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).where(
                    F.col("r_name") == "ASIA"
                )
            ),
            c.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp = F.broadcast(
        s.join(F.broadcast(n.select("n_nationkey", "n_name")),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", (F.col("n_name") == "NATION_3").alias("is_target"))
    )
    rev_units = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5)) * (
        F.lit(100) - F.floor(F.col("l_discount") * F.lit(1e2) + F.lit(0.5))
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev_units.alias("rev_units"),
            F.col("is_target"),
        )
    )
    total = F.sum("rev_units")
    target = F.sum(F.when(F.col("is_target"), F.col("rev_units")).otherwise(F.lit(0)))
    return (
        joined.groupBy("o_year")
        .agg(fround(target.cast("double") / total.cast("double"), 4).alias("mkt_share"))
        .orderBy("o_year")
    )


SQL_MARKET_SHARE = """
WITH j AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(floor(l.l_extendedprice * 1e2 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l.l_discount * 1e2 + 0.5) AS BIGINT)) AS rev_units,
         (sn.n_name = 'NATION_3') AS is_target
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
)
SELECT o_year,
       floor((CAST(sum(CASE WHEN is_target THEN rev_units ELSE 0 END) AS DOUBLE)
                / CAST(sum(rev_units) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS mkt_share
FROM j
GROUP BY o_year
ORDER BY o_year
"""


def q_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: revenue lost to returns per customer, top 20.
    The returnflag filter prunes the fact scan (pushed to parquet);
    nation broadcasts; limit folds to TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev_units = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5)) * (
        F.lit(100) - F.floor(F.col("l_discount") * F.lit(1e2) + F.lit(0.5))
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fround(F.sum(rev_units).cast("double") / F.lit(1e4), 2).alias(
                "lost_revenue"
            )
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_RETURNED_REVENUE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       floor((CAST(sum(CAST(floor(l.l_extendedprice * 1e2 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l.l_discount * 1e2 + 0.5) AS BIGINT))) AS DOUBLE)
              / 1e4) * 1e2 + 0.5) / 1e2 AS lost_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
"""


def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: shipments later than 60 days after order date,
    split into urgent vs other priority counts per ship year. The
    lateness predicate is a pure column comparison (no join condition
    inflation); one fact-fact join + one small agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("int").alias("urgent_late"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("int").alias("other_late"),
        )
        .orderBy("ship_year")
    )


SQL_LATE_SHIPMENT = """
SELECT CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS INT) AS urgent_late,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS INT) AS other_late
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY year(l.l_shipdate)
ORDER BY ship_year
"""


FUZZY_MAX_DIST = 2


def q_join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name matching — the entity-resolution staple: near-equal
    strings joined on edit distance <= 2. NEVER an all-pairs cross: the
    name domain is deduplicated first (dimension-sized, not fact-sized)
    and the self-join is bucketed on the last word, so candidates are
    bounded per bucket and Levenshtein runs only inside buckets. At
    100 TB the fact table contributes one distinct-names shuffle; the
    quadratic piece touches only the (tiny) distinct-name domain — if
    THAT domain were huge, the bucket key graduates to an n-gram/LSH
    blocking key (same plan shape, dedup_minhash_lsh's trick)."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("name")).distinct()
    bucketed = names.select(
        "name", F.element_at(F.split("name", " "), -1).alias("bucket")
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.name") < F.col("b.name"))
            & (F.levenshtein(F.col("a.name"), F.col("b.name")) <= FUZZY_MAX_DIST),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name"))
            .cast("int")
            .alias("dist"),
        )
        .orderBy("name_a", "name_b")
    )


SQL_FUZZY = f"""
WITH names AS (
  SELECT DISTINCT p_name AS name FROM part
), b AS (
  SELECT name, string_split(name, ' ')[-1] AS bucket FROM names
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM b a JOIN b b ON a.bucket = b.bucket
 AND a.name < b.name
 AND levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


# --- r9: interval-overlap join via bounded bucket decomposition --------------

# time-slice width for the interval-join decomposition: intervals in
# this workload run minutes-to-hours (value <= ~500 min), so one-hour
# buckets bound the replication factor at ~9 (average far less) — the
# knob a deployment tunes to its own interval-length distribution
INTERVAL_BUCKET_US = 3600 * 1_000_000


def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-overlap join — the session/exposure attribution shape:
    each 'view' opens an interval [ts, ts + value minutes]; every same-
    user 'click' landing inside it matches. A naive formulation is a
    theta join (t BETWEEN start AND end) — a per-user cross product.
    The scalable decomposition: explode each interval to the fixed
    time BUCKETS it covers (<= len/bucket + 1 rows — here ~9 worst
    case for the longest ~500-min interval, far less on average), bucket
    the probes once, equi-join on (user, bucket), exact-filter the
    survivors. Every engine that range-joins at scale (Spark's own
    range-join hints included) plays this trick; here it is explicit
    and plan-pinned — a shuffled equi join, never a cross product.

    Each (view, click) pair meets in EXACTLY one bucket (the click's),
    so no post-join dedup is needed."""
    e = load_table(spark, sf_dir, "events")
    return attribute_clicks(interval_buckets_views(e), bucket_clicks(e))


def interval_buckets_views(e: DataFrame) -> DataFrame:
    """'view' rows -> (view_id, user_id, start_us, end_us, b): one row
    per time bucket the interval [ts, ts + value min] covers. The ONE
    definition of the interval index shape, shared by the batch join
    and the streaming twin (stream_interval_attrib)."""
    dur = F.floor(F.col("value") * F.lit(60e6) + F.lit(0.5)).cast("bigint")
    views = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + dur).alias("end_us"),
    )
    return views.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("start_us") / INTERVAL_BUCKET_US),
                F.floor(F.col("end_us") / INTERVAL_BUCKET_US),
            )
        ).alias("b"),
    )


def bucket_clicks(e: DataFrame) -> DataFrame:
    """'click' rows -> (click_id, user_id, t_us, b). A stateless
    projection — applies identically to a batch frame and a stream."""
    return e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.unix_micros("ts") / INTERVAL_BUCKET_US).alias("b"),
    )


def attribute_clicks(vb: DataFrame, clicks: DataFrame) -> DataFrame:
    """(user, bucket) equi-join + exact containment filter over the
    decomposed frames; (click_id, view_id, user_id, lag_us)."""
    return (
        vb.join(clicks, ["user_id", "b"])
        .where(F.col("t_us").between(F.col("start_us"), F.col("end_us")))
        .select(
            "click_id",
            "view_id",
            "user_id",
            (F.col("t_us") - F.col("start_us")).alias("lag_us"),
        )
    )


SQL_INTERVAL_OVERLAP = """
WITH v AS (
  SELECT event_id AS view_id, user_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + CAST(floor(value * 60e6 + 0.5) AS BIGINT) AS end_us
  FROM events WHERE event_type = 'view'
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type = 'click'
)
SELECT c.click_id, v.view_id, c.user_id, c.t_us - v.start_us AS lag_us
FROM v JOIN c ON v.user_id = c.user_id
 AND c.t_us BETWEEN v.start_us AND v.end_us
"""


SPECS = [
    QuerySpec(
        "join_interval_overlap", q_join_interval_overlap, SQL_INTERVAL_OVERLAP
    ),
    QuerySpec("join_fuzzy_levenshtein", q_join_fuzzy_levenshtein, SQL_FUZZY),
    QuerySpec("market_share_by_year", q_market_share_by_year, SQL_MARKET_SHARE),
    QuerySpec("returned_revenue_topk", q_returned_revenue_topk, SQL_RETURNED_REVENUE),
    QuerySpec("late_shipment_priority", q_late_shipment_priority, SQL_LATE_SHIPMENT),
    QuerySpec("flagship_revenue_by_nation", revenue_by_nation, FLAGSHIP_ORACLE_SQL, bench=True),
    QuerySpec("join_broadcast_dim", q_join_broadcast_dim, SQL_BROADCAST),
    QuerySpec("join_theta_tolerance", q_join_theta_tolerance, SQL_THETA),
    QuerySpec("join_semi", q_join_semi, SQL_SEMI),
    QuerySpec("join_anti", q_join_anti, SQL_ANTI),
    QuerySpec("join_asof_nearest", q_join_asof, SQL_ASOF, bench=True),
    QuerySpec("join_salted_skew", q_join_salted_skew, SQL_SALTED),
    QuerySpec("join_range_band", q_join_range_band, SQL_RANGE_BAND),
    QuerySpec("histogram_orders_per_customer", q_histogram_orders_per_customer, SQL_HISTOGRAM),
    QuerySpec("min_within_group_joinback", q_min_within_group_joinback, SQL_MIN_JOINBACK),
    QuerySpec("topk_revenue_orders", q_topk_revenue_orders, SQL_TOPK_REVENUE, bench=True),
]
