"""Relational/scalar operator surface (SURVEY.md §2.B rows
project_columns … json_extract, aggregations, windows, set ops,
quality gate).

Every query here is pure built-in column expressions — JVM-side, whole
stage codegen, no Python in the hot path. Filters and projections are
written so Catalyst pushes them into the parquet scan.

Oracle-SQL parity rules (see .claude/skills/verify/SKILL.md):
- identical aliases both sides (driver sorts columns by name);
- ROUND() around any aggregate of doubles (summation order differs);
- CAST to the same width (DuckDB count/length/year are BIGINT where
  Spark yields INT, DuckDB sum(int) is HUGEINT);
- dates/timestamps leave as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.core import QuerySpec
from etl_dagster_service_crawler_spark.functions.compat import (
    davg,
    dsum,
    fround,
    sql_davg,
    sql_dsum,
    sql_fround,
    sql_to_cents,
    to_cents,
)
from etl_dagster_service_crawler_spark.functions.cleaning import (
    clean_tokens,
    conditional_encode,
    encode_bool_cn,
    extract_url_key,
    parse_date_tokenized,
    parse_range,
)
from etl_dagster_service_crawler_spark.functions.collections import (
    explode_map_kv,
    kv_entries,
    kv_lookup,
    map_build,
)
from etl_dagster_service_crawler_spark.io.tables import load_table
from etl_dagster_service_crawler_spark.operators.joins import upsert_merge


# --- projections & filters -------------------------------------------------

def q_project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select/rename/computed cols (reference P1, test.py:168-215)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("disc_price"),
        F.upper("l_returnflag").alias("rflag"),
    )


SQL_PROJECT = """
SELECT l_orderkey, l_linenumber,
       floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS disc_price,
       upper(l_returnflag) AS rflag
FROM lineitem
"""


def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row filter incl. IN-list and range (reference Q1 gate shape)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(1000.0, 50000.0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


SQL_FILTER = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O'
  AND o_totalprice BETWEEN 1000.0 AND 50000.0
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
"""


# --- scalar string/clean/encode -------------------------------------------

def q_clean_trim_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim + literal token strip (reference P3, test.py:187,199)."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = clean_tokens(F.col("text"), ["data"])
    return d.select(
        "doc_id", cleaned.alias("cleaned"), F.length(cleaned).alias("clean_len")
    )


SQL_CLEAN = """
SELECT doc_id,
       trim(regexp_replace(text, 'data', '', 'g')) AS cleaned,
       CAST(length(trim(regexp_replace(text, 'data', '', 'g'))) AS INT) AS clean_len
FROM documents
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (P3 family completion): lowercase,
    strip non-alphanumeric-non-space characters, collapse whitespace
    runs, trim — the first pass before any hashing/dedup so 'Spark,
    SPARK and  spark' share one form. Pure per-row regexp/codegen
    expressions, zero exchanges; identical regex semantics in DuckDB
    ('g' flag) so the oracle matches byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.trim(F.regexp_replace(stripped, " +", " "))
    return d.select(
        "doc_id",
        collapsed.alias("norm_text"),
        F.md5(collapsed).alias("norm_hash"),
    )


SQL_TEXT_NORMALIZE = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash
FROM documents
"""


def q_conditional_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN mapping + the reference's 是/否 encode (test.py:190-194)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        conditional_encode(
            F.col("o_orderstatus"), {"O": "open", "F": "finished"}, "pending"
        ).alias("status_label"),
        encode_bool_cn(F.col("o_orderpriority"), "1-URGENT").alias("is_urgent"),
    )


SQL_ENCODE = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN 'open'
            WHEN o_orderstatus = 'F' THEN 'finished'
            ELSE 'pending' END AS status_label,
       CASE WHEN o_orderpriority = '1-URGENT' THEN '是' ELSE '否' END AS is_urgent
FROM orders
"""


def q_split_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/element_at + URL key extraction (reference P7, test.py:417-419)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://site/"), F.col("source"), F.lit("/item/"),
        F.col("doc_id").cast("string"), F.lit("?ref=x"),
    )
    return d.select(
        "doc_id",
        extract_url_key(url).alias("url_key"),
        F.element_at(F.split("text", " "), 1).alias("first_token"),
    )


SQL_SPLIT = r"""
SELECT doc_id,
       regexp_extract('https://site/' || source || '/item/' || CAST(doc_id AS VARCHAR) || '?ref=x',
                      '/([^/?]+)(\?.*)?$', 1) AS url_key,
       split_part(text, ' ', 1) AS first_token
FROM documents
"""


def q_array_join_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array -> '、'-delimited string (reference P5, test.py:209 etc.)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 5), "、").alias("joined5"),
    )


SQL_ARRAY_JOIN = """
SELECT doc_id,
       array_to_string(list_slice(string_split(text, ' '), 1, 5), '、') AS joined5
FROM documents
"""


def q_kv_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array<struct<k,v>> -> map -> element_at; one pass instead of the
    reference's 13 sequential list scans (P2, test.py:217-374)."""
    o = load_table(spark, sf_dir, "orders")
    entries = kv_entries(
        ("status", F.col("o_orderstatus")),
        ("priority", F.col("o_orderpriority")),
        ("cust", F.col("o_custkey").cast("string")),
    )
    return o.select(
        "o_orderkey",
        kv_lookup(entries, "priority").alias("priority"),
        kv_lookup(entries, "missing").alias("missing"),
    )


SQL_KV_LOOKUP = """
SELECT o_orderkey, o_orderpriority AS priority, CAST(NULL AS VARCHAR) AS missing
FROM orders
"""


def q_map_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip parallel arrays -> map, exploded to k/v rows (P8, test.py:42-60)."""
    n = load_table(spark, sf_dir, "nation")
    m = map_build(
        F.array(F.lit("nationkey"), F.lit("regionkey")),
        F.array(F.col("n_nationkey"), F.col("n_regionkey")),
    )
    return n.select("n_name", F.explode(m).alias("k", "v"))


SQL_MAP_BUILD = """
SELECT n_name, 'nationkey' AS k, n_nationkey AS v FROM nation
UNION ALL
SELECT n_name, 'regionkey' AS k, n_regionkey AS v FROM nation
"""


def q_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct assembly + flatten (P10, test.py:423-534)."""
    c = load_table(spark, sf_dir, "customer")
    info = F.struct(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.struct(F.col("c_mktsegment").alias("seg")).alias("seg_info"),
    )
    nested = c.select("c_custkey", info.alias("info"))
    return nested.select(
        "c_custkey",
        F.col("info.name").alias("name"),
        F.col("info.bal").alias("bal"),
        F.col("info.seg_info.seg").alias("seg"),
    )


SQL_NESTED = """
SELECT c_custkey, c_name AS name, c_acctbal AS bal, c_mktsegment AS seg
FROM customer
"""


def q_parse_date_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """locale-token strip then date parse (test.py:185-188)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.concat(F.lit("更新"), F.date_format("o_orderdate", "yyyy/MM/dd"))
    d = parse_date_tokenized(s, ["更新"])
    return o.select("o_orderkey", F.date_format(d, "yyyy-MM-dd").alias("d_str"))


SQL_PARSE_DATE = """
SELECT o_orderkey,
       strftime(strptime(replace('更新' || strftime(o_orderdate, '%Y/%m/%d'), '更新', ''),
                         '%Y/%m/%d'), '%Y-%m-%d') AS d_str
FROM orders
"""


def q_parse_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'lo~hi' -> int bounds (test.py:196-204)."""
    p = load_table(spark, sf_dir, "part")
    s = F.concat(
        F.col("p_size").cast("string"), F.lit("~"), (F.col("p_size") + 7).cast("string")
    )
    lo, hi = parse_range(s)
    return p.select("p_partkey", lo.alias("lo"), hi.alias("hi"))


SQL_PARSE_RANGE = """
SELECT p_partkey,
       CAST(split_part(CAST(p_size AS VARCHAR) || '~' || CAST(p_size + 7 AS VARCHAR), '~', 1) AS INT) AS lo,
       CAST(split_part(CAST(p_size AS VARCHAR) || '~' || CAST(p_size + 7 AS VARCHAR), '~', 2) AS INT) AS hi
FROM part
"""


# --- aggregations -----------------------------------------------------------

def q_agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: partial (map-side) agg means the
    shuffle carries one row per (task, flag, status), not per lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    # Products in integer fixed-point on the FACTORS — snapping the
    # computed double product is tie-prone (the scaled double can land
    # exactly on .00005, where engine tie rules differ); the factors
    # themselves are tidy 2-dp values whose floor(x*1e2+0.5) snap is the
    # identical IEEE sequence in both engines. disc_price terms are
    # 1e-4 units, charge terms 1e-6 units; see functions/compat.py for
    # the int64 group-size bound and the decimal(38,0) escape hatch.
    price_c = F.floor(F.col("l_extendedprice") * F.lit(1e2) + F.lit(0.5))
    disc_f = F.lit(100) - F.floor(F.col("l_discount") * F.lit(1e2) + F.lit(0.5))
    tax_f = F.lit(100) + F.floor(F.col("l_tax") * F.lit(1e2) + F.lit(0.5))
    disc_price_units = price_c * disc_f
    charge_units = price_c * disc_f * tax_f
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            fround(F.sum(disc_price_units).cast("double") / F.lit(1e4), 2).alias(
                "sum_disc_price"
            ),
            fround(F.sum(charge_units).cast("double") / F.lit(1e6), 2).alias(
                "sum_charge"
            ),
            davg(F.col("l_quantity"), 2).alias("avg_qty"),
            davg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_PRICE_C = "CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT)"
_DISC_F = "CAST(100 - floor(l_discount * 1e2 + 0.5) AS BIGINT)"
_TAX_F = "CAST(100 + floor(l_tax * 1e2 + 0.5) AS BIGINT)"

SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity", 2)} AS sum_qty,
       {sql_dsum("l_extendedprice", 2)} AS sum_base_price,
       {sql_fround(f"CAST(sum({_PRICE_C} * {_DISC_F}) AS DOUBLE) / 1e4", 2)} AS sum_disc_price,
       {sql_fround(f"CAST(sum({_PRICE_C} * {_DISC_F} * {_TAX_F}) AS DOUBLE) / 1e6", 2)} AS sum_charge,
       {sql_davg("l_quantity", 2)} AS avg_qty,
       {sql_davg("l_discount", 4)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact distinct per group (Q2 identity semantics)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("uniq_cust"),
        F.count("*").alias("cnt"),
    )


SQL_DISTINCT = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS uniq_cust,
       count(*) AS cnt
FROM orders
GROUP BY o_orderpriority
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping-sets rollup over region/nation."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("cnt"),
        davg(F.col("c_acctbal"), 2).alias("avg_bal"),
    )


SQL_ROLLUP = f"""
SELECT r_name, n_name, count(*) AS cnt, {sql_davg("c_acctbal", 2)} AS avg_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not the rollup/cube lattices): per-status,
    per-priority, and grand-total aggregates in one pass — Spark expands
    the sets with a single Expand node over one scan, not three scans."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("o_totalprice"), 2).alias("total"),
    )


SQL_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       {sql_dsum("o_totalprice", 2)} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct (rows-only: sketch estimates are
    engine-specific; tests assert <=5% relative error vs exact). At
    100 TB this is THE distinct: one pass, fixed memory per group,
    no expand-shuffle like exact count(DISTINCT)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_uniq"),
    )


def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the DAU/WAU
    family. Exact rolling distinct CANNOT partial-aggregate (each
    window would need the full id multiset), so the scale form is a
    per-day HLL sketch (one fact aggregation, mergeable) unioned over
    a 7-row window on the DAYS-sized frame. Rows-only by nature
    (approximate); tests/test_io_udf.py bounds it within 5% of the
    exact trailing distinct recomputed by brute force."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "day",
            F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
                "users_7d"
            ),
        )
        .orderBy("day")
    )


def q_rolling_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-calendar-day distinct users per active day —
    the oracle-backed anchor for the rolling-distinct family (r10):
    rolling_distinct_users reports the series from mergeable HLL
    sketches (rows-only by nature, trailing 7 OBSERVED days); this
    twin pins the exact CALENDAR-window answer — identical to the
    observed-day window wherever the corpus has no gap days — so the
    approximate path has a value-hash-checked ground truth beside its
    5%-error unit test.

    Exact rolling distinct cannot partial-aggregate a sketch, so the
    scale form inverts the window: reduce the fact table ONCE to
    distinct (day, user) pairs, then each pair CONTRIBUTES to the 7
    calendar days it covers (explode of a constant 7-element offset
    range — window-length-bounded fan-out, not a fact self-join), and
    the per-day count-distinct dedups users active on several days of
    the same window. Reported only for days that actually appear in
    events (the contribution fan-out also lands on up-to-6 phantom
    days past each active day; the semi-join with observed days drops
    them identically on both engines).

    Scale: one distinct-pair exchange (map-side combined), a 7x
    map-only fan-out on DAYS×users rows (already fact-reduced), one
    two-phase distinct aggregate keyed by day — no window over an
    unpartitioned frame, no n² day join."""
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = pairs.select("d").distinct()
    contrib = pairs.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        F.date_add(F.col("d"), F.col("off")).alias("day_d"),
        "user_id",
    )
    counts = contrib.groupBy("day_d").agg(
        F.countDistinct("user_id").alias("users_7d")
    )
    return (
        counts.join(days, counts["day_d"] == days["d"], "left_semi")
        .select(
            F.date_format("day_d", "yyyy-MM-dd").alias("day"),
            F.col("users_7d").cast("bigint").alias("users_7d"),
        )
        .orderBy("day")
    )


SQL_ROLLING_DISTINCT_EXACT = """
WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM pairs),
contrib AS (
  SELECT p.d + CAST(off AS INT) AS day_d, p.user_id
  FROM pairs p, unnest(generate_series(0, 6)) AS o(off)
)
SELECT strftime(c.day_d, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT c.user_id) AS BIGINT) AS users_7d
FROM contrib c
WHERE c.day_d IN (SELECT d FROM days)
GROUP BY c.day_d
ORDER BY day
"""


def q_agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the 100 TB distinct-count pattern:
    sketch ONCE at the fine grain (distinct customers per nation,
    hll_sketch_agg = Apache DataSketches HLL), then merge the binary
    sketches upward (hll_union_agg to region) without touching the
    fact table again. In production the nation-level sketch column is
    a persisted daily artifact; every coarser rollup (region, global,
    arbitrary date spans) is a cheap union over sketches — no second
    scan, no expand-shuffle. Rows-only: sketch estimates are
    engine-specific; the unit test pins merge-vs-direct equality and
    <=2% error vs exact."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", 14).alias("sk")
    )
    dim = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            "n_nationkey", "r_name"
        )
    )
    return (
        per_nation.join(dim, per_nation.c_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers")
        )
        .orderBy("r_name")
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping-sets cube over returnflag/linestatus with grouping_id to
    tell subtotal NULLs from data NULLs (SURVEY §2.B agg_grouping_sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        dsum(F.col("l_quantity"), 2).alias("sum_qty"),
        F.grouping_id().cast("int").alias("gid"),
    )


SQL_CUBE = f"""
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       {sql_dsum("l_quantity", 2)} AS sum_qty,
       CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one column per event_type with per-user counts. The value
    list is pinned (no discovery pass — at scale an unpinned pivot
    scans twice and can explode the schema)."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "error"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


SQL_PIVOT = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events
GROUP BY user_id
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance, correlation,
    covariance — one pass, map-side partials like any hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fround(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        fround(F.var_samp("l_discount"), 6).alias("var_disc"),
        fround(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        fround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
    )


SQL_STATS = """
SELECT l_returnflag,
       floor((stddev_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sd_qty,
       floor((var_samp(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS var_disc,
       floor((corr(l_quantity, l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS corr_qty_price,
       floor((covar_samp(l_quantity, l_extendedprice)) * 100.0 + 0.5) / 100.0 AS cov_qty_price
FROM lineitem
GROUP BY l_returnflag
"""


def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont) plus the approx_percentile scale path is covered by
    the tolerance-tested approx ops."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        fround(F.percentile("o_totalprice", 0.5), 2).alias("p50"),
        fround(F.percentile("o_totalprice", 0.95), 2).alias("p95"),
    )


SQL_PERCENTILE = """
SELECT o_orderstatus,
       floor((quantile_cont(o_totalprice, 0.5)) * 100.0 + 0.5) / 100.0 AS p50,
       floor((quantile_cont(o_totalprice, 0.95)) * 100.0 + 0.5) / 100.0 AS p95
FROM orders
GROUP BY o_orderstatus
"""


def q_agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax parity (SQL min_by/max_by): per event_type, the
    event id carrying the earliest and latest timestamp. The ordering
    key (ts) is UNIQUE in the fixture (microsecond event times), so
    both engines pick the same row — min_by on a tied key is engine-
    arbitrary and would never hash-match (DuckDB's min_by cannot take
    a struct tiebreak, so uniqueness is the contract here). Map-side
    partial aggregates: argmin folds like min."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.min_by("event_id", F.col("ts")).alias("first_event_id"),
        F.max_by("event_id", F.col("ts")).alias("last_event_id"),
        F.count(F.lit(1)).alias("cnt"),
    )


SQL_MIN_MAX_BY = """
SELECT event_type,
       min_by(event_id, ts) AS first_event_id,
       max_by(event_id, ts) AS last_event_id,
       CAST(count(*) AS BIGINT) AS cnt
FROM events
GROUP BY event_type
"""


def q_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period BI staple: month-over-month revenue growth in
    integer basis points. The fact aggregates once to a months-sized
    frame; the lag window then runs on that TINY frame (single
    partition is fine — it is dozens of rows at any corpus size, the
    windowed object is the AGGREGATE, never the fact)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(cents).alias("rev_cents"))
    w = Window.orderBy("month")
    return (
        monthly.withColumn("lag_rev", F.lag("rev_cents").over(w))
        .select(
            "month",
            "rev_cents",
            F.when(
                F.col("lag_rev").isNotNull(),
                F.expr("(10000 * (rev_cents - lag_rev)) div lag_rev"),
            ).alias("growth_bp"),
        )
        .orderBy("month")
    )


SQL_MOM_GROWTH = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
)
SELECT month, rev_cents,
       CASE WHEN lag(rev_cents) OVER (ORDER BY month) IS NOT NULL
            THEN (10000 * (rev_cents - lag(rev_cents) OVER (ORDER BY month)))
                 // lag(rev_cents) OVER (ORDER BY month)
       END AS growth_bp
FROM monthly
ORDER BY month
"""


def q_cdc_merge_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: apply an ordered change log (upserts + deletes,
    possibly many changes per key) onto a snapshot — the batch form of
    consuming a Debezium/binlog feed. The log derives deterministically
    from orders: key = custkey, sequenced by orderkey, op = DELETE on
    every 13th change. Last change per key wins (window on key by seq
    DESC); winners that are deletes drop the key, upserts override the
    snapshot, unseen snapshot keys survive.

    Scale: the last-wins window partial-prunes via WindowGroupLimit-
    style top-1; snapshot and compacted-log then merge on ONE key
    exchange each (FULL OUTER) — change logs are processed at log
    size, never replayed per key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    log = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 13 == 0, "D").otherwise("U").alias("op"),
        cents.alias("new_bal_c"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    last = (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", "op", "new_bal_c")
    )
    snap = c.select(
        F.col("c_custkey").alias("key"),
        F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5))
        .cast("bigint")
        .alias("bal_c"),
    )
    merged = snap.join(last, "key", "full_outer")
    return (
        merged.where((F.col("op").isNull()) | (F.col("op") == "U"))
        .select(
            "key",
            F.coalesce(F.col("new_bal_c"), F.col("bal_c")).alias("bal_c"),
            F.when(F.col("op").isNull(), "unchanged")
            .otherwise("updated")
            .alias("state"),
        )
    )


SQL_CDC_MERGE = """
WITH log AS (
  SELECT o_custkey AS key, o_orderkey AS seq,
         CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS new_bal_c
  FROM orders
),
last AS (
  SELECT key, op, new_bal_c FROM (
    SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM log
  ) WHERE rn = 1
),
snap AS (
  SELECT c_custkey AS key,
         CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT) AS bal_c
  FROM customer
)
SELECT key,
       coalesce(new_bal_c, bal_c) AS bal_c,
       CASE WHEN op IS NULL THEN 'unchanged' ELSE 'updated' END AS state
FROM snap FULL OUTER JOIN last USING (key)
WHERE op IS NULL OR op = 'U'
"""


def q_corr_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per event_type between the event value and
    the user bucket — composed from EXACT BIGINT moments (n, Σx, Σy,
    Σx², Σy², Σxy over cent-unit ints) with only the final divisions
    in double, the same summation-order-independent discipline as the
    z-score anomaly query. A direct corr() would sum doubles in
    partition order and drift in the last ulp between engines."""
    e = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    y = F.pmod(F.col("user_id"), F.lit(100)).cast("bigint")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "event_type",
        "n",
        fround(cov / F.sqrt(vx * vy), 6).alias("corr"),
    )


SQL_CORR_MOMENTS = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yb) AS BIGINT) AS sy,
         CAST(sum(xc * xc) AS BIGINT) AS sxx,
         CAST(sum(yb * yb) AS BIGINT) AS syy,
         CAST(sum(xc * yb) AS BIGINT) AS sxy
  FROM (
    SELECT event_type,
           CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS xc,
           CAST(user_id % 100 AS BIGINT) AS yb
    FROM events
  )
  GROUP BY event_type
)
SELECT event_type, n,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS corr
FROM m
"""


def q_join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery surface (SQL:2016 / Spark 3.4+):
    for each high-value order, its top-2 lineitems by quantity. The
    declarative form of per-key top-N; Catalyst decorrelates the
    lateral into a window-style plan rather than re-executing per row
    — the same physics as window_rank_topk, exposed through the SQL
    surface a warehouse user would write."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.l_quantity
        FROM orders_v o,
        LATERAL (
          SELECT l_linenumber, l_quantity
          FROM lineitem_v
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_quantity DESC, l_linenumber
          LIMIT 2
        ) t
        WHERE o.o_totalprice > 400000.0
        """
    )


SQL_LATERAL_TOPN = """
SELECT o.o_orderkey, t.l_linenumber, t.l_quantity
FROM orders o,
LATERAL (
  SELECT l_linenumber, l_quantity
  FROM lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_quantity DESC, l_linenumber
  LIMIT 2
) t
WHERE o.o_totalprice > 400000.0
"""


HIST_BUCKETS = 20


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values per type — the profiling
    companion to table_profile. Bucket edges derive from per-type
    integer-cent min/max (broadcast back), and bucket assignment is
    exact integer arithmetic, so both engines bin identically even at
    edge values. One fact aggregation + one tiny-frame broadcast."""
    e = load_table(spark, sf_dir, "events")
    v_c = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    bounds = e.groupBy("event_type").agg(
        F.min(v_c).alias("lo_c"), F.max(v_c).alias("hi_c")
    )
    # `div` on both sides, never double-`/`-then-cast: a quotient
    # within one ulp of an integer would truncate differently across
    # engines and flip a bucket (width is always >= 1 by the +1).
    return (
        e.join(F.broadcast(bounds), "event_type")
        .withColumn("v_c", v_c)
        .withColumn(
            "width", F.expr(f"((hi_c - lo_c) div {HIST_BUCKETS}) + 1")
        )
        .groupBy(
            "event_type",
            F.least(
                F.expr("(v_c - lo_c) div width"),
                F.lit(HIST_BUCKETS - 1).cast("bigint"),
            ).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type", "bucket")
    )


SQL_VALUE_HISTOGRAM = f"""
WITH b AS (
  SELECT event_type,
         CAST(min(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS lo_c,
         CAST(max(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS hi_c
  FROM events GROUP BY event_type
)
SELECT events.event_type AS event_type,
       least(
         (CAST(floor(value * 1e2 + 0.5) AS BIGINT) - lo_c)
           // (((hi_c - lo_c) // {HIST_BUCKETS}) + 1),
         {HIST_BUCKETS - 1}
       ) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM events JOIN b USING (event_type)
GROUP BY 1, 2
ORDER BY event_type, bucket
"""


def q_agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered set listagg per group (SQL string_agg / LISTAGG parity):
    the distinct sources per language as one sorted comma-joined
    string. collect_set partial-aggregates map-side, so the shuffle
    carries per-task distinct sets, never raw rows; the sort happens
    on the grouped set (bounded by group cardinality)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
            "sources_csv"
        ),
        F.countDistinct("source").alias("n_sources"),
    )


SQL_STRING_CONCAT = """
SELECT lang,
       string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY lang
"""


def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation parity: multiple
    differently-filtered aggregates over ONE scan (urgent count,
    big-order revenue, open-order count per status) — the idiom that
    replaces N self-joined subqueries with one pass. All conditions
    evaluate inside the map-side partial aggregate."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
            "urgent_cnt"
        ),
        F.sum(F.when(F.col("o_totalprice") > 100000.0, cents)).alias(
            "big_rev_cents"
        ),
        F.count(F.lit(1)).alias("total_cnt"),
    )


SQL_AGG_FILTERED = """
SELECT o_orderstatus,
       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
         AS urgent_cnt,
       CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT))
            FILTER (WHERE o_totalprice > 100000.0) AS BIGINT) AS big_rev_cents,
       CAST(count(*) AS BIGINT) AS total_cnt
FROM orders
GROUP BY o_orderstatus
"""


def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier clipping (winsorization): clamp each event's
    value into its type's [p01, p99] band — the feature-prep step
    before any scale-sensitive statistics. Bounds are floored to cent
    units so the clamp compares exact BIGINTs, and the percentile is
    taken over the ALREADY-INTEGER cent column — both engines then
    interpolate over identical integer inputs, so the floored bound
    cannot drift by a last-ulp difference in `value * 1e2` between
    Spark percentile and DuckDB quantile_cont.

    Scale: ONE pass computes the per-type bounds (tiny frame, exact
    percentile — swap approx_percentile at 100 TB, same plan), which
    broadcast back onto the unshuffled fact scan: the events table is
    never exchanged."""
    e = load_table(spark, sf_dir, "events")
    v_c = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    pb = e.groupBy("event_type").agg(
        F.floor(F.percentile(v_c, 0.01) + F.lit(0.5))
        .cast("bigint")
        .alias("lo_c"),
        F.floor(F.percentile(v_c, 0.99) + F.lit(0.5))
        .cast("bigint")
        .alias("hi_c"),
    )
    clipped = F.greatest(F.col("lo_c"), F.least(F.col("hi_c"), v_c))
    return e.join(F.broadcast(pb), "event_type").select(
        "event_id",
        "event_type",
        clipped.alias("v_clipped_c"),
        ((v_c < F.col("lo_c")) | (v_c > F.col("hi_c")))
        .cast("int")
        .alias("was_clipped"),
    )


SQL_WINSORIZE = """
WITH pb AS (
  SELECT event_type,
         CAST(floor(quantile_cont(
           CAST(floor(value * 1e2 + 0.5) AS BIGINT), 0.01) + 0.5)
           AS BIGINT) AS lo_c,
         CAST(floor(quantile_cont(
           CAST(floor(value * 1e2 + 0.5) AS BIGINT), 0.99) + 0.5)
           AS BIGINT) AS hi_c
  FROM events GROUP BY event_type
)
SELECT event_id, events.event_type AS event_type,
       greatest(lo_c, least(hi_c,
         CAST(floor(value * 1e2 + 0.5) AS BIGINT))) AS v_clipped_c,
       CAST(CAST(floor(value * 1e2 + 0.5) AS BIGINT) < lo_c
            OR CAST(floor(value * 1e2 + 0.5) AS BIGINT) > hi_c AS INT)
         AS was_clipped
FROM events JOIN pb USING (event_type)
"""


def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the token stream: terms with >2x the
    mean term frequency — the hot-vocabulary pre-pass a dedup/quality
    pipeline runs to spot template storms (the fixture corpus is
    template-heavy, so this is non-trivially populated). Shape: explode
    -> per-token counts (map-side partials absorb the token stream),
    then the threshold is a global window over the SMALL aggregated
    frame (one row per distinct token) — the corpus is never globally
    windowed or scanned twice."""
    e = load_table(spark, sf_dir, "events")
    # the fixtures are uniform by construction, so derive a
    # deterministically SKEWED key (exponential bucket sizes:
    # bucket 2^j holds ~2^j of every 1024 rows) — the stand-in for the
    # Zipf-distributed keys real corpora have
    bucket = F.pow(
        F.lit(2.0), F.floor(F.log2(1 + F.col("event_id") % 1024))
    ).cast("bigint")
    counts = e.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy()
    return (
        counts.withColumn("avg_cnt", F.avg("cnt").over(w))
        .where(F.col("cnt") > 2 * F.col("avg_cnt"))
        .select("bucket", "cnt")
    )


SQL_HEAVY_HITTERS = """
WITH g AS (
  SELECT CAST(pow(2, floor(log2(1 + event_id % 1024))) AS BIGINT) AS bucket,
         count(*) AS cnt
  FROM events GROUP BY 1
)
SELECT bucket, cnt FROM g WHERE cnt > 2 * (SELECT avg(cnt) FROM g)
"""


def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (rows-only: estimates are engine-
    specific; the unit test bounds error vs the exact twin
    agg_percentile). At 100 TB this IS the percentile: one pass,
    bounded memory per group, mergeable partials — exact
    percentile_cont needs a per-group sort of the full column."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", 0.5, 1000).alias("p50_approx"),
        F.approx_percentile("o_totalprice", 0.95, 1000).alias("p95_approx"),
    )


def q_agg_map_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 應徵分析 distribution shape (P8, test.py:423-524):
    per-group label -> percentage map, built as a real MapType column and
    exploded back to k/v rows for the oracle compare."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cnt = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("c_mktsegment")
    pct = fround(F.lit(100.0) * F.col("cnt") / F.sum("cnt").over(w), 2)
    dist = (
        cnt.withColumn("pct", pct)
        .groupBy("c_mktsegment")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("n_name", "pct"))).alias("dist")
        )
    )
    return explode_map_kv(dist, "dist", "label", "pct").select(
        F.col("c_mktsegment").alias("seg"), "label", "pct"
    )


SQL_MAP_DIST = """
SELECT c_mktsegment AS seg, n_name AS label,
       floor((100.0 * count(*) / sum(count(*)) OVER (PARTITION BY c_mktsegment)) * 100.0 + 0.5) / 100.0 AS pct
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_mktsegment, n_name
"""


# --- windows ----------------------------------------------------------------

def q_window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-3 orders per customer; unique-key tiebreak keeps it deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """consecutive-event deltas per user."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        fround(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


SQL_LAG = """
SELECT event_id, user_id,
       floor((value - lag(value) OVER w) * 100.0 + 0.5) / 100.0 AS delta,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


SESSION_GAP_MIN = 60


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the classic gap-based session id (twin of
    the streaming session window, stream_window_session): a new session
    starts when a user's inter-event gap exceeds 60 minutes; the
    session id is the running count of session starts. Both windows
    partition on user_id, so the whole query is ONE exchange; at 100 TB
    the per-user partitions stay bounded by per-user event counts, the
    scale axis (users) is the parallelism axis."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer micros on both engines (unix_micros ≙ epoch_us) —
    # second-truncating casts can disagree on sub-second gaps
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(new_sess).over(wcum).cast("int").alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )


SQL_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS INT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS INT) AS n_events
FROM s
GROUP BY user_id, session_id
"""


def q_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rolling 3-row sum per user."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    # fixed-point inside the frame: windowed double sums are engine-order
    # dependent (DuckDB uses segment trees, Spark sequential scans);
    # BIGINT unit sums are exact under any evaluation order
    return e.select(
        "event_id",
        fround(F.sum(to_cents(F.col("value"))).over(w).cast("double") / 1e4, 2).alias(
            "roll_sum"
        ),
    )


SQL_ROLLING = f"""
SELECT event_id,
       {sql_fround(f'''CAST(sum({sql_to_cents("value")}) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e4''', 2)} AS roll_sum
FROM events
"""


def q_window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over TIME (not rows): per user, the trailing-1-hour
    sum of value — the time-decayed feature/monitoring window shape.
    ROWS frames count neighbors; RANGE frames bound the ORDER BY value
    itself, so ties (same ts) are peers and late/dense regions widen
    the frame — semantics a row frame cannot express. Exact BIGINT
    cent units keep the in-frame sum engine-order independent."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        fround(
            F.sum(to_cents(F.col("value"))).over(w).cast("double") / 1e4, 2
        ).alias("hour_sum"),
    )


SQL_WINDOW_RANGE_TIME = f"""
SELECT event_id,
       {sql_fround(f'CAST(sum({sql_to_cents("value")}) OVER (PARTITION BY user_id ORDER BY epoch(ts) RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e4', 2)} AS hour_sum
FROM events
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: view -> click -> purchase, each step
    strictly AFTER the user's previous step. Three chained per-user
    conditional-min aggregations; every aggregation and join keys on
    user_id, so the whole funnel is ONE partitioning reused across
    stages (AQE co-locates the join-backs) — no per-user event
    collection, no UDF, no self-join explosion. Output: users reaching
    each depth and step-to-step conversion."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = e.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        e.join(t1, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        e.join(t2, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # stay LAZY: the three depth counts are single-row aggregates
    # crossJoined in-plan (scalar-subquery shape), then exploded into
    # the 3-row funnel report — no driver-side .count() actions at
    # DataFrame-construction time (the eager-builder anti-pattern).
    counts = (
        t1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n3")))
    )

    def _conv(num, den):
        return F.when(
            den > 0, fround(num.cast("double") / den.cast("double"), 4)
        )

    rows = F.array(
        F.struct(
            F.lit(1).alias("step"),
            F.lit("view").alias("event_type"),
            F.col("n1").alias("n_users"),
            _conv(F.col("n1"), F.col("n1")).alias("conv_from_prev"),
        ),
        F.struct(
            F.lit(2).alias("step"),
            F.lit("click").alias("event_type"),
            F.col("n2").alias("n_users"),
            _conv(F.col("n2"), F.col("n1")).alias("conv_from_prev"),
        ),
        F.struct(
            F.lit(3).alias("step"),
            F.lit("purchase").alias("event_type"),
            F.col("n3").alias("n_users"),
            _conv(F.col("n3"), F.col("n2")).alias("conv_from_prev"),
        ),
    )
    return counts.select(F.explode(rows).alias("s")).select("s.*")


SQL_FUNNEL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id
),
counts AS (
  SELECT (SELECT count(*) FROM t1) AS n1,
         (SELECT count(*) FROM t2) AS n2,
         (SELECT count(*) FROM t3) AS n3
)
SELECT step, event_type, n_users, conv_from_prev FROM (
  SELECT 1 AS step, 'view' AS event_type, n1 AS n_users,
         CASE WHEN n1 > 0 THEN floor(CAST(n1 AS DOUBLE)/n1 * 1e4 + 0.5)/1e4 END AS conv_from_prev
  FROM counts
  UNION ALL
  SELECT 2, 'click', n2,
         CASE WHEN n1 > 0 THEN floor(CAST(n2 AS DOUBLE)/n1 * 1e4 + 0.5)/1e4 END
  FROM counts
  UNION ALL
  SELECT 3, 'purchase', n3,
         CASE WHEN n2 > 0 THEN floor(CAST(n3 AS DOUBLE)/n2 * 1e4 + 0.5)/1e4 END
  FROM counts
)
"""


def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: per event_type, z-score each day's
    event count against that type's daily history; flag |z| > 2. The
    monitoring query every ingest pipeline runs on itself.

    Cross-engine exactness: counts are integers, so n, sum(cnt) and
    sum(cnt^2) are exact BIGINTs in any order; sample variance is
    composed from those three scalars and only the final mean/std/z
    divisions are (identical-IEEE) double ops, rounded 4dp. Shape: one
    (day, type) aggregation exchange, then a window on the tiny
    per-type partition — fact scanned once."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return anomaly_zscore_transform(daily)


def anomaly_zscore_transform(daily: DataFrame) -> DataFrame:
    """z-score a (day, event_type, cnt) rollup per type and flag
    |z| > 2 — shared by the batch query and the streaming twin (the
    streamed rollup feeds the same scoring)."""
    w = Window.partitionBy("event_type")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("cnt").over(w)
    s2 = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    mean = s1.cast("double") / n.cast("double")
    var = (n * s2 - s1 * s1).cast("double") / (n * (n - 1)).cast("double")
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return daily.select(
        "day",
        "event_type",
        "cnt",
        fround(z, 4).alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    ).orderBy("event_type", "day")


SQL_EVENTS_ANOMALY = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT day, event_type, cnt,
         count(*) OVER w AS n,
         sum(cnt) OVER w AS s1,
         sum(cnt * cnt) OVER w AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type)
),
scored AS (
  SELECT day, event_type, cnt,
         (CAST(cnt AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
           / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * (n - 1))) AS z
  FROM stats
)
SELECT day, event_type, cnt,
       floor(z * 1e4 + 0.5) / 1e4 AS z,
       abs(z) > 2.0 AS is_anomaly
FROM scored
ORDER BY event_type, day
"""


# --- sort/limit & set ops ----------------------------------------------------

def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions beyond rank/lag: first/last value over
    a frame, ntile buckets, cumulative distribution."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(wf).alias("first_order"),
        F.last("o_orderkey").over(wf).alias("last_order"),
        F.ntile(4).over(w).alias("quartile"),
        fround(F.cume_dist().over(w), 6).alias("cdist"),
    )


SQL_WINDOW_ANALYTICS = """
SELECT o_orderkey, o_custkey,
       first_value(o_orderkey) OVER w_full AS first_order,
       last_value(o_orderkey) OVER w_full AS last_order,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       floor((cume_dist() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling over a generated date spine: sequence() -> explode ->
    left join daily counts -> zero-fill. The spine is generated from
    min/max bounds (one tiny agg), never collected to the driver."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(F.count("*").alias("cnt"))
    bounds = e.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )


SQL_DATE_SPINE = """
WITH b AS (SELECT CAST(min(ts) AS DATE) lo, CAST(max(ts) AS DATE) hi FROM events),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM b),
daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS cnt FROM events GROUP BY 1)
SELECT strftime(spine.d, '%Y-%m-%d') AS day, coalesce(daily.cnt, 0) AS cnt
FROM spine LEFT JOIN daily ON spine.d = daily.d
"""


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (TakeOrderedAndProject — no full sort/scan collect)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(100)
    )


SQL_SORT_LIMIT = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 100
"""


def q_set_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union old+new then dedup by key — the reference's JSON append-merge
    semantics (K1, test.py:115-120) done relationally."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") < 2000.0).select("o_orderkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_orderkey")
    return a.unionByName(b).dropDuplicates(["o_orderkey"])


SQL_UNION_DEDUP = """
SELECT DISTINCT o_orderkey FROM (
  SELECT o_orderkey FROM orders WHERE o_totalprice < 2000.0
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
)
"""


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.where(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_custkey").alias("key"))
        .intersect(o.select(F.col("o_custkey").alias("key")))
    )


SQL_INTERSECT = """
SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000.0
INTERSECT
SELECT o_custkey AS key FROM orders
"""


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.select(F.col("c_custkey").alias("key"))
        .exceptAll(o.select(F.col("o_custkey").alias("key")).distinct())
        .distinct()
    )


SQL_EXCEPT = """
SELECT c_custkey AS key FROM customer
EXCEPT
SELECT o_custkey AS key FROM orders
"""


def q_set_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style MERGE/upsert done relationally: a full outer join of
    snapshot and update batch on the key, update winning per column via
    coalesce — rows only in the snapshot survive, overlapping keys take
    the update's values, new keys insert. This generalizes the
    reference's read-old-concat-new JSON merge (K1, test.py:115-120)
    to keyed upsert semantics. At 100 TB: one shuffle per side on the
    key (sort-merge); with both tables bucketed on the key it is
    exchange-free like q_bucketed_colocated_join."""
    o = load_table(spark, sf_dir, "orders")
    cutoff_old = F.lit("1996-01-01").cast("date")
    cutoff_new = F.lit("1995-01-01").cast("date")
    snap = o.where(F.to_date("o_orderdate") < cutoff_old).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upd = o.where(F.to_date("o_orderdate") >= cutoff_new).select(
        "o_orderkey",
        F.lit("R").alias("o_orderstatus"),
        fround(F.col("o_totalprice") * 1.05).alias("o_totalprice"),
    )
    merged = upsert_merge(snap, upd, "o_orderkey", ["o_orderstatus", "o_totalprice"])
    return merged.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )


SQL_UPSERT_MERGE = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1996-01-01'
),
upd AS (
  SELECT o_orderkey, 'R' AS o_orderstatus,
         floor((o_totalprice * 1.05) * 100.0 + 0.5) / 100.0 AS o_totalprice
  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
)
SELECT coalesce(n.o_orderkey, s.o_orderkey) AS o_orderkey,
       coalesce(n.o_orderstatus, s.o_orderstatus) AS status,
       coalesce(n.o_totalprice, s.o_totalprice) AS price
FROM snap s FULL JOIN upd n ON s.o_orderkey = n.o_orderkey
"""


# --- quality gate -------------------------------------------------------------

def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per-row bad-field count + threshold filter — the reference's
    '>6 empty fields is an error row' heuristic (Q1, test.py:548-549),
    expressed as an array aggregate inside codegen."""
    c = load_table(spark, sf_dir, "customer")
    flags = F.array(
        (F.col("c_acctbal") < 0).cast("int"),
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING").cast("int"),
        (F.col("c_nationkey") < 5).cast("int"),
        (F.col("c_custkey") % 10 == 0).cast("int"),
    )
    n_bad = F.aggregate(flags, F.lit(0), lambda acc, x: acc + x)
    return (
        c.withColumn("n_bad", n_bad)
        .where(F.col("n_bad") <= 2)
        .select("c_custkey", "n_bad")
    )


SQL_QUALITY = """
SELECT c_custkey, n_bad FROM (
  SELECT c_custkey,
         CAST((CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
            + (CASE WHEN c_mktsegment IN ('AUTOMOBILE','BUILDING') THEN 1 ELSE 0 END)
            + (CASE WHEN c_nationkey < 5 THEN 1 ELSE 0 END)
            + (CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END) AS INT) AS n_bad
  FROM customer
)
WHERE n_bad <= 2
"""


# --- scalar function packs -----------------------------------------------------

def q_scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_name").alias("lo"),
        F.substring("c_name", 10, 4).alias("sub"),
        F.length("c_name").alias("len"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000000")).alias("lev"),
        F.col("c_name").like("%42").alias("ends42"),
    )


SQL_STRING_FNS = """
SELECT c_custkey,
       upper(c_name) AS up,
       lower(c_name) AS lo,
       substr(c_name, 10, 4) AS sub,
       CAST(length(c_name) AS INT) AS len,
       CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS lev,
       c_name LIKE '%42' AS ends42
FROM customer
"""


def q_scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("mstart"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_02"),
    )


SQL_DATE_FNS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
       CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_02
FROM orders
"""


def q_scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("absd"),
        F.ceil("l_extendedprice").alias("cl"),
        F.floor("l_quantity").alias("fl"),
        F.sqrt("l_quantity").alias("sq"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
    )


SQL_MATH_FNS = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS absd,
       CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
       CAST(floor(l_quantity) AS BIGINT) AS fl,
       sqrt(l_quantity) AS sq,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string field -> typed column (events.props)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT twin of json_extract: parse the JSON ONCE into
    the binary variant encoding, then do typed path gets. At scale this
    replaces N get_json_object calls that each re-parse the string —
    variant parses once and every extraction is a binary lookup.
    schema_of_variant documents the inferred shape per row."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.schema_of_variant(v).alias("vschema"),
    )


SQL_JSON_VARIANT = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CASE
         WHEN props IS NULL THEN NULL
         WHEN json_structure(props) = '{"k":"UBIGINT"}' THEN 'OBJECT<k: BIGINT>'
         ELSE 'unmapped json shape: ' || json_structure(props)
       END AS vschema
FROM events
"""


def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) through the spark.sql surface
    — Catalyst decorrelates it to a left-semi join, so it scales like
    any equi join (no per-row re-execution)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS cnt
        FROM orders_v
        WHERE EXISTS (
          SELECT 1 FROM lineitem_v
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAYS
        )
        GROUP BY o_orderpriority
        """
    )


SQL_SUBQUERY_EXISTS = """
SELECT o_orderpriority, count(*) AS cnt
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
GROUP BY o_orderpriority
"""


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced above the corpus
    average — one extra tiny agg job feeding a literal into the filter."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, p_name,
               floor(p_retailprice * 1e2 + 0.5) / 1e2 AS price
        FROM part_v
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part_v)
        """
    )


SQL_SUBQUERY_SCALAR = """
SELECT p_partkey, p_name,
       floor(p_retailprice * 100.0 + 0.5) / 100.0 AS price
FROM part
WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide metric columns -> (metric, value) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


SQL_UNPIVOT = """
SELECT l_orderkey, l_linenumber, metric, val
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax FROM lineitem)
UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
"""


def q_hof_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / exists /
    aggregate fold — all JVM-side lambda evaluation, no Python."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.transform(toks, lambda t: F.upper(t))).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
        F.exists(toks, lambda t: t == F.lit("data")).alias("has_data"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
    )


SQL_HOF = """
SELECT doc_id,
       CAST(len(list_transform(t, x -> upper(x))) AS INT) AS n_tokens,
       CAST(len(list_filter(t, x -> len(x) > 5)) AS INT) AS n_long,
       CAST(len(list_filter(t, x -> x = 'data')) > 0 AS BOOLEAN) AS has_data,
       CAST(list_reduce(list_prepend(0, list_transform(t, x -> CAST(len(x) AS INT))),
                        (acc, x) -> acc + x) AS INT) AS total_chars
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
"""


def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: build, keys/values, lookup, size, concat —
    exploded back to rows for the oracle compare."""
    n = load_table(spark, sf_dir, "nation")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("name").alias("k"), F.col("n_name").alias("v")),
            F.struct(F.lit("region").alias("k"), F.col("n_regionkey").cast("string").alias("v")),
        )
    )
    return n.select(
        "n_nationkey",
        F.map_concat(m, F.create_map(F.lit("kind"), F.lit("nation"))).alias("m"),
    ).select(
        "n_nationkey",
        F.size("m").alias("m_size"),
        F.element_at("m", "name").alias("name"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
    )


SQL_MAP_FNS = """
SELECT n_nationkey,
       CAST(3 AS INT) AS m_size,
       n_name AS name,
       'kind,name,region' AS keys_sorted
FROM nation
"""


def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash Bernoulli sampling: keep a row iff an md5 bucket of
    its business key lands under the rate. Unlike seeded sample(),
    the subset is a pure function of the DATA — re-runs, engine
    versions, and partitioning changes all agree (and so does the
    DuckDB oracle, which is why this is hash-checked rather than
    rows-only). This is the reproducible-split idiom a training
    pipeline needs: the same row set at any scale, no coordination.
    Map-side only — the predicate evaluates in the scan stage, zero
    exchanges."""
    li = load_table(spark, sf_dir, "lineitem")
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    bucket = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int") % 10
    return li.where(bucket == 0).select("l_orderkey", "l_linenumber")


SQL_SAMPLE_DETERMINISTIC = """
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE CAST(concat('0x', substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 4)) AS INT) % 10 = 0
"""


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile of orders: per-column null count,
    exact NDV, and formatted min/max — the statistics a cost-based
    optimizer (or a data-quality monitor) collects. Numeric min/max
    are emitted in exact units (cents for money, yyyy-MM-dd for
    dates) so the oracle agrees bit-for-bit.

    Scale: ONE union branch per column, each a single-column
    column-pruned parquet scan feeding a global agg with exactly one
    count-distinct — no Expand multiplication (a single agg with six
    count-distincts would replicate every scan row 6x into the
    shuffle). Each branch's distinct partial-aggregates map-side, so
    per-branch shuffle volume is NDV-sized, not row-sized."""
    o = load_table(spark, sf_dir, "orders")

    def branch(col: str, mn, mx) -> DataFrame:
        return o.agg(
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("ndv"),
            mn.alias("min_str"),
            mx.alias("max_str"),
        ).select(F.lit(col).alias("col_name"), "*")

    def s(col):  # plain string-cast bounds
        return F.min(col).cast("string"), F.max(col).cast("string")

    cents = F.floor(F.col("o_totalprice") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    day = F.date_format("o_orderdate", "yyyy-MM-dd")
    branches = [
        branch("o_orderkey", *s("o_orderkey")),
        branch("o_custkey", *s("o_custkey")),
        branch("o_orderstatus", *s("o_orderstatus")),
        branch(
            "o_totalprice",
            F.min(cents).cast("string"),
            F.max(cents).cast("string"),
        ),
        branch("o_orderdate", F.min(day), F.max(day)),
        branch("o_orderpriority", *s("o_orderpriority")),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def _profile_branch_sql(col: str, mn: str, mx: str) -> str:
    return (
        f"SELECT '{col}' AS col_name,"
        f" CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,"
        f" CAST(count(DISTINCT {col}) AS BIGINT) AS ndv,"
        f" {mn} AS min_str, {mx} AS max_str FROM orders"
    )


SQL_TABLE_PROFILE = " UNION ALL ".join(
    [
        _profile_branch_sql(
            "o_orderkey",
            "CAST(min(o_orderkey) AS VARCHAR)",
            "CAST(max(o_orderkey) AS VARCHAR)",
        ),
        _profile_branch_sql(
            "o_custkey",
            "CAST(min(o_custkey) AS VARCHAR)",
            "CAST(max(o_custkey) AS VARCHAR)",
        ),
        _profile_branch_sql(
            "o_orderstatus", "min(o_orderstatus)", "max(o_orderstatus)"
        ),
        _profile_branch_sql(
            "o_totalprice",
            "CAST(min(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS VARCHAR)",
            "CAST(max(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS VARCHAR)",
        ),
        _profile_branch_sql(
            "o_orderdate",
            "strftime(min(o_orderdate), '%Y-%m-%d')",
            "strftime(max(o_orderdate), '%Y-%m-%d')",
        ),
        _profile_branch_sql(
            "o_orderpriority", "min(o_orderpriority)", "max(o_orderpriority)"
        ),
    ]
)


SQL_JSON = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
"""


def q_udtf_explode_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """one row -> many (explode ≙ unnest)."""
    d = load_table(spark, sf_dir, "documents")
    return d.where(F.col("doc_id") < 50).select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


SQL_EXPLODE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents WHERE doc_id < 50
"""


def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of each customer's account balance
    WITHIN its nation — the relative-standing window pair. Partitioned
    by nation key, so every partition's window runs parallel (the
    scale-safe window shape; only UNpartitioned windows serialize).
    Both engines compute (rank-1)/(n-1) and rank/n from identical
    integers, so the doubles are bit-identical; rounded 6dp anyway per
    the float discipline."""
    c = load_table(spark, sf_dir, "customer")
    acct_c = F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5)).cast(
        "bigint"
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        acct_c.alias("acctbal_c"),
        fround(F.percent_rank().over(w), 6).alias("pct_rank"),
        fround(F.cume_dist().over(w), 6).alias("cume"),
    )


SQL_PERCENT_RANK = """
SELECT c_custkey, c_nationkey,
       CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT) AS acctbal_c,
       floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
       floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent ship mode per
    order status, ties broken by mode value ascending (built-in mode()
    leaves ties undefined — useless for a differential check, so the
    operator is count + windowed top-1 with an explicit total order).
    Scale: the count partial-aggregates map-side; the window runs over
    the tiny (status, priority) aggregate, partitioned by status."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
    )


SQL_MODE_PER_GROUP = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
            ORDER BY cnt DESC, o_orderpriority) AS rn
  FROM c
) WHERE rn = 1
"""


def q_regr_fit_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares line (slope + intercept) of event value
    on the user bucket — regr_slope/regr_intercept parity, composed
    from EXACT BIGINT moments with only the final divisions in double
    (the corr_exact_moments discipline: a built-in regr_* would sum
    doubles in partition order and drift in the last ulp)."""
    e = load_table(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(100)).cast("bigint")
    y = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return m.select(
        "event_type",
        "n",
        fround(slope, 6).alias("slope_c_per_bucket"),
        fround(intercept, 6).alias("intercept_c"),
    )


SQL_REGR_FIT = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM (
    SELECT event_type,
           CAST(user_id % 100 AS BIGINT) AS x,
           CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS y
    FROM events
  )
  GROUP BY event_type
)
SELECT event_type, n,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS slope_c_per_bucket,
       floor((CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS intercept_c
FROM m
"""


def q_purchase_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap statistics per customer: max / total gap in
    days and gap count between consecutive orders (lag over the
    per-customer order sequence). The churn-signal feature every CRM
    mart derives. Window is PARTITIONED by custkey — parallel across
    customers — and all outputs are exact integers (day differences),
    no float discipline needed. Customers with one order drop out
    (no gaps), matching the oracle's HAVING."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_d"),
    ).where(F.col("gap_d").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.max("gap_d").cast("int").alias("max_gap_d"),
        F.sum("gap_d").cast("bigint").alias("sum_gap_d"),
        F.count(F.lit(1)).alias("n_gaps"),
    )


SQL_PURCHASE_GAPS = """
WITH g AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE)
           - lag(CAST(o_orderdate AS DATE))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS gap_d
  FROM orders
)
SELECT o_custkey,
       CAST(max(gap_d) AS INT) AS max_gap_d,
       CAST(sum(gap_d) AS BIGINT) AS sum_gap_d,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM g WHERE gap_d IS NOT NULL
GROUP BY o_custkey
"""


def q_quartile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-group quartile assignment: each customer's balance
    quartile inside its nation. This is the ntile shape that IS
    scale-safe as a plain window — the partition key bounds every
    task's sort to one nation — in deliberate contrast to the GLOBAL
    ntiles (quality_bin_sample, rfm_segmentation) which must use
    distributed_ntile. Tiebreak pinned on custkey."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5))
        .cast("bigint")
        .alias("acctbal_c"),
        F.ntile(4).over(w).alias("balance_quartile"),
    )


def q_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist within group (r10) — the last SQL window-distribution
    function the surface lacked (percent_rank, ntile, nth_value,
    lag/lead, rank-topk all exist): each customer's cumulative balance
    distribution inside its nation, P(X <= x). Ties share one value on
    both engines (cume_dist is value-determined — count of rows with
    value <= current over N — so no tie-break ordering is needed for
    determinism); the count ratio is the same small-integer division
    in IEEE on both engines, rounded 6dp out of discipline.

    Scale: the nation key bounds every task's sort (the
    quartile_by_group argument); one exchange, no global frame."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.asc("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5))
        .cast("bigint")
        .alias("acctbal_c"),
        fround(F.cume_dist().over(w), 6).alias("bal_cume"),
    )


SQL_WINDOW_CUME_DIST = f"""
SELECT c_custkey, c_nationkey,
       CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT) AS acctbal_c,
       {sql_fround('''cume_dist() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal)''', 6)}
         AS bal_cume
FROM customer
"""


SQL_QUARTILE_BY_GROUP = """
SELECT c_custkey, c_nationkey,
       CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT) AS acctbal_c,
       CAST(ntile(4) OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal, c_custkey) AS INT) AS balance_quartile
FROM customer
"""


_STREAK_EPOCH = "2024-01-01"


def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands per user: longest run of consecutive active
    days, streak count, and total active days — the engagement metric
    every product-analytics stack computes (generalizes the reference's
    incremental-skip bookkeeping, test.py:155, into activity history).

    Scale: the classic SQL islands idiom (row_number difference, which
    the oracle uses) needs a per-user ordered window AFTER a distinct —
    two exchanges. Here the distinct day set folds into ONE user_id
    exchange (collect_set partial-aggregates map-side) and the
    runs are computed inside the sorted per-user array with higher-
    order functions: a break is a position whose day != prev+1, and the
    longest run is a single fold carrying (current_run, best, prev) —
    per-user state is bounded by the calendar (<= days in the ingest
    window), never by event volume."""
    e = load_table(spark, sf_dir, "events")
    day_idx = F.datediff(F.to_date("ts"), F.lit(_STREAK_EPOCH).cast("date"))
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_set(day_idx)).alias("days")
    )
    a = F.col("days")
    breaks = F.size(
        F.filter(
            # i is 0-based; element_at is 1-based, so element_at(a, i)
            # is the PREVIOUS element when visiting index i
            F.transform(
                a,
                # explicit guard: element_at is only constructed under the
                # i > 0 branch so no rewrite/reordering can evaluate
                # element_at(a, 0) (ANSI INVALID_INDEX_OF_ZERO)
                lambda x, i: F.when(
                    i > 0,
                    F.when(x != F.element_at(a, i) + 1, F.lit(1)).otherwise(F.lit(0)),
                ).otherwise(F.lit(0)),
            ),
            lambda v: v == 1,
        )
    )

    def _step(acc, x):
        run = F.when(x == acc.prev + 1, acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
            x.alias("prev"),
        )

    longest = F.aggregate(
        a,
        F.struct(
            F.lit(0).alias("run"), F.lit(0).alias("best"), F.lit(-(10**6)).alias("prev")
        ),
        _step,
        lambda acc: acc.best,
    )
    return per_user.select(
        "user_id",
        F.size(a).cast("int").alias("n_active_days"),
        (breaks + 1).cast("int").alias("n_streaks"),
        longest.cast("int").alias("max_streak_d"),
    )


SQL_ACTIVITY_STREAKS = f"""
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
i AS (
  SELECT user_id, day,
         CAST(day - DATE '{_STREAK_EPOCH}' AS INT)
           - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                  AS INT) AS grp
  FROM d
),
runs AS (
  SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(len) AS INT) AS n_active_days,
       CAST(count(*) AS INT) AS n_streaks,
       CAST(max(len) AS INT) AS max_streak_d
FROM runs GROUP BY user_id
"""


def q_subquery_not_in_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under NULLs — the SQL-semantics trap every
    engine must honor: one NULL in the subquery result makes
    `x NOT IN (...)` UNKNOWN for every non-matching row, so the count
    collapses to 0, while NOT EXISTS (and NOT IN over the null-free
    set) keeps the expected rows. Catalyst plans the NOT IN as a
    null-aware anti join; all three counts run through spark.sql so
    the decorrelation is the engine's own.

    The probe set derives NULLs deterministically (every 97th BUILDING
    customer key) since the fixtures are null-free by construction."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("nin_orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("nin_customer_v")
    return spark.sql(_NOT_IN_BODY.format(orders="nin_orders_v", customer="nin_customer_v"))


_NOT_IN_BODY = """
WITH probe AS (
  SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k
  FROM {customer} WHERE c_mktsegment = 'BUILDING'
)
SELECT
  (SELECT count(*) FROM {orders}
   WHERE o_custkey NOT IN (SELECT k FROM probe)) AS cnt_not_in,
  (SELECT count(*) FROM {orders} o
   WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
    AS cnt_not_exists,
  (SELECT count(*) FROM {orders}
   WHERE o_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL))
    AS cnt_not_in_nullfree
"""

SQL_NOT_IN_NULLAWARE = _NOT_IN_BODY.format(orders="orders", customer="customer")


def q_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicitly pinned
    full frame — the frame-boundary trap: the SQL default frame (RANGE
    UNBOUNDED PRECEDING .. CURRENT ROW) silently makes last_value mean
    "current row", so both engines pin ROWS BETWEEN UNBOUNDED
    PRECEDING AND UNBOUNDED FOLLOWING. Partitioned by nation — runs
    parallel per partition, never a global sort."""
    c = load_table(spark, sf_dir, "customer")
    bal_c = F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        bal_c.alias("bal_c"),
        F.first("c_name").over(w).alias("richest_name"),
        F.nth_value(bal_c, 3).over(w).alias("third_bal_c"),
        F.last(bal_c).over(w).alias("poorest_bal_c"),
    )


SQL_WINDOW_NTH_VALUE = """
SELECT c_custkey, c_nationkey,
       CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT) AS bal_c,
       first_value(c_name) OVER w AS richest_name,
       nth_value(CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT), 3) OVER w
         AS third_bal_c,
       last_value(CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT)) OVER w
         AS poorest_bal_c
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_fill_forward_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over a per-type daily spine:
    days with no events inherit the most recent observed daily total
    (the metric-dashboard fill mode, complementing date_spine_gapfill's
    zero fill). The spine is generated per type from global bounds —
    never collected; the fill is last(... ignorenulls) over a
    type-partitioned ordered window (calendar-bounded frame).

    filled_c is NULL (not 0) before a type's first observation — the
    honest LOCF contract, pinned on both engines."""
    e = load_table(spark, sf_dir, "events")
    v_c = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(v_c).alias("day_c")
    )
    bounds = e.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("day_c"),
            F.last("day_c", ignorenulls=True).over(w).alias("filled_c"),
        )
    )


SQL_FILL_FORWARD = """
WITH b AS (SELECT CAST(min(ts) AS DATE) lo, CAST(max(ts) AS DATE) hi
           FROM events),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                      AS DATE) AS d FROM b),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
           AS day_c
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, strftime(s.d, '%Y-%m-%d') AS day, daily.day_c,
       last_value(daily.day_c IGNORE NULLS) OVER (
         PARTITION BY t.event_type ORDER BY s.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c
FROM types t CROSS JOIN spine s
LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = s.d
"""


def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact expanding distinct-user count per day (cumulative
    audience). A naive COUNT(DISTINCT) OVER (ORDER BY day) carries the
    full user set through every window frame; the scale-safe rewrite:
    a user contributes exactly once, on their FIRST day — so the
    running distinct is the prefix sum of first-seen counts. One
    user_id aggregation exchange + a calendar-bounded cumsum; the
    trailing-window twin that cannot be rewritten this way is
    rolling_distinct_users (HLL sketches, rows-only)."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    per_day = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    # every ACTIVE day gets a row (new_users = 0 when nobody debuts),
    # so the cumulative series has no holes on days with traffic
    active_days = e.select(F.to_date("ts").alias("d")).distinct()
    full = active_days.join(per_day, "d", "left").select(
        "d", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return full.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


SQL_CUMULATIVE_DISTINCT = """
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
),
per_day AS (
  SELECT d, CAST(count(*) AS BIGINT) AS new_users FROM first_seen GROUP BY d
),
active AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
filled AS (
  SELECT active.d, coalesce(per_day.new_users, 0) AS new_users
  FROM active LEFT JOIN per_day ON active.d = per_day.d
)
SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
       CAST(sum(new_users) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM filled
"""


def q_top_decile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top spenders: customers at or above their nation's
    90th-percentile balance. The per-group threshold is a tiny
    nation-sized aggregate broadcast back onto the unshuffled customer
    scan — the grouped twin of winsorize_values' global bounds.
    Percentiles interpolate over already-integer cents so both engines
    see identical inputs; the floor(+0.5) snap pins the boundary."""
    c = load_table(spark, sf_dir, "customer")
    bal_c = F.floor(F.col("c_acctbal") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    thr = c.groupBy("c_nationkey").agg(
        F.floor(F.percentile(bal_c, 0.9) + F.lit(0.5)).cast("bigint").alias("p90_c")
    )
    return (
        c.select("c_custkey", "c_nationkey", bal_c.alias("bal_c"))
        .join(F.broadcast(thr), "c_nationkey")
        .where(F.col("bal_c") >= F.col("p90_c"))
        .select("c_custkey", "c_nationkey", "bal_c", "p90_c")
    )


SQL_TOP_DECILE_BY_GROUP = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT) AS bal_c
  FROM customer
),
thr AS (
  SELECT c_nationkey,
         CAST(floor(quantile_cont(bal_c, 0.9) + 0.5) AS BIGINT) AS p90_c
  FROM c GROUP BY c_nationkey
)
SELECT c.c_custkey, c.c_nationkey, c.bal_c, thr.p90_c
FROM c JOIN thr ON c.c_nationkey = thr.c_nationkey
WHERE c.bal_c >= thr.p90_c
"""


def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) candlestick rollup per event type and
    hour — the time-series summary every metrics store materializes.
    Open/close are min_by/max_by over a TOTAL order key (zero-padded
    epoch-micros || event_id string — two events can share a
    microsecond, the composite cannot collide), so the result is
    deterministic and engine-independent; high/low/volume are plain
    min/max/count over exact cents. ONE (type, hour) aggregation
    exchange, all partials map-side."""
    e = load_table(spark, sf_dir, "events")
    v_c = F.floor(F.col("value") * F.lit(1e2) + F.lit(0.5)).cast("bigint")
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
            v_c.alias("v_c"),
            ord_key.alias("ok"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.min_by("v_c", F.col("ok")).alias("open_c"),
            F.max("v_c").alias("high_c"),
            F.min("v_c").alias("low_c"),
            F.max_by("v_c", F.col("ok")).alias("close_c"),
            F.count(F.lit(1)).alias("volume"),
        )
    )


SQL_EVENTS_OHLC = """
WITH c AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         event_type,
         CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS v_c,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok
  FROM events
)
SELECT event_type, hour,
       arg_min(v_c, ok) AS open_c,
       CAST(max(v_c) AS BIGINT) AS high_c,
       CAST(min(v_c) AS BIGINT) AS low_c,
       arg_max(v_c, ok) AS close_c,
       CAST(count(*) AS BIGINT) AS volume
FROM c GROUP BY event_type, hour
ORDER BY event_type, hour
"""


SKEW_TOP_K = 10


def q_skew_diagnose_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the heaviest keys of a fact join
    column with their row share and hot-factor (multiple of the mean
    key load, in basis points) — the report that decides whether a
    join needs salting or AQE skew handling BEFORE it runs at 100 TB.
    One map-side-combined key aggregation + TakeOrdered; the key-count
    and total scalars ride along in broadcast (no second fact pass).

    Arithmetic bound: hot_bp's cross product 10000*cnt*n_keys stays in
    BIGINT while cnt*n_keys <= ~9e14 (ANSI mode fails loudly, never
    wraps) — comfortably above any real diagnostic (1e12-row fact with
    1e6 keys and 100x skew is ~1e12)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    totals = per_key.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        per_key.orderBy(F.desc("cnt"), "l_suppkey")
        .limit(SKEW_TOP_K)
        .join(F.broadcast(totals))
        .select(
            "l_suppkey",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("int((10000 * cnt) div total)").alias("share_bp"),
            F.expr("int((10000 * cnt * n_keys) div total)").alias("hot_bp"),
        )
    )


SQL_SKEW_DIAGNOSE = f"""
WITH per_key AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_keys FROM per_key)
SELECT l_suppkey, cnt,
       CAST((10000 * cnt) // total AS INT) AS share_bp,
       CAST((10000 * cnt * n_keys) // total AS INT) AS hot_bp
FROM (SELECT * FROM per_key ORDER BY cnt DESC, l_suppkey LIMIT {SKEW_TOP_K})
CROSS JOIN t
"""


SPECS = [
    QuerySpec("project_columns", q_project_columns, SQL_PROJECT),
    QuerySpec("fill_forward_locf", q_fill_forward_locf, SQL_FILL_FORWARD),
    QuerySpec("skew_diagnose_report", q_skew_diagnose_report, SQL_SKEW_DIAGNOSE),
    QuerySpec(
        "cumulative_distinct_users",
        q_cumulative_distinct_users,
        SQL_CUMULATIVE_DISTINCT,
    ),
    QuerySpec("top_decile_by_group", q_top_decile_by_group, SQL_TOP_DECILE_BY_GROUP),
    QuerySpec("events_ohlc_hourly", q_events_ohlc_hourly, SQL_EVENTS_OHLC),
    QuerySpec("filter_predicate", q_filter_predicate, SQL_FILTER),
    QuerySpec("clean_trim_replace", q_clean_trim_replace, SQL_CLEAN),
    QuerySpec("conditional_encode", q_conditional_encode, SQL_ENCODE),
    QuerySpec("split_extract", q_split_extract, SQL_SPLIT),
    QuerySpec("array_join_ws", q_array_join_ws, SQL_ARRAY_JOIN),
    QuerySpec("kv_lookup", q_kv_lookup, SQL_KV_LOOKUP),
    QuerySpec("map_build", q_map_build, SQL_MAP_BUILD),
    QuerySpec("nested_struct", q_nested_struct, SQL_NESTED),
    QuerySpec("parse_date_cn", q_parse_date_cn, SQL_PARSE_DATE),
    QuerySpec("parse_range", q_parse_range, SQL_PARSE_RANGE),
    QuerySpec("agg_hash_group", q_agg_hash_group, SQL_Q1, bench=True),
    QuerySpec("agg_distinct", q_agg_distinct, SQL_DISTINCT),
    QuerySpec("agg_approx_distinct", q_agg_approx_distinct, None),
    QuerySpec("agg_hll_sketch_rollup", q_agg_hll_sketch_rollup, None),
    QuerySpec("rolling_distinct_users", q_rolling_distinct_users, None),
    # r10: the exact calendar-window anchor for the rolling-distinct
    # family (contribution fan-out, not a sketch)
    QuerySpec(
        "rolling_distinct_exact",
        q_rolling_distinct_exact,
        SQL_ROLLING_DISTINCT_EXACT,
    ),
    QuerySpec("agg_rollup", q_agg_rollup, SQL_ROLLUP),
    QuerySpec("agg_grouping_sets", q_agg_grouping_sets, SQL_GROUPING_SETS),
    QuerySpec("agg_cube", q_agg_cube, SQL_CUBE),
    QuerySpec("agg_pivot", q_agg_pivot, SQL_PIVOT),
    QuerySpec("agg_stats", q_agg_stats, SQL_STATS),
    QuerySpec("agg_percentile", q_agg_percentile, SQL_PERCENTILE),
    QuerySpec("agg_heavy_hitters", q_agg_heavy_hitters, SQL_HEAVY_HITTERS),
    QuerySpec("agg_approx_percentile", q_agg_approx_percentile, None),
    QuerySpec("agg_map_distribution", q_agg_map_distribution, SQL_MAP_DIST, bench=True),
    QuerySpec("window_rank_topk", q_window_rank_topk, SQL_TOPK, bench=True),
    QuerySpec("window_lag_lead", q_window_lag_lead, SQL_LAG),
    QuerySpec("sessionize_events", q_sessionize_events, SQL_SESSIONIZE),
    QuerySpec("window_rolling", q_window_rolling, SQL_ROLLING),
    QuerySpec("window_range_time", q_window_range_time, SQL_WINDOW_RANGE_TIME),
    QuerySpec("funnel_conversion", q_funnel_conversion, SQL_FUNNEL),
    QuerySpec("events_anomaly_zscore", q_events_anomaly_zscore, SQL_EVENTS_ANOMALY),
    QuerySpec("window_analytics", q_window_analytics, SQL_WINDOW_ANALYTICS),
    QuerySpec("date_spine_gapfill", q_date_spine_gapfill, SQL_DATE_SPINE),
    QuerySpec("sort_limit", q_sort_limit, SQL_SORT_LIMIT),
    QuerySpec("set_union_dedup", q_set_union_dedup, SQL_UNION_DEDUP),
    QuerySpec("set_intersect", q_set_intersect, SQL_INTERSECT),
    QuerySpec("set_except", q_set_except, SQL_EXCEPT),
    QuerySpec("set_upsert_merge", q_set_upsert_merge, SQL_UPSERT_MERGE),
    QuerySpec("quality_gate", q_quality_gate, SQL_QUALITY),
    QuerySpec("scalar_string_fns", q_scalar_string_fns, SQL_STRING_FNS),
    QuerySpec("scalar_date_fns", q_scalar_date_fns, SQL_DATE_FNS),
    QuerySpec("scalar_math_fns", q_scalar_math_fns, SQL_MATH_FNS),
    QuerySpec("json_extract", q_json_extract, SQL_JSON),
    QuerySpec("json_variant", q_json_variant, SQL_JSON_VARIANT),
    QuerySpec("unpivot", q_unpivot, SQL_UNPIVOT),
    QuerySpec("subquery_exists", q_subquery_exists, SQL_SUBQUERY_EXISTS),
    QuerySpec("subquery_scalar", q_subquery_scalar, SQL_SUBQUERY_SCALAR),
    QuerySpec("hof_array_fns", q_hof_array_fns, SQL_HOF),
    QuerySpec("map_fns", q_map_fns, SQL_MAP_FNS),
    QuerySpec(
        "sample_deterministic", q_sample_deterministic, SQL_SAMPLE_DETERMINISTIC
    ),
    QuerySpec("table_profile", q_table_profile, SQL_TABLE_PROFILE),
    QuerySpec("text_normalize", q_text_normalize, SQL_TEXT_NORMALIZE),
    QuerySpec("winsorize_values", q_winsorize_values, SQL_WINSORIZE),
    QuerySpec("agg_string_concat", q_agg_string_concat, SQL_STRING_CONCAT),
    QuerySpec("agg_filtered", q_agg_filtered, SQL_AGG_FILTERED),
    QuerySpec("agg_min_max_by", q_agg_min_max_by, SQL_MIN_MAX_BY),
    QuerySpec("mom_revenue_growth", q_mom_revenue_growth, SQL_MOM_GROWTH),
    QuerySpec("value_histogram", q_value_histogram, SQL_VALUE_HISTOGRAM),
    QuerySpec("corr_exact_moments", q_corr_exact_moments, SQL_CORR_MOMENTS),
    QuerySpec("cdc_merge_changelog", q_cdc_merge_changelog, SQL_CDC_MERGE),
    QuerySpec("join_lateral_topn", q_join_lateral_topn, SQL_LATERAL_TOPN),
    QuerySpec("udtf_explode_kv", q_udtf_explode_kv, SQL_EXPLODE),
    QuerySpec("window_percent_rank", q_window_percent_rank, SQL_PERCENT_RANK),
    QuerySpec("mode_per_group", q_mode_per_group, SQL_MODE_PER_GROUP),
    QuerySpec("regr_fit_moments", q_regr_fit_moments, SQL_REGR_FIT),
    QuerySpec("purchase_gap_stats", q_purchase_gap_stats, SQL_PURCHASE_GAPS),
    QuerySpec("quartile_by_group", q_quartile_by_group, SQL_QUARTILE_BY_GROUP),
    # r10: cume_dist — the last window-distribution function
    QuerySpec("window_cume_dist", q_window_cume_dist, SQL_WINDOW_CUME_DIST),
    QuerySpec("activity_streaks", q_activity_streaks, SQL_ACTIVITY_STREAKS),
    QuerySpec(
        "subquery_not_in_nullaware", q_subquery_not_in_nullaware, SQL_NOT_IN_NULLAWARE
    ),
    QuerySpec("window_nth_value", q_window_nth_value, SQL_WINDOW_NTH_VALUE),
]
