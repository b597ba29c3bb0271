"""Property-based tests (SURVEY §5): roundtrip and null-safety
invariants of the scalar parse/lookup functions, driven by Hypothesis
through one shared SparkSession on tiny single-column frames."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.functions.cleaning import (
    clean_tokens,
    extract_url_key,
    parse_range,
)

_slow = settings(
    max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@_slow
@given(lo=st.integers(0, 10**6), hi=st.integers(0, 10**6))
def test_parse_range_roundtrips_ints(spark, lo, hi):
    df = spark.createDataFrame([Row(s=f"{lo}~{hi}")])
    plo, phi = parse_range(F.col("s"))
    row = df.select(plo.alias("lo"), phi.alias("hi")).first()
    assert (row["lo"], row["hi"]) == (lo, hi)


@_slow
@given(
    snap=st.dictionaries(st.integers(0, 30), st.integers(-100, 100), max_size=12),
    upd=st.dictionaries(st.integers(0, 30), st.integers(-100, 100), max_size=12),
)
def test_upsert_merge_is_dict_merge(spark, snap, upd):
    """upsert_merge(snapshot, updates) must equal Python's
    {**snap, **upd}: snapshot-only keys survive, overlaps take the
    update, update-only keys insert."""
    from etl_dagster_service_crawler_spark.operators.joins import upsert_merge

    schema = "k int, v int"
    sdf = spark.createDataFrame(list(snap.items()) or [], schema)
    udf_ = spark.createDataFrame(list(upd.items()) or [], schema)
    got = {r["k"]: r["v"] for r in upsert_merge(sdf, udf_, "k", ["v"]).collect()}
    assert got == {**snap, **upd}


@_slow
@given(s=st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40))
def test_parse_range_never_raises_on_garbage(spark, s):
    df = spark.createDataFrame([Row(s=s)])
    plo, phi = parse_range(F.col("s"))
    df.select(plo.alias("lo"), phi.alias("hi")).collect()  # must not raise


@_slow
@given(
    key=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1,
        max_size=20,
    ),
    query=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd")), max_size=10
    ),
)
def test_extract_url_key_inverts_url_build(spark, key, query):
    url = f"https://example.com/job/{key}" + (f"?{query}" if query else "")
    row = spark.createDataFrame([Row(u=url)]).select(
        extract_url_key(F.col("u")).alias("k")
    ).first()
    assert row["k"] == key


@_slow
@given(
    body=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Zs")), max_size=40
    )
)
def test_clean_tokens_strips_all_occurrences(spark, body):
    noisy = f"更新 {body} 更新"
    row = spark.createDataFrame([Row(s=noisy)]).select(
        clean_tokens(F.col("s"), ["更新"]).alias("c")
    ).first()
    assert "更新" not in row["c"]
    assert row["c"] == row["c"].strip()


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                      # user bucket
            st.integers(0, 6 * 3600),               # seconds offset
            st.sampled_from(["click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_stream_tumbling_equals_batch(spark, rows):
    """Batch-stream equivalence: an availableNow complete-mode drain of
    the windowed agg must equal the same plan run in batch."""
    import datetime as dt

    from etl_dagster_service_crawler_spark.streaming.ingest import run_available_now
    from etl_dagster_service_crawler_spark.streaming.windows import tumbling_counts

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(seconds=off), u, et, float(i))
        for i, (u, off, et) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    batch = {tuple(r) for r in tumbling_counts(df).collect()}

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(d)
        s = spark.readStream.schema(df.schema).parquet(d)
        streamed = {tuple(r) for r in run_available_now(tumbling_counts(s), "complete").collect()}
    assert streamed == batch


def test_money_sums_invariant_under_partitioning(spark, sf_dir):
    """The r01 driver hash-miss class: a double sum's last ulp depends
    on partition layout, so fround could land either side of a cent
    boundary. The decimal-sum formulation must yield bit-identical
    results under any shuffle partitioning."""
    from etl_dagster_service_crawler_spark.plans.flagship import revenue_by_nation
    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_agg_hash_group,
    )

    def run(q):
        return sorted(map(tuple, q(spark, sf_dir).collect()))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        flag2, q1_2 = run(revenue_by_nation), run(q_agg_hash_group)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        flag29, q1_29 = run(revenue_by_nation), run(q_agg_hash_group)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert flag2 == flag29
    assert q1_2 == q1_29


def test_clean_tokens_treats_metacharacters_as_literals(spark):
    """ADVICE r01: tokens like 'C++' or '0~5?' must strip as literals,
    not corrupt output as regex patterns."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(s="skill C++ and (人) and 0~5? left")])
    out = df.select(
        clean_tokens(F.col("s"), ["C++", "(人)", "0~5?"]).alias("c")
    ).first()["c"]
    assert "C++" not in out and "(人)" not in out and "0~5?" not in out
    assert out.startswith("skill") and out.endswith("left")
