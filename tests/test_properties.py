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
