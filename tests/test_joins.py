from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.operators.joins import asof_join


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", dt.datetime(2024, 1, 5)),
            (2, "k1", dt.datetime(2024, 1, 10)),
            (3, "k1", dt.datetime(2024, 1, 1)),   # before any right row
            (4, "k2", dt.datetime(2024, 1, 7)),
        ],
        "eid bigint, key string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", dt.datetime(2024, 1, 5), 100),   # same instant as eid=1
            ("k1", dt.datetime(2024, 1, 8), 200),
            ("k2", dt.datetime(2024, 1, 6), 300),
        ],
        "key string, rt timestamp, val int",
    )
    out = {
        r.eid: r.val
        for r in asof_join(
            left, right, "key", "key", "t", "rt", ["val"]
        ).collect()
    }
    assert out == {1: 100, 2: 200, 3: None, 4: 300}


def test_scd2_version_invariants(spark, sf_dir):
    """Every key has exactly ONE current row; changed keys (custkey %
    7 == 0) carry exactly two versions with abutting validity and a
    +100.00 balance step; unchanged keys carry one open version."""
    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (
        SCD2_EFFECTIVE,
        SCD2_OPEN_END,
        q_scd2_customer_history,
    )

    rows = q_scd2_customer_history(spark, sf_dir).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["c_custkey"], []).append(r)
    assert by_key
    for key, vs in by_key.items():
        current = [v for v in vs if v["is_current"]]
        assert len(current) == 1
        assert current[0]["valid_to"] == SCD2_OPEN_END
        if key % 7 == 0:
            assert len(vs) == 2
            closed = next(v for v in vs if not v["is_current"])
            assert closed["valid_to"] == SCD2_EFFECTIVE == current[0]["valid_from"]
            assert current[0]["bal_cents"] - closed["bal_cents"] == 10000
        else:
            assert len(vs) == 1
