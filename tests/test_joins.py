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
