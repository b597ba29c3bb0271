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


def test_cdc_merge_matches_python_recompute(spark, sf_dir):
    """Independent of the DuckDB oracle (which shares my SQL): replay
    the change log in plain Python dicts and compare the full final
    state."""
    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (  # noqa: F401
        q_scd2_customer_history,
    )
    from etl_dagster_service_crawler_spark.workloads.relational import (
        q_cdc_merge_changelog,
    )

    got = {
        r["key"]: (r["bal_c"], r["state"])
        for r in q_cdc_merge_changelog(spark, sf_dir).collect()
    }

    # exact floor(x*100+0.5) like the query
    import math

    snap = {
        r["c_custkey"]: int(math.floor(r["c_acctbal"] * 100 + 0.5))
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    last: dict[int, tuple[int, str, int]] = {}
    for r in load_table(spark, sf_dir, "orders").collect():
        k, seq = r["o_custkey"], r["o_orderkey"]
        op = "D" if seq % 13 == 0 else "U"
        bal = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        if k not in last or seq > last[k][0]:
            last[k] = (seq, op, bal)
    expect = {}
    for k, bal in snap.items():
        if k in last:
            seq, op, nb = last[k]
            if op == "U":
                expect[k] = (nb, "updated")
        else:
            expect[k] = (bal, "unchanged")
    for k, (seq, op, nb) in last.items():
        if k not in snap and op == "U":
            expect[k] = (nb, "updated")
    assert got == expect


def test_retention_matches_python_recompute(spark, sf_dir):
    """Weekly cohort retention recomputed with plain Python sets."""
    from collections import defaultdict
    from datetime import timedelta

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.workloads.analytics_wl import (
        q_retention_cohort_weekly,
    )

    got = {
        (r["cohort_week"], r["week_offset"]): r["active_users"]
        for r in q_retention_cohort_weekly(spark, sf_dir).collect()
    }

    weekly = defaultdict(set)
    for r in load_table(spark, sf_dir, "events").select("user_id", "ts").collect():
        d = r["ts"].date()
        monday = d - timedelta(days=d.weekday())
        weekly[r["user_id"]].add(monday)
    cells: dict[tuple[str, int], int] = defaultdict(int)
    for user, weeks in weekly.items():
        cohort = min(weeks)
        for w in weeks:
            cells[(cohort.strftime("%Y-%m-%d"), (w - cohort).days // 7)] += 1
    assert got == dict(cells)
