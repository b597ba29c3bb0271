from __future__ import annotations

import duckdb

from etl_dagster_service_crawler_spark.io.tables import TABLES, load_table
from etl_dagster_service_crawler_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    revenue_by_nation,
)


def test_load_table_pins_schema(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.columns == [c for c, _ in TABLES[name]]


def test_flagship_matches_duckdb(spark, sf_dir):
    got = {
        (r["n_name"], r["revenue"])
        for r in revenue_by_nation(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = set(map(tuple, con.execute(FLAGSHIP_ORACLE_SQL).fetchall()))
    assert got == want
    assert len(got) > 0


def test_flagship_broadcasts_nation(spark, sf_dir):
    plan = revenue_by_nation(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
