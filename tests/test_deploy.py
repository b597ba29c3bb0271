"""Deployment entry point (deploy.py): one cron tick == run_once +
dual K1/K3 sinks + run_history ledger row — the containerized parity
of the reference's Dockerfile:22 scheduler process. The end-to-end
path including session bootstrap is deploy/smoke.sh."""

from __future__ import annotations

import glob


def test_run_tick_writes_dual_sinks_and_ledger(spark, sf_dir, tmp_path):
    from etl_dagster_service_crawler_spark.deploy import DEFAULT_JOB, run_tick
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    spark.sql(f"DROP TABLE IF EXISTS {RUN_HISTORY_TABLE}")
    try:
        ok = run_tick(spark, DEFAULT_JOB, sf_dir, out, ["doc_id"])
        assert ok
        assert glob.glob(f"{out}/main/*.parquet")
        assert glob.glob(f"{out}/side/*.parquet")
        side = spark.read.parquet(f"{out}/side")
        assert side.columns == ["doc_id"]
        ledger = spark.sql(
            f"SELECT job, status FROM {RUN_HISTORY_TABLE}"
        ).collect()
        assert len(ledger) == 1
        assert ledger[0]["job"] == DEFAULT_JOB
        assert ledger[0]["status"] == "ok"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {RUN_HISTORY_TABLE}")


def test_append_job_ticks_do_not_duplicate(spark, sf_dir, tmp_path):
    """Two deploy ticks of the APPEND-mode events job: the second tick
    must process nothing new (checkpointed resume), so the main sink
    holds each event exactly once — the duplicate-ingest trap of
    running availableNow without a checkpoint."""
    from etl_dagster_service_crawler_spark.deploy import run_tick
    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.jobs import (
        RUN_HISTORY_TABLE,
    )

    out = str(tmp_path / "out")
    spark.sql(f"DROP TABLE IF EXISTS {RUN_HISTORY_TABLE}")
    try:
        run_tick(spark, "events_ingest_2min", sf_dir, out, ["event_id"])
        run_tick(spark, "events_ingest_2min", sf_dir, out, ["event_id"])
        n_events = load_table(spark, sf_dir, "events").count()
        got = spark.read.parquet(f"{out}/main")
        assert got.count() == n_events  # no duplicates across ticks
        ledger = spark.sql(
            f"SELECT n_rows FROM {RUN_HISTORY_TABLE} ORDER BY started_at"
        ).collect()
        assert len(ledger) == 2
        assert ledger[0]["n_rows"] == n_events
        assert ledger[1]["n_rows"] == 0  # second tick found nothing new
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {RUN_HISTORY_TABLE}")
