"""Container/cluster entry point: the reference's runnable deployment
(`Dockerfile:22` starts dagster-webserver + daemon; `workspace.yaml:2-3`
loads definitions.py) re-expressed for Spark.

The reference's operational model is: a cron schedule (*/2 min,
definitions.py:32-37) launches one pipeline RUN per tick, logs the
returncode per run (definitions.py:20-25), and appends to the JSON +
relational sinks. This entry point reproduces exactly that shape:

  one tick == one `ScheduledPipeline.run_once` (availableNow catch-up
  of everything pending — also how a missed window recovers), followed
  by the dual K1+K3 sink write (main table + side projection, the
  reference's two output dirs test.py:577-580) and one `run_history`
  ledger row (the returncode log, as a SQL-queryable table).

Run modes:
  --once          single tick (CI smoke / backfill), then exit
  (default)       tick every --interval-seconds forever — the cron

Usage (container):
  docker build -t spark-graft .
  docker run -v /path/to/data:/data spark-graft --once

Usage (bare / spark-submit):
  python -m etl_dagster_service_crawler_spark.deploy \
      --source /root/testdata/sf0.001 --output /tmp/out --once
  spark-submit --master local[8] -m ... (any Spark master works: the
  session is built from SPARK_MASTER, default local[*])
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import SparkSession

from etl_dagster_service_crawler_spark.streaming.jobs import (
    RUN_HISTORY_TABLE,
    job_registry,
)

DEFAULT_JOB = "corpus_clean_2min"


def build_session(app_name: str = "spark-graft-deploy") -> SparkSession:
    """Deployment session: master from SPARK_MASTER (spark-submit
    overrides), warehouse from SPARK_WAREHOUSE so the run-history
    table persists across container restarts."""
    b = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", "local[*]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_SHUFFLE_PARTITIONS", "8"),
        )
        .config("spark.ui.enabled", "false")
    )
    wh = os.environ.get("SPARK_WAREHOUSE")
    if wh:
        b = b.config("spark.sql.warehouse.dir", wh)
    return b.getOrCreate()


def run_tick(
    spark: SparkSession,
    job_name: str,
    source: str,
    output: str,
    side_cols: list[str],
) -> bool:
    """One scheduled tick: run the job, append the dual sinks, ledger
    the outcome. Returns the run's ok flag."""
    from etl_dagster_service_crawler_spark.io.sinks import (
        dual_sink_parquet_foreach_batch,
    )

    job = job_registry()[job_name]
    job.ledger_table = RUN_HISTORY_TABLE
    # K1+K3 dual sink via foreachBatch: micro-batches land columnar
    # files EXECUTOR-side (the memory sink would collect every row
    # into driver memory — test-only). complete-mode rollups re-land
    # the full result each tick; append-mode pipelines accumulate.
    main = f"{output}/main"
    job.foreach_batch = dual_sink_parquet_foreach_batch(
        main,
        f"{output}/side",
        side_cols,
        mode="overwrite" if job.output_mode == "complete" else "append",
    )
    job.result_reader = lambda s: s.read.parquet(main)
    if job.output_mode != "complete":
        # append-mode ticks must resume from the last processed offset
        # or every tick re-appends the whole source (duplicates)
        job.checkpoint_dir = f"{output}/_checkpoints/{job_name}"
    status = job.run_once(spark, source)
    print(
        f"tick job={job_name} ok={status.ok} batches={status.n_batches} "
        f"rows={status.n_rows} bad={status.n_bad}",
        flush=True,
    )
    return status.ok


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--job", default=DEFAULT_JOB, choices=sorted(job_registry()))
    p.add_argument("--source", default=os.environ.get("DATA_DIR", "/data"))
    p.add_argument("--output", default=os.environ.get("OUTPUT_DIR", "/output"))
    p.add_argument("--side-cols", default="doc_id")
    p.add_argument("--once", action="store_true", help="single tick, then exit")
    p.add_argument(
        "--interval-seconds",
        type=float,
        default=120.0,  # the reference's */2-minute cron
    )
    p.add_argument("--max-ticks", type=int, default=0, help="0 = forever")
    args = p.parse_args(argv)
    side_cols = [c for c in args.side_cols.split(",") if c]

    spark = build_session()
    try:
        if args.once:
            ok = run_tick(spark, args.job, args.source, args.output, side_cols)
            return 0 if ok else 1
        ticks = 0
        while True:
            started = time.time()
            run_tick(spark, args.job, args.source, args.output, side_cols)
            ticks += 1
            if args.max_ticks and ticks >= args.max_ticks:
                return 0
            # cron-style fixed cadence: sleep out the remainder of the
            # window (a tick longer than the interval fires the next
            # one immediately — same as a missed cron tick catch-up)
            time.sleep(max(0.0, args.interval_seconds - (time.time() - started)))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
