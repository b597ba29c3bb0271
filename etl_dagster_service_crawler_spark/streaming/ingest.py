"""Streaming sources + the availableNow->memory harness.

The reference's scheduled incremental crawl (definitions.py:32-37 cron
*/2min + test.py:151-170 scroll loop) maps to a file-source stream:
each micro-batch is "one scheduled run", rate control via
maxFilesPerTrigger replaces time.sleep politeness (test.py:135,178),
and the empty micro-batch replaces the no-new-rows early exit
(test.py:562-565).

For tests/driver checks we run with trigger(availableNow=True) into a
memory sink and hand back the materialized table — a streaming query's
batch-equivalent result (same plan Catalyst would run in batch).
"""

from __future__ import annotations

import hashlib
import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_memory_names = itertools.count()

def _events_raw_schema(ts_nanos: bool) -> T.StructType:
    # ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    # across fixture generations; a nanos file must be scanned as
    # epoch-nanos bigint (Spark has no nanos type), a micros file as NTZ.
    ts_type: T.DataType = T.LongType() if ts_nanos else T.TimestampNTZType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _events_ts_is_nanos(sf_dir: str) -> bool:
    import pyarrow.parquet as pq

    t = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    return str(t) == "timestamp[ns]"


def _stream_dir(sf_dir: str, name: str) -> str:
    """Spark's file source requires a DIRECTORY; the fixture is a single
    read-only file. Stage a symlink dir under /tmp (per sf_dir/table).

    lexists, not exists: exists() is False for a BROKEN symlink (e.g.
    the fixture dir was recreated), and os.symlink would then raise
    FileExistsError — a dangling link is unlinked and re-created."""
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    d = f"/tmp/spark_graft_streams/{tag}/{name}"
    os.makedirs(d, exist_ok=True)
    link = f"{d}/{name}.parquet"
    target = f"{sf_dir}/{name}.parquet"
    if os.path.lexists(link) and not os.path.exists(link):
        os.unlink(link)
    if not os.path.lexists(link):
        os.symlink(target, link)
    return d


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events fixture."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_nanos = _events_ts_is_nanos(sf_dir)
    reader = spark.readStream.schema(_events_raw_schema(ts_nanos))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(_stream_dir(sf_dir, "events"))
    if ts_nanos:
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # micros file: NTZ wall clock -> LTZ under the UTC session tz pinned
    # above (same instant) so windows/watermarks see one type either way.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_processing_time(
    stream_df: DataFrame,
    interval: str = "2 minutes",
    min_batches: int = 2,
    output_mode: str = "append",
    timeout_s: int = 300,
) -> DataFrame:
    """Run a stream on a wall-clock ProcessingTime trigger — the
    production shape of the reference's */2min cron (definitions.py:35;
    tests pass a sub-second interval). Stops after min_batches have
    committed and returns the drained memory-sink result."""
    import time as _time

    name = f"stream_out_{next(_memory_names)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime=interval)
        .start()
    )
    try:
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if len([p for p in q.recentProgress if p["numInputRows"] >= 0]) >= min_batches:
                break
            _time.sleep(0.2)
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the documents fixture — the continuous-
    ingest shape of a training corpus (each micro-batch = one crawl
    drop landing in the lake)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(_stream_dir(sf_dir, "documents"))


def run_available_now(
    stream_df: DataFrame,
    output_mode: str = "append",
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain the stream into a memory sink (availableNow) and return the
    result as a batch DataFrame. Memory sink is for tests/driver checks
    only — production sinks live in io/sinks.py (foreachBatch).

    `state_partitions` sizes the stateful operator's state-store count
    (= shuffle partitions, fixed at query start and immutable for the
    checkpoint's lifetime): every state store pays per-batch open/
    commit/snapshot overhead, so it should track the STATE volume (key
    count), not the batch shuffle default — a few thousand keys want a
    handful of partitions, a billion-key dedup wants thousands. The
    conf is restored after start; values are identical either way."""
    spark = stream_df.sparkSession
    name = f"stream_out_{next(_memory_names)}"
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = writer.start()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    try:
        finished = q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    if not finished:
        raise TimeoutError(
            f"availableNow drain still running after {timeout_s}s — the memory "
            "sink holds a partial result"
        )
    return spark.table(name)
