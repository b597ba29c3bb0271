"""Sinks (reference K1-K3, SURVEY.md §2.A).

The reference's JSON append-merge (test.py:93-128) reads the old file,
concatenates, and rewrites — not crash-safe (a partial write loses the
file) and O(total) per append. Spark's append mode writes NEW files
under the directory with a commit protocol, so "merge" is free and
atomic; the timestamped filenames (test.py:103) become ingest-date
partitions, which also gives partition pruning on read.

At scale: partition by a low-cardinality time column (ingest_date),
never by a high-cardinality key; target file sizes via coalesce before
single-sink writes of small dimension outputs.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_json_append(df: DataFrame, path: str) -> None:
    """K1: append-mode JSON files (no read-merge-rewrite)."""
    df.write.mode("append").json(path)


def sink_partitioned_parquet(
    df: DataFrame, path: str, partition_col: str = "ingest_date"
) -> None:
    """K1 with ingest-date partitioning replacing filename timestamps."""
    out = df
    if partition_col not in df.columns:
        out = df.withColumn(partition_col, F.current_date())
    out.write.mode("append").partitionBy(partition_col).parquet(path)


def sink_compacted_parquet(
    df: DataFrame,
    path: str,
    partition_col: str,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Small-files-safe partitioned write: repartition on the partition
    key first so each partition directory receives ONE shuffle task's
    output (one file, not one file per upstream task — an unmanaged
    partitionBy from T tasks over P partitions writes up to T*P tiny
    files), then cap file size with maxRecordsPerFile so a hot
    partition splits instead of producing a multi-GB file. At 100 TB
    the file count is what keeps the table's metadata and scan
    planning usable."""
    (
        df.repartition(F.col(partition_col))
        .write.mode("append")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )


def recover_warehouse_table(spark, name: str) -> bool:
    """Re-register a table whose DATA outlived the metastore: a
    restarted container gets a fresh in-memory catalog, but the
    managed location under spark.sql.warehouse.dir persists (that is
    the point of mounting it). Without recovery the next append fails
    with LOCATION_ALREADY_EXISTS and the run ledger dies across
    restarts. Returns True when the table is registered (already or
    recovered), False when there is nothing to recover."""
    if spark.catalog.tableExists(name):
        return True
    from urllib.parse import urlparse

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    parsed = urlparse(wh)
    wh_path = parsed.path if parsed.scheme in ("file", "") else None
    if not wh_path:
        return False  # non-local warehouse: nothing to probe cheaply
    loc = os.path.join(wh_path, name.lower())
    if not os.path.isdir(loc):
        return False
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} USING parquet LOCATION '{loc}'"
    )
    return True


def sink_table(df: DataFrame, name: str) -> None:
    """K2: the SQL-queryable 'jobs'-style table (README.md:64-69 in the
    reference); downstream query surface is spark.sql. Restart-safe:
    an existing warehouse location from a previous process is
    re-registered before the append (recover_warehouse_table)."""
    recover_warehouse_table(df.sparkSession, name)
    df.write.mode("append").format("parquet").saveAsTable(name)


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    """Embedded-Derby JDBC URL (the in-container stand-in for the
    reference's SQLite jobs.db; Derby ships in Spark's jars/)."""
    return f"jdbc:derby:{db_dir};create=true"


def sink_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str = DERBY_DRIVER,
    num_partitions: int = 8,
    batchsize: int = 10_000,
) -> None:
    """K2's literal shape (reference README.md:64-69 — the sqlite3
    jobs.db table users query directly): push rows to an external
    RDBMS over JDBC.

    At scale the knobs that matter are numPartitions (caps concurrent
    connections — an unthrottled 1000-task write is a DDoS on the
    database) and batchsize (rows per INSERT round-trip). Truncate-
    overwrite keeps the table's grants/indexes; the overwrite here
    recreates the schema, which is what a first-deploy looks like."""
    (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("numPartitions", str(num_partitions))
        .option("batchsize", str(batchsize))
        .save()
    )


def read_jdbc(spark, url: str, table: str, driver: str = DERBY_DRIVER) -> DataFrame:
    """Read a JDBC table back (single-partition read: the queryable
    sink is small by design; partitioned reads would add
    partitionColumn/bounds)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .load()
    )


def dual_sink_foreach_batch(
    main_path: str, side_path: str, side_cols: list[str]
) -> Callable[[DataFrame, int], None]:
    """K1+K3: the reference writes the full records AND a 1-column
    company-url side table per run (test.py:577-580). In streaming this
    is one foreachBatch writing both sinks per micro-batch."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode("append").json(main_path)
            batch_df.select(*side_cols).write.mode("append").json(side_path)
        finally:
            batch_df.unpersist()

    return write


def dual_sink_parquet_foreach_batch(
    main_path: str,
    side_path: str,
    side_cols: list[str],
    mode: str = "append",
) -> Callable[[DataFrame, int], None]:
    """Parquet variant of the dual sink for production streaming jobs
    (deploy.py): each micro-batch lands columnar files executor-side —
    the batch never passes through the driver, unlike the memory sink
    (which collects every row into driver memory and is for
    tests/driver checks only). ``mode='overwrite'`` suits complete-
    output aggregations (each tick re-lands the full rollup);
    ``'append'`` suits append-mode pipelines."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            batch_df.write.mode(mode).parquet(main_path)
            keep = [c for c in side_cols if c in batch_df.columns]
            if keep:
                batch_df.select(*keep).write.mode(mode).parquet(side_path)
        finally:
            batch_df.unpersist()

    return write


# --- versioned snapshots (poor-man's time travel) ----------------------------
#
# A snapshot table is a directory of immutable version dirs plus a
# MANIFEST committed LAST (write temp + atomic os.replace) — the same
# manifest-last discipline as the push sink: a writer dying mid-write
# leaves an orphan version dir that no reader ever sees, and
# re-running the write is idempotent (the dir is rewritten, the
# manifest replaced). Readers pin a version ("as of") or take the
# latest committed one; concurrent readers of an old version are
# never disturbed because version dirs are immutable once committed.
# At 100 TB this is the lake-format (Delta/Iceberg) snapshot model
# reduced to its core: the engine-side contract is identical.

_VERSION_FMT = "v{:05d}"


def sink_versioned(df: DataFrame, root: str, version: int) -> None:
    """Write `df` as snapshot `version`, committing it to the manifest
    only after the data lands.

    Concurrency contract: crash-safety comes from manifest-last +
    atomic replace; concurrent COMMITS are additionally serialized by
    an O_EXCL lock file around the manifest read-modify-write (two
    writers committing different versions would otherwise both read
    the same manifest and the second replace would drop the first's
    version — the lost-update race Delta/Iceberg solve with their
    commit protocol). Local-FS only: O_EXCL is not atomic on object
    stores, where a real lake format's commit service is the answer."""
    import json
    import os
    import time

    vdir = os.path.join(root, _VERSION_FMT.format(version))
    df.write.mode("overwrite").parquet(vdir)

    os.makedirs(root, exist_ok=True)
    manifest = os.path.join(root, "_MANIFEST")
    lock = manifest + ".lock"
    deadline = time.monotonic() + 30.0
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"manifest lock {lock} held for >30s; a crashed "
                    "writer may have leaked it — remove it manually"
                ) from None
            time.sleep(0.05)
    try:
        versions: list[int] = []
        if os.path.exists(manifest):
            with open(manifest) as f:
                versions = json.load(f)["versions"]
        if version not in versions:
            versions = sorted([*versions, version])
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"versions": versions, "latest": versions[-1]}, f)
        os.replace(tmp, manifest)  # the atomic commit point
    finally:
        os.unlink(lock)


def read_versioned(spark, root: str, version: int | None = None) -> DataFrame:
    """Read a committed snapshot: `version` pins "as of"; None reads
    the latest committed. Uncommitted (orphan) dirs are unreachable —
    only the manifest names versions."""
    import json
    import os

    with open(os.path.join(root, "_MANIFEST")) as f:
        meta = json.load(f)
    if version is None:
        version = meta["latest"]
    if version not in meta["versions"]:
        raise ValueError(
            f"version {version} not committed (have {meta['versions']})"
        )
    return spark.read.parquet(os.path.join(root, _VERSION_FMT.format(version)))
