"""Continuous aggregate (materialized rollup) — the hypertable-rollup
shape: each micro-batch's partial aggregate is merged ADDITIVELY into a
persistent rollup table via foreachBatch.

This is the streaming twin of a materialized view, and the scale story
is the point: the stream never holds aggregate state in the state store
(no ever-growing complete-mode state), the rollup table is the state —
bounded by the window keyspace, not the event count. Counts and sums
are mergeable partials, so exactly-once merging means the final rollup
equals the batch aggregate over all input — which is exactly what the
driver's oracle checks.

Exactly-once is earned, not assumed: foreachBatch is AT-LEAST-once (a
restart after the rollup publish but before the checkpoint commits the
offset re-delivers the batch), so the merge records each applied
epoch_id in an `_applied_epochs` marker that is published ATOMICALLY
with the data (same temp-dir rename); a re-delivered epoch is detected
and skipped instead of double-added. The underscore prefix keeps the
marker invisible to parquet readers.

Money partials stay exact BIGINT fixed-point units in the rollup (never
pre-rounded: rounding partial sums is not mergeable); rounding happens
once at read time. The read-merge-rewrite here is the parquet stand-in
for a real deployment's Delta/Iceberg MERGE INTO; the swap is atomic
(write to a temp dir, rename over).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.functions.compat import to_cents

_EPOCH_MARKER = "_applied_epochs"
_OLD_SUFFIX = "_old"


def publish_swap(tmp: str, live: str) -> None:
    """Swap ``tmp`` into ``live`` keeping a recoverable copy at every
    instant: the previous rmtree(live)+rename(tmp) pair had a window
    where a crash deleted both the state and its epoch marker while the
    stream checkpoint had already committed those offsets — losing the
    state permanently. Renaming the old dir aside first means every
    crash point leaves either live or live_old intact; recover_swap
    restores the latter on the next touch."""
    old = live + _OLD_SUFFIX
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old, ignore_errors=True)


def recover_swap(live: str) -> None:
    """If a crash hit between publish_swap's two renames, only
    ``live_old`` exists — restore it so the re-delivered epoch merges
    against the pre-crash state instead of an empty one."""
    old = live + _OLD_SUFFIX
    if not os.path.exists(live) and os.path.exists(old):
        os.rename(old, live)


def applied_epochs(rollup_dir: str) -> set[int]:
    recover_swap(rollup_dir)
    p = os.path.join(rollup_dir, _EPOCH_MARKER)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return {int(tok) for tok in f.read().split()}


def rollup_merge_batch(rollup_dir: str, merge_partitions: int = 8):
    """foreachBatch body: aggregate the micro-batch to (window_start,
    event_type) partials and merge them additively into rollup_dir,
    idempotently per epoch.

    The merge is union + re-aggregate, not a full-outer join: partials
    are mergeable, so (old rollup UNION batch partials) re-aggregated
    on the key IS the merge — one shuffle, no join, and the explicit
    repartition on the key pins the task count to the (small) rollup
    keyspace instead of the session's shuffle default (a bare driver
    session uses 200 — 200 tasks for a few thousand rows is pure
    scheduling overhead, every merge cycle)."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        seen = applied_epochs(rollup_dir)
        if int(epoch_id) in seen:
            return  # re-delivered batch after a publish+crash: already merged
        keyed = batch_df.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "value",
        )
        # repartition on the exact group keys: the aggregate's required
        # distribution is already satisfied, so no second exchange
        agg = (
            keyed.repartition(merge_partitions, "window_start", "event_type")
            .groupBy("window_start", "event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(to_cents(F.col("value"))).alias("sum_units"),
            )
        )
        if os.path.exists(rollup_dir):
            cur = spark.read.parquet(rollup_dir)
            merged = (
                cur.unionByName(agg)
                .repartition(merge_partitions, "window_start", "event_type")
                .groupBy("window_start", "event_type")
                .agg(
                    F.sum("cnt").alias("cnt"),
                    F.sum("sum_units").alias("sum_units"),
                )
            )
        else:
            merged = agg
        # materialize BEFORE touching the target: the plan reads the
        # directory we are about to replace
        merged = merged.persist()
        merged.count()
        tmp = rollup_dir + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        # the rollup is keyspace-sized (small); one file per rewrite
        # keeps reads cheap across merge cycles
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        merged.unpersist()
        # epoch marker rides the same rename as the data: the publish is
        # atomic for both, so a crash can never record an epoch without
        # its data (or vice versa)
        with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
            f.write(" ".join(str(e) for e in sorted(seen | {int(epoch_id)})))
        publish_swap(tmp, rollup_dir)

    return merge
