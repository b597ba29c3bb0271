"""Streaming CDC apply — consuming a change log (upserts + deletes)
incrementally via foreachBatch, the streaming twin of the batch
cdc_merge_changelog compaction.

The state table holds, per key, the highest-sequence change seen so
far INCLUDING delete tombstones: micro-batches are split by key hash,
so change order ACROSS batches is arbitrary, and dropping a tombstone
would let a lower-seq upsert arriving later resurrect the key.
Last-wins is therefore re-derived on every merge as argmax(seq) over
(existing state UNION batch top-1s) — mergeable, so the final state is
independent of batch boundaries, which is exactly what the oracle
checks (streamed result == the batch compaction SQL).

Idempotence mirrors streaming/rollup.py: foreachBatch is at-least-once,
so each applied epoch_id is recorded in a marker file published
atomically with the data (same temp-dir rename) and re-delivered
epochs are skipped. State is key-spaced (snapshot-sized ceiling), never
event-count-sized.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.streaming.rollup import (
    _EPOCH_MARKER,
    applied_epochs,
    publish_swap,
)


def cdc_apply_batch(state_dir: str, merge_partitions: int = 8):
    """foreachBatch body: reduce the micro-batch to per-key top-1 by
    seq, merge last-wins into the persistent state table."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        seen = applied_epochs(state_dir)
        if int(epoch_id) in seen:
            return
        w = Window.partitionBy("key").orderBy(F.desc("seq"))
        top1 = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("key", "seq", "op", "new_bal_c")
        )
        if os.path.exists(state_dir):
            cur = spark.read.parquet(state_dir)
            merged = (
                cur.unionByName(top1)
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("key", "seq", "op", "new_bal_c")
            )
        else:
            merged = top1
        merged = merged.repartition(merge_partitions, "key").persist()
        merged.count()
        tmp = state_dir + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        merged.unpersist()
        with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
            f.write(" ".join(str(e) for e in sorted(seen | {int(epoch_id)})))
        # rename-aside swap (publish_swap): a crash between the old
        # rmtree+rename pair deleted state AND marker after the
        # checkpoint committed — unrecoverable; now one of live/_old
        # survives every crash point and applied_epochs restores it
        publish_swap(tmp, state_dir)

    return apply
