"""Streaming sequence PACKING at ingest (r11 verdict item 7) — the
batch pack_sequences (workloads/corpus_wl.py) as a continuous
pipeline: a training-data ingest packs documents into fixed-length
token sequences AS THEY ARRIVE, carrying the running token offset
across micro-batches instead of re-scanning the corpus per drop.

Ordering contract: packing concatenates documents in doc_id order, so
the stream must deliver doc_id ranges in ascending order — the
ordered-manifest shape a training ingest already has (slices named and
modification-stamped in id order; Spark's file source processes oldest
first). Within a micro-batch, offsets come from the SAME two-level
prefix-sum decomposition as the batch query (pack_doc_spans_frame);
across batches, the accumulated per-epoch token totals provide the
base offset. The drained union therefore equals the batch mapping
row-for-row — the entry shares SQL_PACK_SEQUENCES as its oracle.

Epoch idempotence (the streaming/minhash.py discipline): foreachBatch
is at-least-once; every write lands in the epoch's OWN subdirectory
with mode=overwrite. The base offset for epoch N is the sum of the
token-total FACTS of epochs < N, which a re-delivered epoch N cannot
perturb — it rewrites identical bytes. Output first, fact second: a
crash between the two re-delivers the epoch, which recomputes the
identical output before landing the fact.

State layout (parquet under state_dir):
  out/epoch=N/   packed spans of the epoch's docs
  tok/epoch=N/   one row: (epoch, n_tokens) — the epoch's token total

Scale: per-epoch work is one narrow token count + the bounded
two-level window over the batch; state reads are |epochs| one-row
facts (compact like the minhash epochs if drops are frequent). No
corpus rescans anywhere — exactly the cost profile an hourly drop
wants.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.streaming.epoch_state import (
    read_epoch_state,
    require_local,
)

PACK_OUT_SCHEMA = (
    "doc_id bigint, n_tokens bigint, start_tok bigint, seq_first bigint, "
    "seq_last bigint, crosses_boundary boolean"
)
_TOK_SCHEMA = "epoch bigint, n_tokens bigint"


def pack_ingest(state_dir: str):
    """foreachBatch body factory — see module docstring. state_dir
    must be a LOCAL path (require_local: the epoch listing is
    os-level)."""
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        pack_doc_spans_frame,
        pack_select,
    )

    require_local(state_dir)

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        ep = int(epoch_id)
        prior = read_epoch_state(spark, state_dir, "tok", _TOK_SCHEMA)
        base = prior.where(F.col("epoch") < ep).agg(
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("base")
        )
        spans = pack_doc_spans_frame(batch_df).join(F.broadcast(base))
        shifted = spans.select(
            "doc_id",
            "n_tokens",
            (F.col("start_tok") + F.col("base")).alias("start_tok"),
        )
        out = pack_select(shifted).persist()
        try:
            out.write.mode("overwrite").parquet(
                os.path.join(state_dir, "out", f"epoch={ep}")
            )
            total = out.agg(
                F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint")
            ).first()[0]
            spark.createDataFrame([(ep, total)], _TOK_SCHEMA).coalesce(
                1
            ).write.mode("overwrite").parquet(
                os.path.join(state_dir, "tok", f"epoch={ep}")
            )
        finally:
            out.unpersist()

    return apply


def read_packed(spark, state_dir: str) -> DataFrame:
    """The accumulated packed mapping after a drain. state_dir must be
    a LOCAL path (require_local)."""
    require_local(state_dir)
    return read_epoch_state(spark, state_dir, "out", PACK_OUT_SCHEMA)
