"""Streaming sequence PACKING at ingest (r11 verdict item 7) — the
batch pack_sequences (workloads/corpus_wl.py) as a continuous
pipeline: a training-data ingest packs documents into fixed-length
token sequences AS THEY ARRIVE, carrying the running token offset
across micro-batches instead of re-scanning the corpus per drop.

Ordering contract: packing concatenates documents in doc_id order, so
the stream must deliver doc_id ranges in ascending order — the
ordered-manifest shape a training ingest already has (slices named and
modification-stamped in id order; Spark's file source processes oldest
first). The contract is ENFORCED, not assumed (r12 ADVICE/verdict):
every epoch's token fact carries the batch's (min_doc, max_doc), and
apply() fails LOUDLY when a batch's min doc_id does not exceed every
prior epoch's max — a misordered manifest (mis-stamped mtime,
backfilled slice) dies before any state lands instead of silently
packing wrong offsets. Within a micro-batch, offsets come from the
SAME two-level prefix-sum decomposition as the batch query
(pack_doc_spans_frame); across batches, the accumulated per-epoch
token totals provide the base offset. The drained union therefore
equals the batch mapping row-for-row — the entry shares
SQL_PACK_SEQUENCES as its oracle.

Epoch idempotence (the streaming/minhash.py discipline): foreachBatch
is at-least-once; every write lands in the epoch's OWN subdirectory
with mode=overwrite. The base offset for epoch N is the sum of the
token-total FACTS of epochs < N, which a re-delivered epoch N cannot
perturb — it rewrites identical bytes. Output first, fact second: a
crash between the two re-delivers the epoch, which recomputes the
identical output before landing the fact.

State layout (parquet under state_dir):
  out/epoch=N/   packed spans of the epoch's docs
  tok/epoch=N/   one row: (n_tokens, min_doc, max_doc) — the epoch's
                 token total and doc_id range (epoch comes from the
                 partition dir)

Scale: per-epoch work is one narrow token count + the bounded
two-level window over the batch; state reads are |epochs| one-row
facts until compact_pack_state folds them into one generation file
(the compact_minhash_state discipline — an hourly drop is ~9k epoch
dirs/year otherwise, re-listed on every batch). No corpus rescans
anywhere — exactly the cost profile an hourly drop wants.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.streaming.epoch_state import (
    assert_epoch_writable,
    compact_epoch_dirs,
    read_epoch_state,
    require_local,
)

PACK_OUT_SCHEMA = (
    "doc_id bigint, n_tokens bigint, start_tok bigint, seq_first bigint, "
    "seq_last bigint, crosses_boundary boolean"
)
# epoch is the partition dir, never a data column — compaction folds
# rows under a negative generation dir and sums/maxes stay exact
_TOK_SCHEMA = "epoch bigint, n_tokens bigint, min_doc bigint, max_doc bigint"
_TOK_FACT_SCHEMA = "n_tokens bigint, min_doc bigint, max_doc bigint"


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
        # loud failure when the checkpoint restarted epoch numbering
        # against compacted state — a superseded epoch id's writes
        # would be reader-invisible and compaction-deleted
        assert_epoch_writable(state_dir, "tok", ep)
        facts = read_epoch_state(spark, state_dir, "tok", _TOK_SCHEMA)
        # ONE pass over the fact files: conditional aggregates pull the
        # prior-prefix totals AND the own-epoch committed fact together
        # (a second .first() would re-list and re-scan the whole fact
        # dir on every micro-batch)
        lt = F.col("epoch") < ep
        eq = F.col("epoch") == ep
        prior = facts.agg(
            F.coalesce(F.sum(F.when(lt, F.col("n_tokens"))), F.lit(0)).alias(
                "base"
            ),
            F.max(F.when(lt, F.col("max_doc"))).alias("prior_max"),
            F.max(F.when(eq, F.lit(1))).alias("own_seen"),
            F.max(F.when(eq, F.col("n_tokens"))).alias("own_tok"),
            F.max(F.when(eq, F.col("min_doc"))).alias("own_min"),
            F.max(F.when(eq, F.col("max_doc"))).alias("own_max"),
        ).first()
        spans = pack_doc_spans_frame(batch_df)
        shifted = spans.select(
            "doc_id",
            "n_tokens",
            (F.col("start_tok") + F.lit(int(prior["base"]))).alias(
                "start_tok"
            ),
        )
        out = pack_select(shifted).persist()
        try:
            stats = out.agg(
                F.coalesce(F.sum("n_tokens"), F.lit(0))
                .cast("bigint")
                .alias("total"),
                F.min("doc_id").alias("mn"),
                F.max("doc_id").alias("mx"),
            ).first()
            # the ordering guard, BEFORE any state lands: a batch that
            # regresses into an already-packed doc_id range would get a
            # base offset computed from the wrong prefix — fail the
            # epoch loudly instead of silently mis-packing (r12 ADVICE)
            if (
                prior["prior_max"] is not None
                and stats["mn"] is not None
                and stats["mn"] <= prior["prior_max"]
            ):
                raise ValueError(
                    f"pack_ingest ordering contract violated: epoch {ep} "
                    f"min doc_id {stats['mn']} <= a prior epoch's max "
                    f"doc_id {prior['prior_max']} — the manifest delivered "
                    "a doc_id range out of order (mis-stamped mtime or "
                    "backfilled slice); re-land the slice after the "
                    "resident range or rebuild with the batch query"
                )
            # re-delivery sanity on the persisted fact: at-least-once
            # may replay an epoch, but only with the SAME content — a
            # different doc range OR token total under a repeated epoch
            # id means checkpoint/source corruption (a slice rewritten
            # in place keeps its doc_ids but changes n_tokens), and
            # overwriting the committed fact would silently shift every
            # later offset
            if prior["own_seen"] is not None and (
                prior["own_min"] != stats["mn"]
                or prior["own_max"] != stats["mx"]
                or prior["own_tok"] != stats["total"]
            ):
                raise ValueError(
                    f"pack_ingest re-delivery mismatch: epoch {ep} was "
                    f"committed as doc range [{prior['own_min']}, "
                    f"{prior['own_max']}] with {prior['own_tok']} tokens "
                    f"but re-delivered as [{stats['mn']}, {stats['mx']}] "
                    f"with {stats['total']} tokens — the checkpoint and "
                    "the source manifest disagree; refusing to overwrite "
                    "committed state"
                )
            out.write.mode("overwrite").parquet(
                os.path.join(state_dir, "out", f"epoch={ep}")
            )
            spark.createDataFrame(
                [(stats["total"], stats["mn"], stats["mx"])],
                _TOK_FACT_SCHEMA,
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(state_dir, "tok", f"epoch={ep}")
            )
        finally:
            out.unpersist()

    return apply


def compact_pack_state(spark, state_dir: str) -> None:
    """Fold the accumulated per-epoch token facts into ONE generation
    file (compact_epoch_dirs — the compact_minhash_state discipline:
    atomic rename publish, between-drains-only). Base offsets and the
    ordering guard read sum(n_tokens)/max(max_doc) over ALL prior
    facts, both invariant to the fold, so ingest resumed after a
    compaction packs identically (pinned by test). The packed spans
    under out/ are the pipeline's DATA output, not per-batch-read
    state — they stay per-epoch (a sink compaction is
    sink_compacted_parquet's job)."""
    require_local(state_dir)
    compact_epoch_dirs(spark, state_dir, "tok", _TOK_SCHEMA)


def read_packed(spark, state_dir: str) -> DataFrame:
    """The accumulated packed mapping after a drain. state_dir must be
    a LOCAL path (require_local)."""
    require_local(state_dir)
    return read_epoch_state(spark, state_dir, "out", PACK_OUT_SCHEMA)
