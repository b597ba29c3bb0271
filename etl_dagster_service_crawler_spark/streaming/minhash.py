"""Streaming MinHash near-dup dedup AT INGEST (r10 verdict item 3) —
the batch pipeline_minhash_dedup (workloads/llm.py) as a continuous
pipeline: each arriving micro-batch of documents is shingled, minhash-
signed, and banded with the LITERAL same frame transforms as the batch
query (minhash_hv_frame / minhash_bands_frame), its band keys are
joined against the accumulated band index to surface candidate pairs
(new-vs-seen and new-vs-new), candidates are verified by the exact
shingle-set Jaccard, and the verified pairs accumulate in a state
table.

Batch-boundary invariance is STRUCTURAL, not best-effort: every
candidate pair has exactly one epoch where its later document arrives,
so the union of per-epoch discoveries equals the batch pipeline's
candidate set regardless of how files slice into micro-batches; the
Jaccard verify reads the same persisted shingle-hash arrays either
way. Connected components over the accumulated pairs therefore equal
the batch labeling EXACTLY — the streaming query shares
SQL_PIPELINE_MINHASH_DEDUP as its oracle (the stream_cdc_apply
discipline).

State layout (all parquet under state_dir):
  bands/epoch=N/  (doc_id, band, band_key)   append-only, per-epoch dir
  hv/epoch=N/     (doc_id, hv array<bigint>) append-only, per-epoch dir
  pairs/epoch=N/  (doc_a, doc_b, jaccard_bp) append-only, per-epoch dir

Epoch idempotence: foreachBatch is at-least-once; every write lands in
the epoch's OWN subdirectory with mode=overwrite (the
stream_quarantine_router discipline), so a re-delivered epoch rewrites
identical bytes instead of appending duplicates. Reading the state
root mid-re-delivery may see the epoch's previous (identical) output —
harmless, since candidate generation against a superset that includes
the batch itself yields the same distinct pair set.

Scale: per-epoch work is |batch| x band-index probes — the band join
is key-hashed equi (never n²), the verify join moves only the
candidate docs' 8-byte hash arrays, and state grows append-only (no
read-merge-rewrite of the corpus-sized band index; a production
deployment compacts epochs like sink_compacted_parquet). The pair
table is near-dup-sized, not corpus-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BANDS_SCHEMA = "doc_id bigint, band int, band_key string"
HV_SCHEMA = "doc_id bigint, hv array<bigint>"
PAIRS_SCHEMA = "doc_a bigint, doc_b bigint, jaccard_bp int"


# shared with streaming/packing.py (r12): the local-path guard and the
# pinned-schema epoch reader live in streaming/epoch_state.py so the
# two foreachBatch state modules cannot drift
from etl_dagster_service_crawler_spark.streaming.epoch_state import (
    read_epoch_state as _read_state,
    require_local as _require_local,
)


def minhash_dedup_ingest(state_dir: str, jaccard_bp_min: int):
    """foreachBatch body factory. See module docstring for the
    invariants; jaccard_bp_min is MINHASH_VERIFY_JACCARD_BP in the
    registered query (passed in to keep this module free of workload
    imports)."""
    from etl_dagster_service_crawler_spark.workloads.llm import (
        MINHASH_EXPORT_BAND_ROWS,
        MINHASH_EXPORT_P,
        minhash_bands_frame,
        minhash_hv_frame,
    )

    _require_local(state_dir)
    # Docs with no shingles (< 3 tokens) carry the all-P sentinel
    # signature, so EVERY short doc shares the same band key on every
    # band; left unfiltered they re-pay |short docs|² candidate pairs
    # against the accumulated index each epoch before the inner hv join
    # discards them (r11 ADVICE). Real minima live in [0, P), so no
    # genuine band key can equal the sentinel — filtering it here is
    # exactly the hv-side size(hv) > 0 filter applied to the band side.
    sentinel_key = "-".join([str(MINHASH_EXPORT_P)] * MINHASH_EXPORT_BAND_ROWS)

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        from etl_dagster_service_crawler_spark.streaming.epoch_state import (
            assert_epoch_writable,
        )

        spark = batch_df.sparkSession
        # loud failure when the checkpoint restarted epoch numbering
        # against compacted state (reset checkpoint, same state_dir):
        # a superseded epoch id's writes would be reader-invisible and
        # deleted by the next compaction
        for sub in ("bands", "hv", "pairs"):
            assert_epoch_writable(state_dir, sub, int(epoch_id))
        batch = batch_df.persist()
        new_bands = new_hv = None
        try:
            new_bands = (
                minhash_bands_frame(batch)
                .where(F.col("band_key") != sentinel_key)
                .persist()
            )
            new_hv = (
                minhash_hv_frame(batch)
                .select("doc_id", F.array_distinct("hv").alias("hv"))
                .where(F.size("hv") > 0)
                .persist()
            )
            prior_bands = _read_state(spark, state_dir, "bands", BANDS_SCHEMA)
            prior_hv = _read_state(spark, state_dir, "hv", HV_SCHEMA)
            # prior state written before the sentinel filter existed
            # may still carry sentinel rows — filter the probe side too
            all_bands = prior_bands.where(
                F.col("band_key") != sentinel_key
            ).unionByName(new_bands)
            all_hv = prior_hv.unionByName(new_hv)

            # candidates with >=1 NEW side: new bands probe the full
            # index; (old, old) pairs were surfaced when their later
            # doc arrived. Canonicalize (least, greatest) so the same
            # pair found from either side dedups.
            left = new_bands.select(
                F.col("doc_id").alias("da"), "band", "band_key"
            )
            right = all_bands.select(
                F.col("doc_id").alias("db"), "band", "band_key"
            )
            cand = (
                left.join(right, ["band", "band_key"])
                .where(F.col("da") != F.col("db"))
                .select(
                    F.least("da", "db").alias("doc_a"),
                    F.greatest("da", "db").alias("doc_b"),
                )
                .distinct()
            )
            ha = all_hv.select(F.col("doc_id").alias("doc_a"), F.col("hv").alias("ha"))
            hb = all_hv.select(F.col("doc_id").alias("doc_b"), F.col("hv").alias("hb"))
            inter = F.size(F.array_intersect("ha", "hb"))
            pairs = (
                cand.join(ha, "doc_a")
                .join(hb, "doc_b")
                .select(
                    "doc_a",
                    "doc_b",
                    inter.alias("inter"),
                    (F.size("ha") + F.size("hb") - inter).alias("uni"),
                )
                .select(
                    "doc_a",
                    "doc_b",
                    F.expr("CAST((10000 * inter) DIV uni AS INT)").alias(
                        "jaccard_bp"
                    ),
                )
                .where(F.col("jaccard_bp") >= jaccard_bp_min)
            )
            ep = f"epoch={int(epoch_id)}"
            # pairs FIRST: if we crash after pairs but before bands/hv,
            # the re-delivered epoch recomputes the identical candidate
            # set (its own bands are not yet in the index) and
            # overwrites the same bytes; had bands landed first, a
            # crash would leave the epoch's docs indexed but its pairs
            # missing until re-delivery — same fixpoint, but pairs-first
            # keeps the pair table never-ahead-never-behind the index.
            pairs.write.mode("overwrite").parquet(
                os.path.join(state_dir, "pairs", ep)
            )
            new_bands.write.mode("overwrite").parquet(
                os.path.join(state_dir, "bands", ep)
            )
            new_hv.write.mode("overwrite").parquet(
                os.path.join(state_dir, "hv", ep)
            )
        finally:
            # in finally, not the success path: a failed epoch write is
            # re-delivered, and each retry would otherwise stack two
            # more orphaned cached frames in executor storage
            for df in (new_bands, new_hv, batch):
                if df is not None:
                    df.unpersist()

    return apply


def read_verified_pairs(spark, state_dir: str) -> DataFrame:
    """The accumulated verified near-dup pairs after a drain.
    DISTINCT by construction: pair facts are deterministic, so the one
    crash window that can duplicate them (compaction swap, below)
    collapses here — a near-dup-pair-sized exchange, not corpus.
    state_dir must be a LOCAL path (see _require_local)."""
    _require_local(state_dir)
    return (
        _read_state(spark, state_dir, "pairs", PAIRS_SCHEMA)
        .select("doc_a", "doc_b", "jaccard_bp")
        .distinct()
    )


def compact_minhash_state(spark, state_dir: str, n_buckets: int = 8) -> None:
    """Fold all accumulated epoch dirs into ONE compacted epoch — the
    maintenance pass a long-running ingest schedules between drains
    (a year of hourly drops is ~9k epoch dirs; file-listing cost and
    per-file open overhead grow with every epoch until compaction).

    The compacted state is SEMANTICALLY IDENTICAL to the epoch chain:
    bands/hv/pairs rows are unioned verbatim (they are append-only
    facts keyed by doc_id — no merge logic exists to get wrong) and
    land under a NEGATIVE generation epoch (``epoch=-1``, then -2, …)
    hash-bucketed by doc_id so later batches' index probes read fewer,
    larger, co-bucketed files. Crash safety and the between-drains
    contract: see compact_epoch_dirs (streaming/epoch_state.py — the
    generation-fold was factored there in r13 so packing's token facts
    compact under the SAME tested discipline); the worst crash window
    duplicates facts, which the ingest's DISTINCT candidate set and
    read_verified_pairs' DISTINCT collapse — pinned by test."""
    from etl_dagster_service_crawler_spark.streaming.epoch_state import (
        compact_epoch_dirs,
    )

    _require_local(state_dir)
    for sub, schema in (
        ("bands", BANDS_SCHEMA), ("hv", HV_SCHEMA), ("pairs", PAIRS_SCHEMA)
    ):
        key = "doc_id" if sub != "pairs" else "doc_a"
        compact_epoch_dirs(
            spark, state_dir, sub, schema, key=key, n_buckets=n_buckets
        )
