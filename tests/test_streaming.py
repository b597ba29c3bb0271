from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.io.sinks import dual_sink_foreach_batch
from etl_dagster_service_crawler_spark.io.tables import load_table
from etl_dagster_service_crawler_spark.streaming.ingest import (
    run_available_now,
    stream_events,
)
from etl_dagster_service_crawler_spark.streaming.state import (
    dedup_within_watermark,
    error_budget_counter,
)
from etl_dagster_service_crawler_spark.streaming.windows import (
    tumbling_counts,
    watermarked_tumbling,
)


def test_stream_batch_equivalence_tumbling(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    stream_result = {
        tuple(r) for r in run_available_now(
            tumbling_counts(stream_events(spark, sf_dir)), "complete"
        ).collect()
    }
    batch_result = {tuple(r) for r in tumbling_counts(batch).collect()}
    assert stream_result == batch_result and len(batch_result) > 0


def test_watermarked_append_mode_emits_closed_windows(spark, sf_dir):
    out = run_available_now(
        watermarked_tumbling(stream_events(spark, sf_dir)), "append"
    )
    # availableNow processes everything then the watermark advances past
    # the max event time; every window except possibly the last closes.
    assert out.count() > 0


def test_stream_dedup_exactly_once(spark, sf_dir):
    a = stream_events(spark, sf_dir)
    b = stream_events(spark, sf_dir)
    deduped = dedup_within_watermark(a.unionByName(b), ["event_id"])
    n = run_available_now(deduped.select("event_id"), "append").count()
    expected = load_table(spark, sf_dir, "events").count()
    assert n == expected


def test_error_budget_trips_once_per_user(spark, sf_dir):
    out = run_available_now(
        error_budget_counter(stream_events(spark, sf_dir), max_errors=3), "append"
    )
    rows = out.collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))  # one trip per user
    assert all(r.n_errors >= 3 for r in rows)


def test_dual_sink_writes_main_and_side(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        main, side = os.path.join(tmp, "main"), os.path.join(tmp, "side")
        s = stream_events(spark, sf_dir).select(
            "event_id", "event_type", F.col("user_id").cast("string").alias("side_key")
        )
        q = (
            s.writeStream.foreachBatch(
                dual_sink_foreach_batch(main, side, ["side_key"])
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        n_events = load_table(spark, sf_dir, "events").count()
        assert spark.read.json(main).count() == n_events
        side_df = spark.read.json(side)
        assert side_df.columns == ["side_key"]
        assert side_df.count() == n_events


def test_processing_time_trigger_drains_source(spark, sf_dir):
    """O1 parity: the 2-minute cron becomes a ProcessingTime trigger
    (sub-second here); batches keep arriving until the source is dry."""
    from etl_dagster_service_crawler_spark.streaming.ingest import (
        run_processing_time,
        stream_events,
    )

    s = stream_events(spark, sf_dir)
    out = run_processing_time(
        s.select("event_id"), interval="1 second", min_batches=1, timeout_s=120
    )
    assert out.count() > 0


def test_error_budget_tws_variant_matches(spark, sf_dir):
    """transformWithStateInPandas where the runtime supports it,
    applyInPandasWithState fallback otherwise — same rows either way."""
    from etl_dagster_service_crawler_spark.streaming.ingest import (
        run_available_now,
        stream_events,
    )
    from etl_dagster_service_crawler_spark.streaming.state import (
        error_budget_counter,
        error_budget_counter_tws,
    )

    a = run_available_now(
        error_budget_counter(stream_events(spark, sf_dir), 3), "append"
    )
    b = run_available_now(
        error_budget_counter_tws(stream_events(spark, sf_dir), 3), "append"
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_rollup_merge_is_idempotent_per_epoch(spark, tmp_path):
    """foreachBatch is at-least-once: a re-delivered epoch (restart
    after publish, before checkpoint commit) must not double-add."""
    import datetime

    from etl_dagster_service_crawler_spark.streaming.rollup import (
        applied_epochs,
        rollup_merge_batch,
    )

    rollup_dir = str(tmp_path / "rollup")
    merge = rollup_merge_batch(rollup_dir, merge_partitions=2)
    ts = datetime.datetime(2024, 1, 1, 10, 30)
    batch = spark.createDataFrame(
        [(1, ts, "click", 10.0), (2, ts, "click", 5.0)],
        "event_id bigint, ts timestamp, event_type string, value double",
    )

    merge(batch, 0)
    first = {tuple(r) for r in spark.read.parquet(rollup_dir).collect()}
    merge(batch, 0)  # re-delivery of the SAME epoch: no-op
    assert {tuple(r) for r in spark.read.parquet(rollup_dir).collect()} == first
    assert applied_epochs(rollup_dir) == {0}

    merge(batch, 1)  # a NEW epoch merges additively
    rows = {
        (r.event_type, r.cnt, r.sum_units)
        for r in spark.read.parquet(rollup_dir).collect()
    }
    assert rows == {("click", 4, 300000)}  # 2x(10+5) in 1e-4 units
    assert applied_epochs(rollup_dir) == {0, 1}


def test_stream_corpus_clean_matches_batch_survivors(spark, sf_dir):
    """The streaming corpus-clean must keep exactly the docs the batch
    flagship keeps (same gates, same min-id-per-hash winner), with the
    same duplicate counts — batch/stream equivalence for the composed
    pipeline, not just single operators."""
    from etl_dagster_service_crawler_spark.workloads.llm import (
        q_pipeline_corpus_clean,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_corpus_clean,
    )

    batch = {
        r.doc_id: r.n_dups for r in q_pipeline_corpus_clean(spark, sf_dir).collect()
    }
    stream = {
        r.doc_id: r.n_dups for r in q_stream_corpus_clean(spark, sf_dir).collect()
    }
    assert stream == batch


def test_stream_ivf_ingest_matches_batch_assignment(spark, sf_dir):
    """The streamed, micro-batch-appended index must contain EXACTLY
    the rows a batch assignment against the same frozen centroids
    produces — ingest order and batch slicing must not matter."""
    import hashlib

    from pyspark.sql import functions as F

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.operators.similarity import (
        assign_cells,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_ivf_ingest,
    )

    counts = {
        r["cid"]: r["n_vectors"]
        for r in q_stream_ivf_ingest(spark, sf_dir).collect()
    }
    from etl_dagster_service_crawler_spark.operators.similarity import (
        ivf_index_dir,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    centroids = spark.read.parquet(f"{ivf_index_dir(sf_dir)}/centroids")
    emb = load_table(spark, sf_dir, "embeddings")
    batch = {
        r["cid"]: r["n"]
        for r in assign_cells(emb, centroids)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("int").alias("n"))
        .collect()
    }
    assert counts == batch
    # and row-level: streamed index ids per cell == batch ids per cell
    streamed = spark.read.parquet(
        f"/tmp/spark_graft_streams/{tag}/ivf_ingest/assignments"
    ).select("vec_id", "cid")
    diff = (
        streamed.exceptAll(assign_cells(emb, centroids).select("vec_id", "cid"))
        .count()
    )
    assert diff == 0


def test_checkpointed_restart_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Operational restart semantics: a file-source query with a
    checkpoint drains day1, STOPS, and on restart against the SAME
    checkpoint + sink processes ONLY the newly-landed day2 — no
    reprocessing, no loss (the recovery a missed schedule window or a
    crashed container relies on). Exactly-once to the parquet sink."""
    import glob as _glob
    import shutil

    from etl_dagster_service_crawler_spark.streaming.ingest import (
        DOCUMENTS_SCHEMA,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def stage(df, name):
        stage_dir = f"{src}_stage_{name}"
        df.coalesce(1).write.parquet(stage_dir)
        part = _glob.glob(f"{stage_dir}/part-*.parquet")[0]
        os.makedirs(src, exist_ok=True)
        shutil.move(part, os.path.join(src, f"{name}.parquet"))
        shutil.rmtree(stage_dir)

    def drain():
        q = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .parquet(src)
            .select("doc_id", "lang")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    n1, n2 = 250, 250
    stage(docs.where(F.col("doc_id") < 250), "day1")
    drain()
    assert spark.read.parquet(sink).count() == n1

    stage(docs.where(F.col("doc_id") >= 250), "day2")
    drain()  # restart from the same checkpoint
    out = spark.read.parquet(sink)
    assert out.count() == n1 + n2  # day1 NOT reprocessed
    assert out.select("doc_id").distinct().count() == n1 + n2  # no dups


def test_cdc_apply_idempotent_and_order_independent(spark, tmp_path):
    """cdc_apply_batch must (a) skip a re-delivered epoch (at-least-
    once foreachBatch) and (b) produce the same final state whatever
    order the batches arrive in — tombstones must not be resurrected
    by a lower-seq upsert applied later."""
    from etl_dagster_service_crawler_spark.streaming.cdc import cdc_apply_batch

    rows_a = [(1, 10, "U", 100), (2, 5, "D", 0)]
    rows_b = [(1, 20, "D", 0), (2, 3, "U", 50)]
    schema = "key bigint, seq bigint, op string, new_bal_c bigint"

    def final_state(order):
        d = str(tmp_path / f"state_{order}")
        apply = cdc_apply_batch(d, merge_partitions=2)
        batches = [rows_a, rows_b] if order == "ab" else [rows_b, rows_a]
        for i, rows in enumerate(batches):
            apply(spark.createDataFrame(rows, schema), i)
        return {tuple(r) for r in spark.read.parquet(d).collect()}

    ab = final_state("ab")
    ba = final_state("ba")
    assert ab == ba
    # key 1: seq 20 delete wins over seq 10 upsert; key 2: seq 5 delete
    # wins over seq 3 upsert — both end as tombstones
    assert ab == {(1, 20, "D", 0), (2, 5, "D", 0)}

    # re-deliver epoch 0: state must not change
    d = str(tmp_path / "state_redeliver")
    apply = cdc_apply_batch(d, merge_partitions=2)
    apply(spark.createDataFrame(rows_a, schema), 0)
    before = {tuple(r) for r in spark.read.parquet(d).collect()}
    apply(spark.createDataFrame(rows_b, schema), 0)  # same epoch id
    assert {tuple(r) for r in spark.read.parquet(d).collect()} == before


def test_cdc_stream_restart_is_noop(spark, sf_dir):
    """Re-running the availableNow CDC stream against the SAME
    checkpoint with no new input files must not change the state
    table (checkpoint offsets + epoch markers make the restart a
    no-op, the crash-recovery contract)."""
    import hashlib

    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_cdc_apply,
    )

    first = {tuple(r) for r in q_stream_cdc_apply(spark, sf_dir).collect()}
    # second invocation restages input deterministically and replays
    # from a FRESH checkpoint (the op rmtree's its base) — to test the
    # restart path, drive the stream again manually on the surviving
    # state with the same checkpoint
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/cdc"
    from etl_dagster_service_crawler_spark.streaming.cdc import cdc_apply_batch

    stream = (
        spark.readStream.schema("key bigint, seq bigint, op string, new_bal_c bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    state_before = {
        tuple(r) for r in spark.read.parquet(f"{base}/state").collect()
    }
    q = (
        stream.writeStream.foreachBatch(cdc_apply_batch(f"{base}/state"))
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    state_after = {
        tuple(r) for r in spark.read.parquet(f"{base}/state").collect()
    }
    assert state_after == state_before
    assert first  # the op returned data on the first pass


def test_publish_swap_survives_crash_between_renames(spark, tmp_path):
    """The state publish must keep a recoverable copy at every instant:
    a crash between 'old aside' and 'tmp in' leaves only state_old, and
    the next applied_epochs() call restores it — the previous
    rmtree+rename pair lost both state and epoch marker at that point."""
    from etl_dagster_service_crawler_spark.streaming.rollup import (
        _EPOCH_MARKER,
        applied_epochs,
        publish_swap,
        recover_swap,
    )

    live = str(tmp_path / "state")
    tmp = live + "_tmp"
    os.makedirs(tmp)
    with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
        f.write("0 1")
    publish_swap(tmp, live)
    assert applied_epochs(live) == {0, 1}
    assert not os.path.exists(live + "_old")

    # simulate the crash window: old moved aside, tmp never renamed in
    os.rename(live, live + "_old")
    assert not os.path.exists(live)
    recover_swap(live)
    assert applied_epochs(live) == {0, 1}
    assert not os.path.exists(live + "_old")


def test_quarantine_router_epoch_overwrite_idempotent(spark, tmp_path):
    """Re-writing the same epoch subdir (at-least-once re-delivery, or
    a crash between the good and bad sink writes) must not double-count
    rows in either sink."""
    good_dir = str(tmp_path / "good")
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    for _ in range(2):  # same epoch delivered twice
        df.write.mode("overwrite").parquet(f"{good_dir}/epoch=0")
    got = (
        spark.read.schema("doc_id bigint")
        .option("recursiveFileLookup", "true")
        .parquet(good_dir)
    )
    assert got.count() == 5


def test_stream_interval_attrib_equals_batch(spark, sf_dir):
    """r9 streaming twin: the availableNow drain of the stream-static
    interval attribution equals the batch join_interval_overlap row
    set exactly (stateless equi join commutes with streaming)."""
    from etl_dagster_service_crawler_spark.workloads.joins_wl import (
        q_join_interval_overlap,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_interval_attrib,
    )

    batch = {
        (r["click_id"], r["view_id"], r["lag_us"])
        for r in q_join_interval_overlap(spark, sf_dir).collect()
    }
    streamed = {
        (r["click_id"], r["view_id"], r["lag_us"])
        for r in q_stream_interval_attrib(spark, sf_dir).collect()
    }
    assert streamed == batch and batch


def test_stream_minhash_dedup_equals_batch_pipeline(spark, sf_dir):
    """The r11 streaming near-dup twin: availableNow drain over the
    4-file key-hashed document stream must label every doc exactly
    like the batch pipeline_minhash_dedup (same representative, same
    is_dup) — batch-boundary invariance, not just row counts."""
    from etl_dagster_service_crawler_spark.workloads.llm import (
        q_pipeline_minhash_dedup,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_minhash_dedup,
    )

    batch = {
        (r["doc_id"], r["label"], r["is_dup"])
        for r in q_pipeline_minhash_dedup(spark, sf_dir).collect()
    }
    streamed = {
        (r["doc_id"], r["label"], r["is_dup"])
        for r in q_stream_minhash_dedup(spark, sf_dir).collect()
    }
    assert streamed == batch
    assert any(d for _i, _l, d in batch), "fixture should contain near-dups"


def test_stream_minhash_ingest_epoch_redelivery_idempotent(spark, sf_dir):
    """foreachBatch is at-least-once: re-delivering an ALREADY-APPLIED
    epoch must leave the state byte-stable (same pair set, same band
    index rows), and a restart with the same checkpoint must add no
    epochs."""
    import hashlib

    from etl_dagster_service_crawler_spark.streaming.minhash import (
        _read_state,
        BANDS_SCHEMA,
        minhash_dedup_ingest,
        read_verified_pairs,
    )
    from etl_dagster_service_crawler_spark.workloads.llm import (
        MINHASH_VERIFY_JACCARD_BP,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_minhash_dedup,
    )

    # drain once (rebuilds state from scratch under /tmp)
    q_stream_minhash_dedup(spark, sf_dir).collect()
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/minhash_dedup"
    state = f"{base}/state"

    pairs_before = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in read_verified_pairs(spark, state).collect()
    }
    bands_before = spark.read.parquet(f"{state}/bands").count()

    # re-deliver epoch 0's batch verbatim (the at-least-once case):
    # epoch-subdir overwrite must rewrite identical content
    epoch0 = (
        spark.read.schema(BANDS_SCHEMA + ", epoch int")
        .parquet(f"{state}/bands")
        .where("epoch = 0")
        .select("doc_id")
        .distinct()
    )
    batch0 = (
        spark.read.parquet(f"{base}/in")
        .join(epoch0, "doc_id")
    )
    minhash_dedup_ingest(state, MINHASH_VERIFY_JACCARD_BP)(batch0, 0)

    pairs_after = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in read_verified_pairs(spark, state).collect()
    }
    assert pairs_after == pairs_before
    assert spark.read.parquet(f"{state}/bands").count() == bands_before

    # restart with the SAME checkpoint: no new epochs, state unchanged
    docs_schema = spark.read.parquet(f"{base}/in").schema
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    q = (
        stream.writeStream.foreachBatch(
            minhash_dedup_ingest(state, MINHASH_VERIFY_JACCARD_BP)
        )
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    pairs_restart = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in read_verified_pairs(spark, state).collect()
    }
    assert pairs_restart == pairs_before
    assert _read_state(spark, state, "bands", BANDS_SCHEMA).count() == bands_before


def test_minhash_state_compaction_preserves_semantics(spark, sf_dir):
    """Compacting the per-epoch state into one bucketed epoch must
    leave the pair set and the band index IDENTICAL, and a further
    ingest over the compacted state must behave exactly like one over
    the epoch chain (new candidates still probe the full index)."""
    import hashlib
    import os

    from etl_dagster_service_crawler_spark.streaming.minhash import (
        BANDS_SCHEMA,
        _read_state,
        compact_minhash_state,
        minhash_dedup_ingest,
        read_verified_pairs,
    )
    from etl_dagster_service_crawler_spark.workloads.llm import (
        MINHASH_VERIFY_JACCARD_BP,
        q_pipeline_minhash_dedup,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_minhash_dedup,
    )

    q_stream_minhash_dedup(spark, sf_dir).collect()
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/minhash_dedup"
    state = f"{base}/state"

    pairs_before = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in read_verified_pairs(spark, state).collect()
    }
    bands_before = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in _read_state(spark, state, "bands", BANDS_SCHEMA).collect()
    }
    n_epochs = len([
        e for e in os.listdir(f"{state}/bands") if e.startswith("epoch=")
    ])
    assert n_epochs > 1

    compact_minhash_state(spark, state)
    for sub in ("bands", "hv", "pairs"):
        eps = [e for e in os.listdir(f"{state}/{sub}")
               if e.startswith("epoch=")]
        assert eps == ["epoch=-1"], f"{sub} not compacted: {eps}"
    assert {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in read_verified_pairs(spark, state).collect()
    } == pairs_before
    assert {
        (r["doc_id"], r["band"], r["band_key"])
        for r in _read_state(spark, state, "bands", BANDS_SCHEMA).collect()
    } == bands_before

    # ingest over the compacted state: re-delivering a batch of docs
    # ALREADY in the index must discover exactly the already-known
    # pairs among them (probing works across the compaction boundary)
    docs = spark.read.parquet(f"{base}/in").limit(200)
    minhash_dedup_ingest(state, MINHASH_VERIFY_JACCARD_BP)(docs, 999)
    after = {
        (r["doc_a"], r["doc_b"], r["jaccard_bp"])
        for r in read_verified_pairs(spark, state).collect()
    }
    assert after == pairs_before  # nothing new, nothing lost

    # and the final labeling still equals the batch pipeline
    batch = {
        (r["doc_id"], r["label"], r["is_dup"])
        for r in q_pipeline_minhash_dedup(spark, sf_dir).collect()
    }
    from etl_dagster_service_crawler_spark.operators.dedup import (
        cc_label_propagation,
    )
    from pyspark.sql import functions as F

    pairs = read_verified_pairs(spark, state)
    d = spark.read.parquet(f"{base}/in").select("doc_id")
    bh = F.concat_ws("-", F.col("doc_a"), F.col("doc_b"))
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"), bh.alias("bh"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id"), bh.alias("bh")))
        .unionByName(d.select(
            "doc_id", F.concat(F.lit("self-"), F.col("doc_id")).alias("bh")))
    )
    labeled = {
        (r["doc_id"], r["label"], r["is_dup"])
        for r in cc_label_propagation(members, "doc_id", n_edges=2000)
        .select("doc_id", "label", "is_dup").collect()
    }
    assert labeled == batch


def test_minhash_compaction_second_generation(spark, sf_dir):
    """Compacting twice: the second pass folds epoch=-1 plus any newer
    epochs into epoch=-2 without loss (the old generation is never
    deleted before the new one exists)."""
    import hashlib
    import os

    from etl_dagster_service_crawler_spark.streaming.minhash import (
        compact_minhash_state,
        minhash_dedup_ingest,
        read_verified_pairs,
    )
    from etl_dagster_service_crawler_spark.workloads.llm import (
        MINHASH_VERIFY_JACCARD_BP,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_minhash_dedup,
    )

    q_stream_minhash_dedup(spark, sf_dir).collect()
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/minhash_dedup"
    state = f"{base}/state"
    want = {
        (r["doc_a"], r["doc_b"]) for r in read_verified_pairs(spark, state).collect()
    }
    compact_minhash_state(spark, state)
    # one more epoch lands after the first compaction...
    docs = spark.read.parquet(f"{base}/in").limit(100)
    minhash_dedup_ingest(state, MINHASH_VERIFY_JACCARD_BP)(docs, 1000)
    # ...then the second compaction folds (-1, 1000) into -2
    compact_minhash_state(spark, state)
    eps = sorted(os.listdir(f"{state}/pairs"))
    assert eps == ["epoch=-2"], eps
    got = {
        (r["doc_a"], r["doc_b"]) for r in read_verified_pairs(spark, state).collect()
    }
    assert got == want


def test_stream_minhash_dedup_batch_boundary_invariance(spark, sf_dir):
    """The structural claim, stressed: 1-file (one batch) and 8-file
    drains must label identically to the default 4-file drain — the
    accumulated pair set cannot depend on how files slice into
    micro-batches."""
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_minhash_dedup,
    )

    def labels(n_files):
        return {
            (r["doc_id"], r["label"], r["is_dup"])
            for r in q_stream_minhash_dedup(spark, sf_dir, n_files=n_files)
            .collect()
        }

    one = labels(1)
    assert labels(8) == one
    assert labels(4) == one


def test_stream_minhash_survives_mid_drain_stop_and_resume(spark, sf_dir):
    """Chaos case: the stream is STOPPED mid-drain (after >=1 epoch,
    before all 4), then restarted on the same checkpoint. The resumed
    drain must complete the state exactly — final labeling equals the
    batch pipeline — proving checkpoint + epoch-dir idempotence
    compose under a real interruption, not just a clean restart."""
    import hashlib
    import os
    import shutil
    import time

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.minhash import (
        minhash_dedup_ingest,
        read_verified_pairs,
    )
    from etl_dagster_service_crawler_spark.workloads.llm import (
        MINHASH_VERIFY_JACCARD_BP,
        minhash_label_members,
        q_pipeline_minhash_dedup,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/minhash_chaos"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(4, "doc_id").write.parquet(f"{base}/in")
    state = f"{base}/state"

    def start():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        return (
            stream.writeStream.foreachBatch(
                minhash_dedup_ingest(state, MINHASH_VERIFY_JACCARD_BP)
            )
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    # kill as soon as at least one epoch has landed but before the
    # drain finishes (4 epochs); if the machine outruns us and all 4
    # land, the restart still must be a no-op — both paths asserted
    deadline = time.time() + 120
    while time.time() < deadline:
        bands = f"{state}/bands"
        if os.path.isdir(bands) and any(
            e.startswith("epoch=") for e in os.listdir(bands)
        ):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    q2 = start()  # resume on the same checkpoint
    assert q2.awaitTermination(240)

    got = {
        (r["doc_id"], r["label"], r["is_dup"])
        for r in minhash_label_members(
            read_verified_pairs(spark, state), docs.select("doc_id")
        ).collect()
    }
    want = {
        (r["doc_id"], r["label"], r["is_dup"])
        for r in q_pipeline_minhash_dedup(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_pack_sequences_batch_boundary_invariance(spark, sf_dir):
    """r12: the packed mapping must not depend on how the ordered
    manifest slices into micro-batches — 1 file (degenerate single
    batch) and 8 files yield the 4-file entry's exact mapping, which
    itself equals the batch query (shared oracle)."""
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        q_pack_sequences,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        q_stream_pack_sequences,
    )

    want = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"], r["seq_first"],
                      r["seq_last"], r["crosses_boundary"])
        for r in q_pack_sequences(spark, sf_dir).collect()
    }
    for nf in (1, 8):
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_tok"], r["seq_first"],
                          r["seq_last"], r["crosses_boundary"])
            for r in q_stream_pack_sequences(spark, sf_dir, n_files=nf).collect()
        }
        assert got == want, f"n_files={nf} diverged from the batch mapping"


def test_stream_pack_survives_mid_drain_stop_and_resume(spark, sf_dir):
    """Chaos case (the stream_minhash discipline): stop the drain
    after >=1 epoch landed, restart on the same checkpoint; the
    resumed drain must complete the mapping exactly — running offsets
    compose across the interruption because epoch facts of completed
    epochs are immutable and the interrupted epoch re-delivers
    idempotently."""
    import hashlib
    import os
    import shutil
    import time

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.packing import (
        pack_ingest,
        read_packed,
    )
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        q_pack_sequences,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        write_ordered_slices,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/pack_chaos"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    write_ordered_slices(docs, f"{base}/in", 4)
    state = f"{base}/state"

    def start():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        return (
            stream.writeStream.foreachBatch(pack_ingest(state))
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        tok = f"{state}/tok"
        if os.path.isdir(tok) and any(
            e.startswith("epoch=") for e in os.listdir(tok)
        ):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    q2 = start()
    assert q2.awaitTermination(240)

    got = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"])
        for r in read_packed(spark, state).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"])
        for r in q_pack_sequences(spark, sf_dir).collect()
    }
    assert got == want


def test_pack_ingest_rejects_misordered_manifest(spark, sf_dir):
    """r12 ADVICE/verdict: a manifest that delivers a doc_id range out
    of order (backfilled slice, mis-stamped mtime) must fail the epoch
    LOUDLY before any state lands — never silently pack offsets that
    diverge from the batch oracle."""
    import hashlib
    import os
    import shutil

    import pytest
    from pyspark.errors import StreamingQueryException

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.packing import (
        pack_ingest,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        write_ordered_slices,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/pack_misorder"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("max(doc_id) * 3 DIV 4")).first()[0]
    lo = docs.where(F.col("doc_id") <= cut)
    hi = docs.where(F.col("doc_id") > cut)
    # the HIGH range lands first (name 0000), the LOW range second —
    # exactly the backfilled-slice shape the contract forbids
    write_ordered_slices(hi, f"{base}/in", 1)
    write_ordered_slices(lo, f"{base}/in", 1, first_index=1)
    state = f"{base}/state"
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    q = (
        stream.writeStream.foreachBatch(pack_ingest(state))
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="ordering contract"):
        q.awaitTermination(180)
    # the violating epoch landed NOTHING: only epoch 0's state exists
    assert sorted(os.listdir(f"{state}/tok")) == ["epoch=0"]
    assert sorted(
        e for e in os.listdir(f"{state}/out") if e.startswith("epoch=")
    ) == ["epoch=0"]


def test_pack_state_compaction_and_resume(spark, sf_dir):
    """r12 verdict item 5: folding the per-epoch token facts into one
    generation file between drains must not disturb the running offset
    — a second tranche ingested AFTER the compaction packs exactly
    like the single batch query over the whole corpus, and the fact
    read is bounded by generations, not epochs."""
    import hashlib
    import os
    import shutil

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.packing import (
        compact_pack_state,
        read_packed,
    )
    from etl_dagster_service_crawler_spark.streaming.packing import (
        pack_ingest,
    )
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        q_pack_sequences,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        write_ordered_slices,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/pack_compact"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("max(doc_id) * 3 DIV 4")).first()[0]
    lo = docs.where(F.col("doc_id") <= cut)
    hi = docs.where(F.col("doc_id") > cut)
    write_ordered_slices(lo, f"{base}/in", 3)
    state = f"{base}/state"

    def drain():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        q = (
            stream.writeStream.foreachBatch(pack_ingest(state))
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(240)

    drain()  # 3 epochs of the low range
    assert len(os.listdir(f"{state}/tok")) == 3
    compact_pack_state(spark, state)
    assert sorted(os.listdir(f"{state}/tok")) == ["epoch=-1"]

    # a RESET checkpoint restarting epoch numbering against this state
    # would write under an already-folded epoch id — reader-invisible,
    # deleted by the next compaction — so it must fail loudly instead
    import pytest

    with pytest.raises(ValueError, match="already folded"):
        pack_ingest(state)(hi, 0)

    # the later tranche lands after the fold; the resumed ingest's
    # base offset must come from the compacted generation
    write_ordered_slices(hi, f"{base}/in", 1, first_index=3)
    drain()

    got = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"], r["seq_first"],
                      r["seq_last"], r["crosses_boundary"])
        for r in read_packed(spark, state).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"], r["seq_first"],
                      r["seq_last"], r["crosses_boundary"])
        for r in q_pack_sequences(spark, sf_dir).collect()
    }
    assert got == want
    # misordering is still caught ACROSS the compaction boundary: the
    # guard's prior-max survives the fold
    import pytest

    with pytest.raises(ValueError, match="ordering contract"):
        pack_ingest(state)(lo.limit(5), 99)


def test_read_epoch_state_nested_comma_schema(spark, tmp_path):
    """r12 ADVICE: the pinned-schema reader must parse DDL with the
    real parser — a nested comma type (map<string,bigint>) would shred
    into garbage column names under schema.split(',')."""
    import os

    from etl_dagster_service_crawler_spark.streaming.epoch_state import (
        read_epoch_state,
    )

    root = str(tmp_path / "state")
    schema = "epoch bigint, m map<string,bigint>, note string"
    spark.createDataFrame(
        [({"a": 1, "b": 2}, "x")], "m map<string,bigint>, note string"
    ).write.parquet(os.path.join(root, "facts", "epoch=0"))
    got = read_epoch_state(spark, root, "facts", schema)
    assert got.columns == ["epoch", "m", "note"]
    row = got.first()
    assert row["epoch"] == 0 and row["m"] == {"a": 1, "b": 2}
    assert row["note"] == "x"


def test_stream_crawl_record_matches_batch_and_redelivery_idempotent(
    spark, sf_dir
):
    """r13: the terminal record at ingest. The drained job_list
    read-back equals the batch entry row-for-row (shared transform ⇒
    shared oracle), BOTH dual sinks land per epoch, and re-delivering
    an epoch (foreachBatch is at-least-once) rewrites identical bytes
    — state after a duplicate delivery is value-identical."""
    import hashlib
    import os

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.workloads.sources_wl import (
        q_pipeline_crawl_record,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        crawl_record_ingest,
        q_stream_crawl_record,
    )

    got = {
        (r["doc_id"], r["record"])
        for r in q_stream_crawl_record(spark, sf_dir).collect()
    }
    want = {
        (r["doc_id"], r["record"])
        for r in q_pipeline_crawl_record(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    out = f"/tmp/spark_graft_streams/{tag}/crawl_record/out"
    # both of the reference's sinks landed, one dir per epoch
    job_eps = sorted(os.listdir(f"{out}/job_list"))
    com_eps = sorted(os.listdir(f"{out}/com_url"))
    assert job_eps == com_eps and len(job_eps) >= 1
    side = {
        r["company_url"]
        for r in spark.read.schema("company_url string")
        .json(f"{out}/com_url")
        .collect()
    }
    assert len(side) > 0

    # re-deliver epoch 0 with ITS OWN original rows (recovered from the
    # landed sink, so this works however availableNow sliced the files):
    # byte-idempotent state
    ep0_ids = {
        r["doc_id"]
        for r in spark.read.schema("doc_id bigint, record string")
        .json(f"{out}/job_list/epoch=0")
        .collect()
    }
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang")
        .where(F.col("doc_id").isin(*ep0_ids))
    )
    before = got
    crawl_record_ingest(out)(docs, 0)
    after = {
        (r["doc_id"], r["record"])
        for r in spark.read.schema("doc_id bigint, record string")
        .json(f"{out}/job_list")
        .select("doc_id", "record")
        .collect()
    }
    assert after == before
    side_after = {
        r["company_url"]
        for r in spark.read.schema("company_url string")
        .json(f"{out}/com_url")
        .collect()
    }
    assert side_after == side


def test_compaction_crash_window_never_doubles_sum_consumers(spark, sf_dir):
    """r13 review finding: a crash between the compacted generation's
    rename and the superseded-dir deletions must NOT double facts for
    SUM consumers — the generation's _FOLDED marker makes readers
    filter lingering superseded dirs, so the packing base offset stays
    exact through the crash window, a resumed ingest packs correctly,
    and the NEXT compaction folds the leftovers away (transitively,
    across a second interrupted generation)."""
    import hashlib
    import os
    import shutil

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.epoch_state import (
        read_epoch_state,
    )
    from etl_dagster_service_crawler_spark.streaming.packing import (
        _TOK_SCHEMA,
        compact_pack_state,
        pack_ingest,
        read_packed,
    )
    from etl_dagster_service_crawler_spark.workloads.corpus_wl import (
        q_pack_sequences,
    )
    from etl_dagster_service_crawler_spark.workloads.streaming_wl import (
        write_ordered_slices,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/pack_crashwin"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("max(doc_id) * 3 DIV 4")).first()[0]
    lo = docs.where(F.col("doc_id") <= cut)
    hi = docs.where(F.col("doc_id") > cut)
    write_ordered_slices(lo, f"{base}/in", 3)
    state = f"{base}/state"

    def drain():
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        q = (
            stream.writeStream.foreachBatch(pack_ingest(state))
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(240)

    drain()  # epochs 0..2
    tok = f"{state}/tok"
    # simulate the crash window: stash one epoch dir, compact, put the
    # superseded dir BACK (as if the deletion loop died before it)
    stash = f"{base}/stash"
    shutil.copytree(os.path.join(tok, "epoch=0"), stash)
    compact_pack_state(spark, state)
    shutil.copytree(stash, os.path.join(tok, "epoch=0"))
    assert sorted(os.listdir(tok))[:2] == ["epoch=-1", "epoch=0"]

    # the reader must see each fact ONCE (epoch=0 is in -1's _FOLDED)
    total_tokens = q_pack_sequences(spark, sf_dir).where(
        F.col("doc_id") <= cut
    ).agg(F.sum("n_tokens")).first()[0]
    facts_sum = read_epoch_state(spark, state, "tok", _TOK_SCHEMA).agg(
        F.sum("n_tokens")
    ).first()[0]
    assert facts_sum == total_tokens, "crash window doubled the base facts"

    # resumed ingest over the crash-window state packs exactly
    write_ordered_slices(hi, f"{base}/in", 1, first_index=3)
    drain()
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"])
        for r in read_packed(spark, state).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"])
        for r in q_pack_sequences(spark, sf_dir).collect()
    }
    assert got == want

    # the next compaction folds the leftovers transitively: one
    # generation remains, facts still exact
    compact_pack_state(spark, state)
    eps = sorted(e for e in os.listdir(tok) if e.startswith("epoch="))
    assert eps == ["epoch=-2"], eps
    assert read_epoch_state(spark, state, "tok", _TOK_SCHEMA).agg(
        F.sum("n_tokens")
    ).first()[0] == q_pack_sequences(spark, sf_dir).agg(
        F.sum("n_tokens")
    ).first()[0]


def test_pack_redelivery_content_mismatch_fails_loudly(spark, sf_dir):
    """r13 review finding follow-up: the persisted (min_doc, max_doc)
    fact is load-bearing — re-delivering a committed epoch id with a
    DIFFERENT doc range (checkpoint/source disagreement) must refuse to
    overwrite committed state, while a faithful re-delivery stays
    idempotent."""
    import hashlib
    import shutil

    import pytest

    from etl_dagster_service_crawler_spark.io.tables import load_table
    from etl_dagster_service_crawler_spark.streaming.packing import (
        pack_ingest,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_streams/{tag}/pack_redeliver"
    shutil.rmtree(base, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("max(doc_id) DIV 2")).first()[0]
    lo = docs.where(F.col("doc_id") <= cut)
    state = f"{base}/state"
    apply = pack_ingest(state)
    apply(lo, 0)
    apply(lo, 0)  # faithful re-delivery: idempotent, no error
    with pytest.raises(ValueError, match="re-delivery mismatch"):
        # same epoch id, DETERMINISTICALLY different doc range (a
        # limit() could by chance include both extremes and slip past
        # the min/max check)
        apply(lo.where(F.col("doc_id") > cut // 2), 0)
    with pytest.raises(ValueError, match="re-delivery mismatch"):
        # same doc RANGE but different content (slice rewritten in
        # place): caught by the token-total component of the fact
        apply(
            lo.select("doc_id", F.concat_ws(" ", "text", "text").alias("text")),
            0,
        )


def test_epoch_state_double_interrupted_compaction(spark, tmp_path, monkeypatch):
    """r13 second-review hardening, stressed: TWO consecutive
    compactions each crash between the generation rename and the
    superseded-dir deletions (simulated by no-op'ing rmtree for epoch
    dirs). The transitive _FOLDED markers must keep every fact counted
    EXACTLY once for a SUM consumer through both crash windows, and a
    final healthy compaction must fold all leftovers into one
    generation without loss."""
    import shutil

    from etl_dagster_service_crawler_spark.streaming.epoch_state import (
        compact_epoch_dirs,
        live_epoch_dirs,
        read_epoch_state,
    )

    root = str(tmp_path / "state")
    sub = "facts"
    schema = "epoch bigint, v bigint"
    # distinct powers of two: ANY duplication or loss shows in the sum
    for ep, v in [(0, 1), (1, 2), (2, 4)]:
        spark.createDataFrame([(v,)], "v bigint").write.parquet(
            f"{root}/{sub}/epoch={ep}"
        )

    def total():
        return (
            read_epoch_state(spark, root, sub, schema)
            .agg(F.sum("v"))
            .first()[0]
        )

    assert total() == 7

    real_rmtree = shutil.rmtree

    def crashy_rmtree(path, *a, **k):
        # the staging dir must still clean up (start-of-run hygiene);
        # superseded epoch-dir deletions "crash" (never happen)
        if "_compact_tmp" in str(path):
            return real_rmtree(path, *a, **k)
        return None

    monkeypatch.setattr(shutil, "rmtree", crashy_rmtree)
    compact_epoch_dirs(spark, root, sub, schema)  # crashes pre-deletion
    eps = sorted(os.listdir(f"{root}/{sub}"))
    assert "epoch=-1" in eps and "epoch=0" in eps  # crash window is live
    assert live_epoch_dirs(f"{root}/{sub}") == ["epoch=-1"]
    assert total() == 7  # no double-count through the window

    # a new epoch lands beside the mess, then a SECOND interrupted fold
    spark.createDataFrame([(8,)], "v bigint").write.parquet(
        f"{root}/{sub}/epoch=3"
    )
    assert total() == 15
    compact_epoch_dirs(spark, root, sub, schema)  # crashes again
    assert "epoch=-2" in sorted(os.listdir(f"{root}/{sub}"))
    assert live_epoch_dirs(f"{root}/{sub}") == ["epoch=-2"]
    assert total() == 15  # transitive marker: 0..2 still filtered

    # healing: a healthy compaction folds every leftover away
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    compact_epoch_dirs(spark, root, sub, schema)
    eps = sorted(
        e for e in os.listdir(f"{root}/{sub}") if e.startswith("epoch=")
    )
    assert eps == ["epoch=-3"], eps
    assert total() == 15
