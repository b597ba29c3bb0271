"""Tests for observe-based telemetry and the error-budget listener
(reference K4/Q1/O2)."""

from __future__ import annotations

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.io.observability import (
    ErrorBudgetListener,
    observe_quality,
    observe_stream_quality,
)


def _frame(spark):
    return spark.createDataFrame(
        [
            Row(a="x", b="y"),
            Row(a="", b="y"),
            Row(a="", b=""),
        ]
    )


def test_batch_observation_counts_empty_fields(spark):
    df, obs = observe_quality(_frame(spark), ["a", "b"])
    assert df.count() == 3
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_empty_fields"] == 3


def test_error_budget_listener_stops_stream(spark, sf_dir):
    from etl_dagster_service_crawler_spark.streaming.ingest import stream_events

    listener = ErrorBudgetListener(spark, max_errors=1, field="n_rows")
    spark.streams.addListener(listener)
    try:
        s = stream_events(spark, sf_dir).select("event_id", "event_type")
        observed = observe_stream_quality(s, ["event_type"])
        q = (
            observed.writeStream.format("memory")
            .queryName("obs_out")
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while q.isActive and time.time() < deadline:
            time.sleep(0.2)
        # every batch has rows, so budget=1 trips on the first progress
        # event and the listener stops the query
        assert not q.isActive
        assert listener.tripped
    finally:
        spark.streams.removeListener(listener)


def test_frame_fingerprint_normalizes_representations():
    """The local verifier's value hash must be identical for list vs
    ndarray cells (Arrow vs non-Arrow toPandas), row order, and column
    order — and must distinguish genuinely different values."""
    import numpy as np
    import pandas as pd

    import tools.verify_local as vl

    a = pd.DataFrame({"x": [1, 2], "arr": [[1, 2], [3, 4]]})
    b = pd.DataFrame(
        {"arr": [np.array([3, 4]), np.array([1, 2])], "x": [2, 1]}
    )
    na, ca, ha = vl.frame_fingerprint(a)
    nb, cb, hb = vl.frame_fingerprint(b)
    assert (na, ca, ha) == (nb, cb, hb)

    c = pd.DataFrame({"x": [1, 2], "arr": [[1, 2], [3, 5]]})
    assert vl.frame_fingerprint(c)[2] != ha

    # NaN and float round-trip stability
    d = pd.DataFrame({"v": [float("nan"), 0.1 + 0.2]})
    e = pd.DataFrame({"v": [0.1 + 0.2, float("nan")]})
    assert vl.frame_fingerprint(d)[2] == vl.frame_fingerprint(e)[2]
