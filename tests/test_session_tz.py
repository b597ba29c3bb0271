"""Session timezone knob (reference definitions.py:36 pins Asia/Taipei
for its cron; the engine keeps tz configurable, defaulting to UTC for
the oracle contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dagster_service_crawler_spark.session import get_spark


def test_tz_knob_shifts_date_bucket_boundaries(spark):
    """2024-01-01T17:00:00Z is Jan 1 in UTC but already Jan 2 01:00 in
    Asia/Taipei (+08:00) — the reference's local-midnight bucketing
    lands crawl records on a different day than UTC would."""
    try:
        tpe = get_spark(app_name="pytest", tz="Asia/Taipei")
        df = tpe.createDataFrame([("2024-01-01T17:00:00Z",)], "raw string")
        ts = F.to_timestamp("raw")
        row = df.select(
            F.date_format(ts, "yyyy-MM-dd").alias("local_day"),
            F.date_format(F.date_trunc("hour", ts), "HH:mm").alias("hour_start"),
        ).first()
        assert row.local_day == "2024-01-02"
        assert row.hour_start == "01:00"
    finally:
        get_spark(app_name="pytest")  # restore the UTC default

    row = (
        spark.createDataFrame([("2024-01-01T17:00:00Z",)], "raw string")
        .select(F.date_format(F.to_timestamp("raw"), "yyyy-MM-dd").alias("d"))
        .first()
    )
    assert row.d == "2024-01-01"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
