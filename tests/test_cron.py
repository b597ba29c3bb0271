"""Calendar cron scheduling (streaming/cron.py) — fake-clock tests:
every next_fire call uses a pinned `after`, so tz-local midnights,
month rollovers and DST edges are crossed without waiting for one.
Parity target: the reference's ScheduleDefinition
(cron_schedule="*/2 * * * *", execution_timezone="Asia/Taipei")."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from etl_dagster_service_crawler_spark.streaming.cron import (
    next_fire,
    parse_cron,
)


def utc(*args) -> datetime:
    return datetime(*args, tzinfo=timezone.utc)


def test_parse_rejects_malformed():
    with pytest.raises(ValueError, match="5 fields"):
        parse_cron("* * * *")
    with pytest.raises(ValueError, match="outside"):
        parse_cron("61 * * * *")
    with pytest.raises(ValueError, match="inverted"):
        parse_cron("30-10 * * * *")
    with pytest.raises(ValueError, match="step"):
        parse_cron("*/0 * * * *")


def test_every_two_minutes_reference_schedule():
    spec = parse_cron("*/2 * * * *")
    # */2 fires on even minutes regardless of tz offset (Taipei is
    # whole-hour): from 12:03:30Z the next even minute is 12:04
    assert next_fire(spec, utc(2026, 8, 14, 12, 3, 30), "Asia/Taipei") == utc(
        2026, 8, 14, 12, 4
    )
    # mid-minute on a matching minute still advances (strictly after)
    assert next_fire(spec, utc(2026, 8, 14, 12, 4, 10), "Asia/Taipei") == utc(
        2026, 8, 14, 12, 6
    )


def test_fire_crosses_tz_local_midnight():
    """23:50 Taipei on Mar 1 -> the 00:30 daily fire lands on Taipei
    Mar 2, which is still Mar 1 in UTC — the day fields must be
    evaluated on LOCAL wall time."""
    spec = parse_cron("30 0 * * *")
    after = utc(2026, 3, 1, 15, 50)  # 23:50 Taipei, Mar 1
    fire = next_fire(spec, after, "Asia/Taipei")
    assert fire == utc(2026, 3, 1, 16, 30)  # 00:30 Taipei, Mar 2


def test_month_rollover_first_of_month():
    spec = parse_cron("0 0 1 * *")
    fire = next_fire(spec, utc(2026, 2, 15, 0, 0), "Asia/Taipei")
    # next local 1st-at-midnight: Mar 1 00:00 Taipei = Feb 28 16:00 UTC
    assert fire == utc(2026, 2, 28, 16, 0)


def test_day_of_week_names():
    spec = parse_cron("0 9 * * mon")
    # 2026-08-14 is a Friday; next Monday is Aug 17
    fire = next_fire(spec, utc(2026, 8, 14, 12, 0), "UTC")
    assert fire == utc(2026, 8, 17, 9, 0)
    assert fire.weekday() == 0


def test_dom_dow_either_matches_posix_rule():
    spec = parse_cron("0 0 13 * fri")
    # from Wed 2026-08-12: Thu Aug 13 matches via day-of-month even
    # though it is not a Friday — either-field rule, not both
    fire = next_fire(spec, utc(2026, 8, 12, 10, 0), "UTC")
    assert fire == utc(2026, 8, 13, 0, 0)
    # and the dow leg fires next: Friday Aug 14
    fire2 = next_fire(spec, fire, "UTC")
    assert fire2 == utc(2026, 8, 14, 0, 0)


def test_spring_forward_gap_does_not_fire():
    """America/New_York skips 02:00-02:59 on 2026-03-08: a 02:30 daily
    schedule has NO such minute that day, so the fire lands on Mar 9
    02:30 EDT (06:30 UTC)."""
    spec = parse_cron("30 2 * * *")
    fire = next_fire(spec, utc(2026, 3, 8, 5, 0), "America/New_York")
    assert fire == utc(2026, 3, 9, 6, 30)


def test_fall_back_repeat_fires_once():
    """America/New_York repeats 01:00-01:59 on 2026-11-01: the 01:30
    schedule fires on the FIRST occurrence (EDT, 05:30 UTC), and the
    next fire after it is Nov 2 — not the second 01:30 (EST)."""
    spec = parse_cron("30 1 * * *")
    first = next_fire(spec, utc(2026, 11, 1, 4, 0), "America/New_York")
    assert first == utc(2026, 11, 1, 5, 30)  # 01:30 EDT
    second = next_fire(spec, first, "America/New_York")
    assert second == utc(2026, 11, 2, 6, 30)  # 01:30 EST next day


def test_fall_back_after_inside_repeated_hour():
    """`after` strictly INSIDE the repeated hour (06:10 UTC = 01:10 EST,
    the second pass through 01:xx). Minute arithmetic resets fold to 0,
    so a naive scan maps the 01:30 match back to 05:30 UTC — BEFORE
    `after` — and the deploy loop would fire back-to-back ticks (r8
    advice, medium). next_fire must stay strictly forward in absolute
    time: the 01:30 EDT fire already happened, the EST repeat must not
    fire, so the next fire is Nov 2."""
    spec = parse_cron("30 1 * * *")
    after = utc(2026, 11, 1, 6, 10)
    fire = next_fire(spec, after, "America/New_York")
    assert fire > after
    assert fire == utc(2026, 11, 2, 6, 30)
    # an INTERVAL-LIKE schedule is the opposite case (cron's wildcard
    # DST rule): */15 keeps firing at every absolute 15 minutes through
    # the repeated hour — 06:15 UTC (01:15 EST), not a silent hour
    spec15 = parse_cron("*/15 * * * *")
    fire15 = next_fire(spec15, utc(2026, 11, 1, 6, 10), "America/New_York")
    assert fire15 == utc(2026, 11, 1, 6, 15)  # 01:15 EST second pass


def test_fall_back_wildcard_fires_every_absolute_interval():
    """Cron's wildcard DST rule (the reference's own */2 schedule):
    star-based minute/hour specs never go silent across a fall-back —
    ticks stay exactly 2 minutes apart in ABSOLUTE time through both
    passes of the repeated hour, with no back-to-back storm."""
    from datetime import timedelta

    spec = parse_cron("*/2 * * * *")
    cur = utc(2026, 11, 1, 4, 57)
    ticks = []
    while cur < utc(2026, 11, 1, 7, 5):
        cur = next_fire(spec, cur, "America/New_York")
        ticks.append(cur)
    assert {b - a for a, b in zip(ticks, ticks[1:])} == {
        timedelta(minutes=2)
    }
    # both occurrences of wall 01:30 fire (EDT then EST)
    assert utc(2026, 11, 1, 5, 30) in ticks
    assert utc(2026, 11, 1, 6, 30) in ticks


def test_fall_back_hourly_at_minute_fires_both_passes():
    """'30 * * * *' has a wildcard hour: the repeated wall 01:30 is two
    distinct absolute hours and BOTH fire — while the fixed '30 1'
    twin (test above) fires once. The field text decides, matching
    vixie cron."""
    spec = parse_cron("30 * * * *")
    first = next_fire(spec, utc(2026, 11, 1, 5, 0), "America/New_York")
    second = next_fire(spec, first, "America/New_York")
    third = next_fire(spec, second, "America/New_York")
    assert first == utc(2026, 11, 1, 5, 30)  # 01:30 EDT
    assert second == utc(2026, 11, 1, 6, 30)  # 01:30 EST
    assert third == utc(2026, 11, 1, 7, 30)  # 02:30 EST


def test_spring_forward_gap_skips_for_interval_specs_too():
    """The absolute walk handles the spring gap naturally: */30 around
    2026-03-08 07:00 UTC (02:00->03:00 EST jump) stays strictly
    30-absolute-minutes apart; wall 02:30 never exists."""
    from datetime import timedelta

    spec = parse_cron("*/30 * * * *")
    cur = utc(2026, 3, 8, 6, 45)
    ticks = []
    while cur < utc(2026, 3, 8, 8, 15):
        cur = next_fire(spec, cur, "America/New_York")
        ticks.append(cur)
    assert {b - a for a, b in zip(ticks, ticks[1:])} == {
        timedelta(minutes=30)
    }


def test_ranges_lists_steps():
    spec = parse_cron("15,45 8-10/2 * * *")
    t = utc(2026, 8, 14, 8, 20)
    fires = []
    for _ in range(5):
        t = next_fire(spec, t, "UTC")
        fires.append(t)
    assert fires == [
        utc(2026, 8, 14, 8, 45),
        utc(2026, 8, 14, 10, 15),
        utc(2026, 8, 14, 10, 45),
        utc(2026, 8, 15, 8, 15),
        utc(2026, 8, 15, 8, 45),
    ]


def test_never_matching_date_raises():
    with pytest.raises(ValueError, match="never fires"):
        next_fire(parse_cron("0 0 31 2 *"), utc(2026, 1, 1), "UTC")


def test_naive_after_treated_as_utc():
    spec = parse_cron("0 12 * * *")
    aware = next_fire(spec, utc(2026, 8, 14, 1, 0), "UTC")
    naive = next_fire(spec, datetime(2026, 8, 14, 1, 0), "UTC")
    assert aware == naive == utc(2026, 8, 14, 12, 0)
