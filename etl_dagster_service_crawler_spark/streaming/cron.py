"""Calendar-aligned cron scheduling — parity with the reference's
schedule definition (reference definitions.py:32-37:
``ScheduleDefinition(cron_schedule="*/2 * * * *",
execution_timezone="Asia/Taipei")``).

Standard 5-field cron (minute hour day-of-month month day-of-week),
evaluated on LOCAL WALL TIME in a named IANA timezone:

- fields support ``*``, single values, ranges ``a-b``, steps ``*/n``
  and ``a-b/n``, and comma lists; month/dow accept 3-letter names
  (jan..dec, sun..sat); dow 0 and 7 both mean Sunday.
- day-of-month vs day-of-week follows POSIX cron: when BOTH are
  restricted the day matches if EITHER does; when only one is
  restricted, that one decides.
- DST: matching is done on the local wall clock. A wall time skipped
  by a spring-forward transition does not fire (there is no such
  minute). A fall-back repeated hour follows cron's wildcard rule:
  FIXED-TIME specs (both minute and hour fields non-star, e.g.
  ``30 1 * * *``) fire a repeated wall time on its first occurrence
  only; INTERVAL-LIKE specs (star-based minute or hour, e.g.
  ``*/2 * * * *`` or ``30 * * * *``) keep firing at every absolute
  interval straight through the repeated hour — a ``*/2`` schedule
  ticks 60 times in the 2-wall-hour fall-back window, never goes
  silent for it. next_fire always moves strictly forward in ABSOLUTE
  time either way.

next_fire() is a pure function of (spec, after) — the deploy loop
sleeps until it, and the fake-clock tests (tests/test_deploy.py) drive
it across tz-local midnights without waiting for one.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

_MONTH_NAMES = {
    n: i + 1
    for i, n in enumerate(
        "jan feb mar apr may jun jul aug sep oct nov dec".split()
    )
}
_DOW_NAMES = {n: i for i, n in enumerate("sun mon tue wed thu fri sat".split())}

_FIELDS = (
    ("minute", 0, 59, {}),
    ("hour", 0, 23, {}),
    ("day_of_month", 1, 31, {}),
    ("month", 1, 12, _MONTH_NAMES),
    ("day_of_week", 0, 7, _DOW_NAMES),
)


def _parse_field(
    text: str, name: str, lo: int, hi: int, names: dict[str, int]
) -> tuple[frozenset[int], bool]:
    """-> (allowed values, restricted?). day_of_week normalizes 7->0."""

    def atom(tok: str) -> int:
        tok = tok.strip().lower()
        if tok in names:
            return names[tok]
        v = int(tok)
        if not lo <= v <= hi:
            raise ValueError(f"cron {name} value {v} outside {lo}..{hi}")
        return v

    allowed: set[int] = set()
    restricted = False
    for part in text.split(","):
        part = part.strip()
        if not part:
            raise ValueError(f"empty item in cron {name} field {text!r}")
        rng, _, step_s = part.partition("/")
        step = int(step_s) if step_s else 1
        if step < 1:
            raise ValueError(f"cron {name} step {step} must be >= 1")
        if rng == "*":
            if not step_s:
                # bare * alone leaves the field unrestricted (but a
                # list like "*,5" is still "everything")
                allowed.update(range(lo, hi + 1))
                continue
            start, end = lo, hi
            restricted = True
        elif "-" in rng:
            a, _, b = rng.partition("-")
            start, end = atom(a), atom(b)
            if start > end:
                raise ValueError(f"cron {name} range {rng!r} is inverted")
            restricted = True
        else:
            start = end = atom(rng)
            restricted = True
        allowed.update(range(start, end + 1, step))
    if name == "day_of_week":
        allowed = {0 if v == 7 else v for v in allowed}
    return frozenset(allowed), restricted


@dataclass(frozen=True)
class CronSpec:
    minute: frozenset[int]
    hour: frozenset[int]
    day_of_month: frozenset[int]
    month: frozenset[int]
    day_of_week: frozenset[int]
    dom_restricted: bool
    dow_restricted: bool
    expr: str
    # Vixie cron's DST rule keys on the FIELD TEXT: a job whose minute
    # or hour field is star-based ('*' or '*/n', incl. in a list) is
    # "wildcard" — it fires at every absolute interval straight through
    # a fall-back repeated hour; fixed-time jobs fire on the first
    # occurrence of a repeated wall time only.
    minute_wildcard: bool = False
    hour_wildcard: bool = False

    @property
    def interval_like(self) -> bool:
        return self.minute_wildcard or self.hour_wildcard

    def day_matches(self, local: datetime) -> bool:
        dom_ok = local.day in self.day_of_month
        # cron dow: 0=Sunday; datetime.weekday(): 0=Monday
        dow_ok = (local.weekday() + 1) % 7 in self.day_of_week
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok  # POSIX either-matches rule
        if self.dom_restricted:
            return dom_ok
        if self.dow_restricted:
            return dow_ok
        return True

    def matches(self, local: datetime) -> bool:
        return (
            local.minute in self.minute
            and local.hour in self.hour
            and local.month in self.month
            and self.day_matches(local)
        )


def parse_cron(expr: str) -> CronSpec:
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(
            f"cron expression needs 5 fields (minute hour dom month dow), "
            f"got {len(parts)}: {expr!r}"
        )
    vals, restr = [], []
    for text, (name, lo, hi, names) in zip(parts, _FIELDS):
        allowed, restricted = _parse_field(text, name, lo, hi, names)
        vals.append(allowed)
        restr.append(restricted)
    def _star_based(text: str) -> bool:
        return any(p.strip().startswith("*") for p in text.split(","))

    return CronSpec(
        minute=vals[0],
        hour=vals[1],
        day_of_month=vals[2],
        month=vals[3],
        day_of_week=vals[4],
        dom_restricted=restr[2],
        dow_restricted=restr[4],
        expr=expr,
        minute_wildcard=_star_based(parts[0]),
        hour_wildcard=_star_based(parts[1]),
    )


def _next_fire_absolute(
    spec: CronSpec, after: datetime, zone: ZoneInfo
) -> datetime:
    """Interval-like (wildcard minute/hour) schedules walk ABSOLUTE
    time: every UTC minute of a day whose local date matches the day
    fields is tested against the wall-clock spec. Both occurrences of
    a fall-back repeated hour are therefore real candidates (cron's
    wildcard-job DST rule) and spring-forward gaps skip naturally —
    no fold arithmetic at all. Non-matching days jump to the next
    local midnight, so the worst case (wildcard minute on a Feb 29
    spec) is ~1460 day-hops + one 25-hour minute walk."""
    utc = (after + timedelta(minutes=1)).replace(
        second=0, microsecond=0
    ).astimezone(timezone.utc)
    one = timedelta(minutes=1)
    for _ in range(366 * 8):
        local = utc.astimezone(zone)
        if not (local.month in spec.month and spec.day_matches(local)):
            nxt = (local + timedelta(days=1)).replace(
                hour=0, minute=0, second=0, microsecond=0, fold=0
            )
            utc = nxt.astimezone(timezone.utc)
            continue
        day = local.date()
        while local.date() == day:
            if spec.matches(local):
                return utc
            utc += one
            local = utc.astimezone(zone)
    raise ValueError(f"cron {spec.expr!r} never fires (no matching date)")


def next_fire(spec: CronSpec, after: datetime, tz: str | ZoneInfo) -> datetime:
    """First absolute instant STRICTLY after `after` whose local wall
    time in `tz` matches the spec. `after` may be naive (assumed UTC)
    or aware. Interval-like specs (wildcard minute or hour field) use
    the absolute-time walk — they fire straight through a fall-back
    repeated hour, like cron's wildcard jobs; fixed-time specs use the
    wall walk below and fire a repeated wall time on its first
    occurrence only. The wall scan jumps whole days on the day fields,
    so worst case (Feb 29 spec) is ~1500 checks, not half a million."""
    zone = ZoneInfo(tz) if isinstance(tz, str) else tz
    if after.tzinfo is None:
        after = after.replace(tzinfo=timezone.utc)
    if spec.interval_like:
        return _next_fire_absolute(spec, after, zone)
    local = after.astimezone(zone)
    # advance to the next whole minute
    local = (local + timedelta(minutes=1)).replace(second=0, microsecond=0)
    for _ in range(366 * 8):  # > any gap a 5-field spec can produce
        if not (local.month in spec.month and spec.day_matches(local)):
            # skip to next day's 00:00 local
            local = (local + timedelta(days=1)).replace(hour=0, minute=0)
            # re-localize: stepping a wall date can cross a DST edge
            local = local.replace(tzinfo=None).replace(tzinfo=zone)
            continue
        # within a matching day, jump minute/hour fields directly
        for _minutes in range(24 * 60):
            if local.hour in spec.hour and local.minute in spec.minute:
                utc = local.astimezone(timezone.utc)
                # a wall time inside a spring-forward gap does not
                # exist: its UTC image maps BACK to a different wall
                # time. Skip it — "there is no such minute".
                back = utc.astimezone(zone)
                if (back.hour, back.minute) == (local.hour, local.minute):
                    # fall-back repeated hour: minute arithmetic resets
                    # fold to 0, so a match here is the FIRST occurrence
                    # in absolute time. If `after` already sits past it
                    # (inside or beyond the repeated hour), that fire
                    # has happened — and by the "fires on its first
                    # occurrence only" invariant the second occurrence
                    # must not fire either. Keep scanning forward.
                    if utc > after:
                        return utc
            local = local + timedelta(minutes=1)
            if local.hour == 0 and local.minute == 0:
                break  # rolled into the next day: re-check day fields
    raise ValueError(f"cron {spec.expr!r} never fires (no matching date)")
