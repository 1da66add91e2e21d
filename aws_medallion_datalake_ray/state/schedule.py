"""Deterministic cron-schedule evaluation — the reference's EventBridge
trigger (C2, ``terraform/main.tf:47-56``: ``cron(0 2 * * ? *)`` prod,
``cron(0 8 * * ? *)`` dev; weekly Agilean Sundays ``README.md:67``) as a
pure function instead of a managed service.

There is deliberately NO daemon: on a cluster the orchestrator (cron, Ray
jobs scheduler, Airflow) calls ``due(expr, last_run, now)`` and launches
the CLI pipeline when it returns True — the same division of labor as
EventBridge → Step Functions, but the engine owns the *evaluation* so a
run decision is reproducible from (expr, last_run, now) alone, never from
wall-clock side effects.

Supported syntax: standard 5-field cron (minute hour dom month dow) plus
EventBridge's 6-field form (trailing year field; ``?`` treated as ``*``).
Fields accept ``*``, lists, ranges, and ``*/step``.  dow: 0 and 7 = Sunday
(EventBridge's 1-7 = SUN-SAT form is normalized).  Standard cron dom/dow
OR-semantics when both are restricted.
"""

from __future__ import annotations

import datetime as dt

_FIELD_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 7))


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        has_step = False
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            has_step = True
            if step <= 0:
                raise ValueError(f"bad cron step {step_s!r}")
        if part in ("*", "?"):
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = int(part)
            # cron/EventBridge 'a/step' = start at a, every step up to the
            # field max ("0/10" minutes = :00 :10 :20 ...), NOT the single
            # value {a}
            b = hi if has_step else a
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise ValueError(f"cron field {spec!r} out of range [{lo},{hi}]")
        out.update(range(a, b + 1, step))
    return frozenset(out)


def parse_cron(expr: str) -> tuple[frozenset[int], ...]:
    """Parse ``m h dom mon dow`` (or EventBridge ``cron(m h dom mon dow y)``;
    the year field is validated as numeric-or-star and otherwise ignored).

    dow domains differ: standard cron is 0-7 with both 0 and 7 = Sunday;
    EventBridge's ``cron(...)`` 6-field form is 1-7 = SUN-SAT, so a numeric
    dow arriving in that form is shifted down by one (``cron(0 2 ? * 1 *)``
    fires SUNDAY, not Monday).  A bare 6-field string without the wrapper
    keeps standard-cron dow."""
    e = expr.strip()
    eventbridge = False
    if e.startswith("cron(") and e.endswith(")"):
        e = e[5:-1]
        eventbridge = True
    fields = e.split()
    if len(fields) == 6:
        year = fields[5]
        if year not in ("*", "?") and not year.replace("-", "").isdigit():
            raise ValueError(f"bad year field {year!r}")
        fields = fields[:5]
    else:
        eventbridge = False  # EventBridge expressions are always 6-field
    if len(fields) != 5:
        raise ValueError(f"cron {expr!r}: want 5 (or EventBridge 6) fields")
    ranges = list(_FIELD_RANGES)
    if eventbridge:
        ranges[4] = (1, 7)  # EventBridge dow: 1-7 = SUN-SAT
    parsed = [
        _parse_field(f, lo, hi)
        for f, (lo, hi) in zip(fields, ranges)
    ]
    if eventbridge:
        parsed[4] = frozenset(v - 1 for v in parsed[4])  # SUN-SAT -> 0-6
    else:
        # normalize standard-cron Sunday: 7 -> 0
        dow = set(parsed[4])
        if 7 in dow:
            dow.discard(7)
            dow.add(0)
        parsed[4] = frozenset(dow)
    return tuple(parsed)


def matches(expr: str, ts: dt.datetime) -> bool:
    """True iff the minute containing ``ts`` is a firing minute."""
    m, h, dom, mon, dow = parse_cron(expr)
    restricted_dom = dom != frozenset(range(1, 32))
    restricted_dow = dow != frozenset(range(0, 7))
    day_ok = (
        (ts.day in dom or ts.isoweekday() % 7 in dow)
        if (restricted_dom and restricted_dow)
        else (ts.day in dom and ts.isoweekday() % 7 in dow)
    )  # classic cron OR-rule when both day fields are restricted
    return (ts.minute in m and ts.hour in h and day_ok and ts.month in mon)


def next_fire(expr: str, after: dt.datetime) -> dt.datetime:
    """First firing minute strictly after ``after`` (minute resolution).
    Walks minute-by-minute with day-level skips; bounded at 5 years."""
    m, h, dom, mon, dow = parse_cron(expr)  # validate once
    restricted_dom = dom != frozenset(range(1, 32))
    restricted_dow = dow != frozenset(range(0, 7))
    t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    limit = after + dt.timedelta(days=5 * 366)
    while t <= limit:
        day_ok = (
            (t.day in dom or t.isoweekday() % 7 in dow)
            if (restricted_dom and restricted_dow)
            else (t.day in dom and t.isoweekday() % 7 in dow)
        )
        if not (day_ok and t.month in mon):  # date-level skip
            t = (t + dt.timedelta(days=1)).replace(hour=0, minute=0)
        elif t.hour not in h:  # hour-level skip
            t = (t + dt.timedelta(hours=1)).replace(minute=0)
        elif t.minute in m:
            return t
        else:
            t = t + dt.timedelta(minutes=1)
    raise ValueError(f"cron {expr!r} never fires within 5 years of {after}")


def due(expr: str, last_run: dt.datetime | None, now: dt.datetime) -> bool:
    """Should a run launch at ``now``, given the last successful run?
    True iff at least one firing minute lies in ``(last_run, now]`` —
    missed windows collapse into ONE catch-up run (the reference's
    fail-stop backfill granularity, Step Functions sequential replay)."""
    if last_run is None:
        return True
    return next_fire(expr, last_run) <= now
