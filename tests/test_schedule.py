"""C2 scheduled trigger: deterministic cron evaluation (EventBridge parity).

Reference strings: ``cron(0 2 * * ? *)`` prod / ``cron(0 8 * * ? *)`` dev
(``terraform/main.tf:47-56``), weekly Agilean Sundays 02:00 (README.md:67).
"""

import datetime as dt

import pytest

from aws_medallion_datalake_ray.state.schedule import (
    due, matches, next_fire, parse_cron,
)

D = dt.datetime


def test_reference_prod_daily_0200():
    e = "cron(0 2 * * ? *)"
    assert matches(e, D(2024, 3, 5, 2, 0))
    assert not matches(e, D(2024, 3, 5, 2, 1))
    assert not matches(e, D(2024, 3, 5, 8, 0))
    assert next_fire(e, D(2024, 3, 5, 2, 0)) == D(2024, 3, 6, 2, 0)
    assert next_fire(e, D(2024, 3, 5, 1, 59)) == D(2024, 3, 5, 2, 0)


def test_reference_weekly_sunday():
    e = "0 2 * * 0"
    # 2024-03-03 is a Sunday
    assert matches(e, D(2024, 3, 3, 2, 0))
    assert not matches(e, D(2024, 3, 4, 2, 0))
    assert next_fire(e, D(2024, 3, 3, 2, 0)) == D(2024, 3, 10, 2, 0)
    # 7 == Sunday too
    assert matches("0 2 * * 7", D(2024, 3, 3, 2, 0))


def test_lists_ranges_steps():
    e = "*/15 8-10 * * 1-5"  # weekdays, every 15 min 08:00-10:45
    assert matches(e, D(2024, 3, 4, 8, 45))   # Monday
    assert matches(e, D(2024, 3, 8, 10, 30))  # Friday
    assert not matches(e, D(2024, 3, 9, 9, 0))   # Saturday
    assert not matches(e, D(2024, 3, 4, 11, 0))
    assert next_fire(e, D(2024, 3, 8, 10, 45)) == D(2024, 3, 11, 8, 0)


def test_dom_dow_or_rule():
    # classic cron: when BOTH day fields are restricted they OR
    e = "0 0 13 * 5"  # the 13th OR any Friday
    assert matches(e, D(2024, 9, 13, 0, 0))  # Friday the 13th
    assert matches(e, D(2024, 9, 6, 0, 0))   # a Friday, not the 13th
    assert matches(e, D(2024, 8, 13, 0, 0))  # 13th, a Tuesday
    assert not matches(e, D(2024, 9, 12, 0, 0))


def test_month_boundaries_and_day_skip():
    e = "30 4 1 2 *"  # Feb 1st 04:30
    assert next_fire(e, D(2024, 2, 2, 0, 0)) == D(2025, 2, 1, 4, 30)
    assert next_fire(e, D(2024, 1, 31, 23, 59)) == D(2024, 2, 1, 4, 30)


def test_due_catch_up_semantics():
    e = "cron(0 2 * * ? *)"
    assert due(e, None, D(2024, 3, 5, 0, 0))  # never ran -> run
    assert not due(e, D(2024, 3, 5, 2, 0), D(2024, 3, 5, 12, 0))
    assert due(e, D(2024, 3, 5, 2, 0), D(2024, 3, 6, 2, 0))
    # three missed windows collapse into one catch-up decision
    assert due(e, D(2024, 3, 2, 2, 0), D(2024, 3, 5, 12, 0))


def test_next_fire_agrees_with_minute_walk():
    exprs = ["0 2 * * ? *", "*/20 */6 * * *", "5 0 * 3 1", "59 23 28-31 * *"]
    start = D(2024, 2, 27, 13, 7)
    for e in exprs:
        got = next_fire(e, start)
        t = start.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
        while not matches(e, t):
            t += dt.timedelta(minutes=1)
        assert got == t, e


def test_parse_errors():
    for bad in ("0 2 * *", "61 * * * *", "* * 0 * *", "*/0 * * * *",
                "cron(0 2 * * ? x)"):
        with pytest.raises(ValueError):
            parse_cron(bad)
