"""Property-based checks for the pure round-4 kernels: cron evaluation
(vs a brute-force minute walk) and the pair-vectorized Levenshtein DP
(vs the textbook scalar DP)."""

import datetime as dt

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_medallion_datalake_ray.pipelines.queries import _pairwise_levenshtein
from aws_medallion_datalake_ray.state.schedule import matches, next_fire

# ------------------------------------------------------------------ cron


def _field(lo, hi):
    single = st.integers(lo, hi).map(str)
    rng = st.tuples(st.integers(lo, hi), st.integers(lo, hi)).map(
        lambda ab: f"{min(ab)}-{max(ab)}")
    step = st.integers(2, 6).map(lambda k: f"*/{k}")
    return st.one_of(st.just("*"), single, rng, step)


cron_exprs = st.tuples(
    _field(0, 59), _field(0, 23), _field(1, 31), _field(1, 12), _field(0, 6),
).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(expr=cron_exprs,
       start=st.datetimes(min_value=dt.datetime(2024, 1, 1),
                          max_value=dt.datetime(2024, 12, 31)))
def test_next_fire_is_first_matching_minute(expr, start):
    try:
        got = next_fire(expr, start)
    except ValueError:
        return  # legitimately never fires in 5y (e.g. Feb 30-31 dom)
    # nothing in between matches, and the result does
    assert matches(expr, got)
    t = start.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    # walk at most 3 days by minute; beyond that trust the day-skip logic
    # (the full walk is covered exactly for fires within the window)
    horizon = min(got, t + dt.timedelta(days=3))
    while t < horizon:
        assert not matches(expr, t), (expr, t, got)
        t += dt.timedelta(minutes=1)


# ------------------------------------------------------------ levenshtein


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (a[i - 1] != b[j - 1]))
    return dp[lb]


words = st.text(alphabet="abcde ", min_size=0, max_size=12)


@settings(max_examples=60, deadline=None)
@given(pairs=st.lists(st.tuples(words, words), min_size=1, max_size=20))
def test_vectorized_levenshtein_matches_reference(pairs):
    L = max((max(len(a), len(b)) for a, b in pairs), default=1) or 1

    def mat(ws):
        m = np.zeros((len(ws), L), np.uint8)
        for k, s in enumerate(ws):
            bs = s.encode()
            m[k, :len(bs)] = np.frombuffer(bs, np.uint8)
        return m

    a = mat([p[0] for p in pairs])
    b = mat([p[1] for p in pairs])
    la = np.array([len(p[0]) for p in pairs], np.int64)
    lb = np.array([len(p[1]) for p in pairs], np.int64)
    got = _pairwise_levenshtein(a, la, b, lb)
    want = np.array([_ref_lev(x, y) for x, y in pairs], np.int64)
    assert (got == want).all()
