"""Round-5 scale-pattern regressions: the q85 loop lift and the q89
second blocking key + pair-budget chunker.  Pure-kernel tests — no Ray
session needed; the distributed plans are oracle-gated in
test_queries_oracle.py / tools/sweep.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.functions.dedup import _PART
from aws_medallion_datalake_ray.pipelines import queries as q


# ---------------------------------------------------------------- q85


def _naive_hour_counts(df: pd.DataFrame) -> pd.DataFrame:
    """O(n²) reference: per row, count same-user events in [ts-1h, ts]."""
    hour = np.timedelta64(3600, "s")
    rows = []
    for _, g in df.groupby("user_id"):
        ts = g["ts"].to_numpy("datetime64[us]")
        for i in range(len(g)):
            rows.append((g["event_id"].iloc[i],
                         int(((ts >= ts[i] - hour) & (ts <= ts[i])).sum())))
    return pd.DataFrame(rows, columns=["event_id", "n_last_hour"])


def _q85_fixture(n_users: int, per_user: int, span_us: int,
                 seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n = n_users * per_user
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, span_us, n).astype("timedelta64[us]")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.repeat(np.arange(n_users, dtype=np.int64), per_user),
        "ts": ts,
    })


def test_q85_vectorized_matches_naive_many_small_users():
    # 5000 users x 2 events — the shape where a per-user Python loop
    # dominates; the lifted kernel must agree with the naive count.
    df = _q85_fixture(5000, 2, 4 * 3_600_000_000, seed=7)
    got = q._q85_frame_counts(df)
    want = _naive_hour_counts(df)
    merged = got.merge(want, on="event_id", suffixes=("", "_ref"))
    assert (merged["n_last_hour"] == merged["n_last_hour_ref"]).all()


def test_q85_uses_single_searchsorted_no_python_loop():
    # The vectorized path must engage on a realistic fixture: the
    # overflow guard only trips when nseg * gap >= 2**62.
    df = _q85_fixture(1000, 3, 3_600_000_000, seed=1)
    ts = df.sort_values(["user_id", "ts"])["ts"].to_numpy("datetime64[us]")
    span = int(ts.view("i8").max() - ts.view("i8").min())
    assert 1000 * (span + q._Q85_HOUR_US + 1) < 2 ** 62


def test_q85_overflow_fallback_agrees():
    # ~285-year span x 600 users pushes seg*gap past 2**62, forcing the
    # per-segment fallback; results must be identical to the naive count.
    span_us = 9_000_000_000_000_000
    df = _q85_fixture(600, 2, span_us, seed=3)
    ts = df["ts"].to_numpy("datetime64[us]").view("i8")
    gap = int(ts.max() - ts.min()) + q._Q85_HOUR_US + 1
    assert 600 * gap >= 2 ** 62  # fixture really does trip the guard
    got = q._q85_frame_counts(df)
    want = _naive_hour_counts(df)
    merged = got.merge(want, on="event_id", suffixes=("", "_ref"))
    assert (merged["n_last_hour"] == merged["n_last_hour_ref"]).all()


# ---------------------------------------------------------------- q89


def _rand_names(rng, n: int, length: int) -> list:
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    return ["".join(rng.choice(alpha, length)) for _ in range(n)]


def _kernel_pairs(names: list) -> pd.DataFrame:
    """Drive the q89 kernels exactly as the Dataset plan does, locally."""
    t = pa.table({"p_partkey": pa.array(range(len(names)), pa.int64()),
                  "p_name": pa.array(names, pa.string())})
    fanned = q._q89_fan_out(t).to_pandas()
    outs = [q._q89_bucket_pairs(g) for _, g in fanned.groupby(_PART)]
    out = pd.concat(outs, ignore_index=True)
    return out.sort_values(["key_a", "key_b"]).reset_index(drop=True)


def _brute_pairs(names: list) -> set:
    def lev(a: str, b: str) -> int:
        if abs(len(a) - len(b)) > 1:
            return 2
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if lev(names[i], names[j]) <= 1:
                out.add((i, j))
    return out


def test_q89_band_blocking_exact_including_first_char_edits():
    # Seeded corpus rich in d<=1 pairs of EVERY edit kind — including
    # first-char substitutions and insert/delete at position 0 (the
    # cases a naive first-char block would lose) and 1-char names.
    rng = np.random.default_rng(11)
    base = _rand_names(rng, 60, 5)
    names = list(base)
    for s in base[:40]:
        kind = rng.integers(0, 4)
        c = chr(ord("a") + int(rng.integers(0, 26)))
        if kind == 0:
            names.append(c + s[1:])          # substitute first char
        elif kind == 1:
            names.append(c + s)              # insert at front
        elif kind == 2:
            names.append(s[1:])              # delete first char
        else:
            pos = int(rng.integers(1, len(s)))
            names.append(s[:pos] + c + s[pos:])  # edit elsewhere
    names += ["a", "b", "z", "ab", "ba"]     # 1-char corner cases
    got = _kernel_pairs(names)
    got_set = set(zip(got["key_a"], got["key_b"]))
    assert got_set == _brute_pairs(names)
    # every pair resolved exactly once (no duplicate emissions)
    assert len(got) == len(got_set)


def test_q89_same_length_corpus_bounded_groups_and_chunked_path():
    # 10k same-length names: the old length-only block put all of them
    # in ONE group doing triu_indices(10k) = 50M index pairs.  Banding
    # must split them, and a tiny pair budget must force the chunked
    # generator WITHOUT changing results.
    rng = np.random.default_rng(23)
    names = list(dict.fromkeys(_rand_names(rng, 10_500, 6)))[:10_000]
    t = pa.table({"p_partkey": pa.array(range(len(names)), pa.int64()),
                  "p_name": pa.array(names, pa.string())})
    fanned = q._q89_fan_out(t).to_pandas()
    sizes = fanned.groupby(_PART).size()
    assert sizes.max() <= len(names) // 2  # banding really splits
    # chunked generator: force it with a small budget, compare exactly
    big = max(sizes.items(), key=lambda kv: kv[1])[0]
    g = fanned[fanned[_PART] == big]
    ref = q._q89_bucket_pairs(g)
    orig = q._Q89_PAIR_BUDGET
    q._Q89_PAIR_BUDGET = 10_000  # << n*(n-1)/2 for this group
    try:
        chunked = q._q89_bucket_pairs(g)
    finally:
        q._Q89_PAIR_BUDGET = orig
    key = ["key_a", "key_b"]
    pd.testing.assert_frame_equal(
        ref.sort_values(key).reset_index(drop=True),
        chunked.sort_values(key).reset_index(drop=True))


def test_q89_fan_out_bounded_expansion():
    # Fan-out is <=4 rows per name (2 length buckets x <=2 bands).
    rng = np.random.default_rng(5)
    names = _rand_names(rng, 500, 7) + ["a", "", "xy"]
    t = pa.table({"p_partkey": pa.array(range(len(names)), pa.int64()),
                  "p_name": pa.array(names, pa.string())})
    fanned = q._q89_fan_out(t)
    assert fanned.num_rows <= 4 * len(names)
