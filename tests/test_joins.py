"""Unit tests for the distributed as-of join and interval range join."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from aws_medallion_datalake_ray.functions.joins import (
    asof_join,
    range_join_banded,
    range_join_intervals,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _sides():
    left = pa.table(
        {
            "k": [1, 1, 2, 2, 3],
            "ts": pa.array(
                [_ts("2024-01-01T10:00"), _ts("2024-01-01T12:00"),
                 _ts("2024-01-01T09:00"), _ts("2024-01-01T11:00"),
                 _ts("2024-01-01T08:00")],
                pa.timestamp("us"),
            ),
            "lval": [10, 11, 20, 21, 30],
        }
    )
    right = pa.table(
        {
            "k": [1, 1, 2],
            "ts": pa.array(
                [_ts("2024-01-01T09:30"), _ts("2024-01-01T11:30"),
                 _ts("2024-01-01T10:30")],
                pa.timestamp("us"),
            ),
            "rval": [100, 101, 200],
        }
    )
    return left, right


def test_asof_backward_inner_matches_pandas(ray_session):
    left, right = _sides()
    got = (
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="ts", by=["k"], direction="backward", how="inner",
        )
        .to_pandas()
        .sort_values("lval")
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.to_pandas().sort_values("ts"),
            right.to_pandas().sort_values("ts").rename(columns={"ts": "ts_src"}),
            left_on="ts", right_on="ts_src", by="k", direction="backward",
        )
        .dropna(subset=["ts_src"])
        .sort_values("lval")
        .reset_index(drop=True)
    )
    # k=3 has no right rows and k=2@09:00 has no prior right row — both drop
    assert list(got["lval"]) == [10, 11, 21] == list(exp["lval"])
    assert list(got["rval"]) == [100, 101, 200] == list(exp["rval"].astype(int))
    assert list(got["ts_r"]) == list(exp["ts_src"])
    # exact dtype round-trip on the inner path
    assert got["rval"].dtype == np.int64


def test_asof_forward_direction(ray_session):
    left, right = _sides()
    got = (
        asof_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="ts", by=["k"], direction="forward", how="inner",
        )
        .to_pandas()
        .sort_values("lval")
        .reset_index(drop=True)
    )
    # k=1@10:00 -> 11:30; k=1@12:00 none; k=2@09:00 -> 10:30; k=2@11:00 none
    assert list(got["lval"]) == [10, 20]
    assert list(got["rval"]) == [101, 200]


def test_asof_left_keeps_unmatched(ray_session):
    left, right = _sides()
    got = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="ts", by=["k"], direction="backward", how="left",
    ).to_pandas()
    assert len(got) == len(left)
    unmatched = got[got["ts_r"].isna()]
    assert sorted(unmatched["lval"]) == [20, 30]


def test_asof_many_keys_partitioned(ray_session):
    """Co-partitioned path with enough keys to spread over partitions; verify
    against a single-frame merge_asof ground truth."""
    rng = np.random.default_rng(7)
    n_l, n_r, n_k = 3000, 1500, 97
    base = np.datetime64("2024-01-01T00:00:00", "us")
    lts = base + rng.integers(0, 10**9, n_l).astype("timedelta64[us]")
    rts = base + rng.integers(0, 10**9, n_r).astype("timedelta64[us]")
    left = pa.table(
        {"k": rng.integers(0, n_k, n_l), "ts": pa.array(lts), "lid": np.arange(n_l)}
    )
    right = pa.table(
        {"k": rng.integers(0, n_k, n_r), "ts": pa.array(rts), "rid": np.arange(n_r)}
    )
    got = (
        asof_join(
            ray.data.from_arrow(left).repartition(6),
            ray.data.from_arrow(right).repartition(4),
            on="ts", by=["k"], how="inner", num_partitions=16,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.to_pandas().sort_values("ts", kind="stable"),
            right.to_pandas().sort_values("ts", kind="stable"),
            on="ts", by="k", direction="backward", suffixes=("", "_r"),
        )
        .dropna(subset=["rid"])
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert list(got["lid"]) == list(exp["lid"])
    assert list(got["rid"]) == list(exp["rid"].astype(int))


def test_asof_join_composes_with_own_output(ray_session):
    """The output of an asof_join (which carries ts_r) must be joinable
    again — colliding right-side names get extra suffixes instead of
    building a duplicate-field schema."""
    left, right = _sides()
    first = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="ts", by=["k"], how="inner",
    ).materialize()
    second = asof_join(
        first, ray.data.from_arrow(right), on="ts", by=["k"], how="inner"
    ).to_pandas()
    cols = set(second.columns)
    assert "ts_r" in cols and "ts_r_r" in cols and "rval_r" in cols
    # same match as the first join (right side unchanged)
    assert sorted(second["rval"]) == sorted(second["rval_r"])


def test_range_join_overlapping_intervals(ray_session):
    iv = pa.table(
        {
            "interval_id": pa.array([0, 1, 2], pa.int64()),
            "lo": pa.array([0, 5, 100], pa.int64()),
            "hi": pa.array([10, 15, 110], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(pa.table({"x": pa.array([0, 5, 7, 12, 50], pa.int64())}))
    got = (
        range_join_intervals(ds, iv, on="x")
        .to_pandas()
        .sort_values(["x", "interval_id"])
        .reset_index(drop=True)
    )
    # x=5 and x=7 land in BOTH [0,10) and [5,15); x=50 matches nothing
    exp = [(0, 0), (5, 0), (5, 1), (7, 0), (7, 1), (12, 1)]
    assert list(zip(got["x"], got["interval_id"])) == exp


def test_range_join_empty_match_batch_schema(ray_session):
    iv = pa.table(
        {
            "interval_id": pa.array([0], pa.int64()),
            "lo": pa.array([1000], pa.int64()),
            "hi": pa.array([2000], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    out = range_join_intervals(ds, iv, on="x")
    assert out.count() == 0
    assert set(out.schema().base_schema.names) == {"x", "interval_id"}


def test_range_join_banded_matches_broadcast(ray_session):
    """The co-partitioned banded plan must produce exactly the broadcast
    plan's (row, interval) pairs — randomized overlapping intervals, rows
    outside every interval, intervals spanning many bands, empty bands."""
    rng = np.random.default_rng(17)
    n_iv, n_rows = 40, 3000
    lo = rng.integers(0, 10_000, n_iv)
    length = rng.integers(1, 800, n_iv)  # some intervals span many 64-bands
    iv = pa.table(
        {
            "interval_id": pa.array(np.arange(n_iv), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(lo + length, pa.int64()),
        }
    )
    rows = pa.table(
        {
            "x": pa.array(rng.integers(-500, 12_000, n_rows), pa.int64()),
            "payload": pa.array(rng.integers(0, 99, n_rows), pa.int64()),
        }
    )

    def pairs(ds_out):
        df = ds_out.to_pandas()
        return sorted(zip(df["x"], df["payload"], df["interval_id"]))

    broad = pairs(range_join_intervals(ray.data.from_arrow(rows), iv, on="x"))
    for w in (64, None):  # explicit narrow bands AND the measured default
        banded = pairs(
            range_join_banded(
                ray.data.from_arrow(rows), iv, on="x", band_width=w
            )
        )
        assert banded == broad
    assert len(broad) > 100  # the fixture actually exercises matching


def test_range_join_banded_timestamp_and_columns(ray_session):
    """Timestamp keys band on epoch-us; `columns` projects the output."""
    iv = pa.table(
        {
            "interval_id": pa.array([0, 1], pa.int64()),
            "lo": pa.array(
                [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)],
                pa.timestamp("us"),
            ),
            "hi": pa.array(
                [dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 4)],
                pa.timestamp("us"),
            ),
        }
    )
    rows = pa.table(
        {
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 12), dt.datetime(2024, 1, 2, 12),
                 dt.datetime(2024, 1, 5)],
                pa.timestamp("us"),
            ),
            "uid": pa.array([7, 8, 9], pa.int64()),
            "junk": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    out = range_join_banded(
        ray.data.from_arrow(rows), iv, on="ts", columns=["uid"],
        band_width=12 * 3600 * 1_000_000,
    ).to_pandas()
    assert set(out.columns) == {"uid", "interval_id"}
    got = sorted(zip(out["uid"], out["interval_id"]))
    # 01-01T12 in iv0 only; 01-02T12 overlaps both; 01-05 in none
    assert got == [(7, 0), (8, 0), (8, 1)]


def test_range_join_banded_empty_and_degenerate_intervals(ray_session):
    """Empty interval side / all-degenerate (hi <= lo) intervals return an
    empty result (not a numpy broadcast crash), matching the broadcast plan."""
    rows = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    empty = pa.table(
        {
            "interval_id": pa.array([], pa.int64()),
            "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64()),
        }
    )
    out = range_join_banded(ray.data.from_arrow(rows), empty, on="x")
    assert out.count() == 0
    degen = pa.table(
        {
            "interval_id": pa.array([0, 1], pa.int64()),
            "lo": pa.array([10, 20], pa.int64()),
            "hi": pa.array([10, 15], pa.int64()),  # hi <= lo: match nothing
        }
    )
    out2 = range_join_banded(ray.data.from_arrow(rows), degen, on="x", band_width=5)
    assert out2.count() == 0


def test_range_join_banded_null_on_matches_broadcast(ray_session):
    """Null on-values match nothing in BOTH plans (the banded plan must not
    crash casting NaN bands to int64)."""
    iv = pa.table(
        {
            "interval_id": pa.array([0], pa.int64()),
            "lo": pa.array([0], pa.int64()),
            "hi": pa.array([100], pa.int64()),
        }
    )
    rows = pa.table(
        {
            "x": pa.array([5, None, 50, None], pa.int64()),
            "rid": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    broad = range_join_intervals(ray.data.from_arrow(rows), iv, on="x").to_pandas()
    band = range_join_banded(ray.data.from_arrow(rows), iv, on="x").to_pandas()
    assert sorted(broad["rid"]) == [1, 3]
    assert sorted(band["rid"]) == sorted(broad["rid"])
