"""Regression tests for the round-1 ADVICE findings."""

import datetime as dt
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from aws_medallion_datalake_ray.functions.windows import sliding_assign
from aws_medallion_datalake_ray.stages import stats as stats_mod
from aws_medallion_datalake_ray.state.manifest import ManifestStore
from aws_medallion_datalake_ray.state.table import LakeTable


# ---------------------------------------------------------------- stats unbounded
class _FakeStats:
    def __init__(self, mn=None, mx=None, nulls=0, has_min_max=True):
        self.min, self.max = mn, mx
        self.null_count = nulls
        self.has_min_max = has_min_max


class _FakeCol:
    def __init__(self, st):
        self.statistics = st


class _FakeRG:
    def __init__(self, cols, rows=10):
        self._cols = cols
        self.num_rows = rows

    def column(self, i):
        return self._cols[i]


class _FakeMD:
    def __init__(self, rgs, rows):
        self._rgs = rgs
        self.num_row_groups = len(rgs)
        self.num_rows = rows

    def row_group(self, i):
        return self._rgs[i]


class _FakeSchemaArrow:
    names = ["x"]


class _FakePF:
    def __init__(self, path):
        pass

    metadata = None
    schema_arrow = _FakeSchemaArrow()


def test_statless_row_group_pins_bounds_unbounded(tmp_path, monkeypatch):
    """A row group without statistics must leave min/max None even when later
    row groups carry bounds (ADVICE medium: pruning could skip matching rows)."""
    p = tmp_path / "f.parquet"
    p.write_bytes(b"x")
    rgs = [
        _FakeRG([_FakeCol(None)]),  # stats-less group FIRST
        _FakeRG([_FakeCol(_FakeStats(mn=5, mx=9))]),  # later group repopulates?
    ]
    fake = _FakePF(None)
    fake.metadata = _FakeMD(rgs, rows=20)
    monkeypatch.setattr(stats_mod.pq, "ParquetFile", lambda _: fake)
    rows, _, agg = stats_mod.parquet_footer_stats(str(p), ("x",))
    assert rows == 20
    assert agg["x"]["min"] is None and agg["x"]["max"] is None


def test_has_min_max_false_with_values_is_unbounded(tmp_path, monkeypatch):
    p = tmp_path / "f.parquet"
    p.write_bytes(b"x")
    rgs = [
        _FakeRG([_FakeCol(_FakeStats(has_min_max=False, nulls=0))], rows=10),
        _FakeRG([_FakeCol(_FakeStats(mn=1, mx=2))]),
    ]
    fake = _FakePF(None)
    fake.metadata = _FakeMD(rgs, rows=20)
    monkeypatch.setattr(stats_mod.pq, "ParquetFile", lambda _: fake)
    _, _, agg = stats_mod.parquet_footer_stats(str(p), ("x",))
    assert agg["x"]["min"] is None and agg["x"]["max"] is None


def test_all_null_group_keeps_later_bounds(tmp_path, monkeypatch):
    """An all-null row group (no min/max but no values either) must NOT
    un-bound the file."""
    p = tmp_path / "f.parquet"
    p.write_bytes(b"x")
    rgs = [
        _FakeRG([_FakeCol(_FakeStats(has_min_max=False, nulls=10))], rows=10),
        _FakeRG([_FakeCol(_FakeStats(mn=1, mx=2))]),
    ]
    fake = _FakePF(None)
    fake.metadata = _FakeMD(rgs, rows=20)
    monkeypatch.setattr(stats_mod.pq, "ParquetFile", lambda _: fake)
    _, _, agg = stats_mod.parquet_footer_stats(str(p), ("x",))
    assert agg["x"]["min"] == 1 and agg["x"]["max"] == 2 and agg["x"]["nulls"] == 10


# ---------------------------------------------------------------- empty-scan guard
def test_scan_empty_table_with_columns_no_schema(tmp_path, ray_session):
    t = LakeTable(str(tmp_path / "t"))
    ds = t.scan(columns=["nope", "also_nope"])
    assert ds.count() == 0
    assert set(ds.schema().names) == {"nope", "also_nope"}


# ---------------------------------------------------------------- sliding grid
def test_sliding_assign_aligns_to_slide_grid():
    ts = pa.table(
        {
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 5, 30), dt.datetime(2024, 1, 1, 7, 5)],
                pa.timestamp("us"),
            ),
            "v": [1.0, 2.0],
        }
    )
    out = sliding_assign(ts, "ts", size_hours=4, slide_hours=2)
    starts = sorted(set(out["window_start"].to_pylist()))
    # every window start must sit on the 2h grid
    for s in starts:
        assert s.hour % 2 == 0 and s.minute == 0
    # 5:30 belongs to windows starting 02:00 and 04:00 (size 4h, slide 2h)
    row0 = [
        r["window_start"] for r in out.to_pylist() if r["v"] == 1.0
    ]
    assert sorted(row0) == [dt.datetime(2024, 1, 1, 2), dt.datetime(2024, 1, 1, 4)]


def test_sliding_assign_slide1_unchanged():
    ts = pa.table(
        {"ts": pa.array([dt.datetime(2024, 1, 1, 5, 30)], pa.timestamp("us")), "v": [1.0]}
    )
    out = sliding_assign(ts, "ts", size_hours=2, slide_hours=1)
    assert sorted(out["window_start"].to_pylist()) == [
        dt.datetime(2024, 1, 1, 4),
        dt.datetime(2024, 1, 1, 5),
    ]


# ---------------------------------------------------------------- lock stealing
def test_stale_lock_stolen_by_rename(tmp_path):
    store = ManifestStore(str(tmp_path / "meta"))
    os.makedirs(store.dir, exist_ok=True)
    lock = os.path.join(store.dir, "COMMIT.lock")
    with open(lock, "w") as f:
        f.write("dead")
    old = time.time() - 3600
    os.utime(lock, (old, old))
    got, token = store._acquire_lock()
    assert got == lock and os.path.exists(lock)
    # the stealer's token is in the file (fencing: holder re-verifies ownership)
    assert store._owns_lock(lock, token)
    os.unlink(lock)
