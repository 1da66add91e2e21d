"""Round-5 ADVICE regressions.

1. (high) Bloom probe hash-domain mismatch on INTEGER key columns:
   ``_files_for_first_keys`` probes with object-dtype key arrays while
   ``file_bloom`` builds from Arrow int columns via the int64 hash path —
   files holding matching keys were 'proven absent' and merge/delete
   silently lost updates.  (Round-4 tests only covered string keys.)
2. (medium) Same root cause at scan level: ``prune_files`` bloom probes
   with a constant whose TYPE differs from the column (``5.0`` vs int64,
   ``in [5, 7.5]``, ``in [5, None]``) returned false negatives.
3. (medium) EventBridge cron parity: ``cron(...)`` 6-field dow is 1-7 =
   SUN-SAT (was parsed as standard 0-7, off by one day), and ``a/step``
   means "from a, every step" (``0/10`` minutes fired hourly).
4. (low) ``clone_to`` pin-tag collisions: two clones whose dest paths share
   a basename overwrote each other's source pin, so expire+GC could delete
   files the first clone still referenced.
"""

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.functions.bloom import (
    bloom_may_contain_any, value_hashes)
from aws_medallion_datalake_ray.state.schedule import (
    matches, next_fire, parse_cron)
from aws_medallion_datalake_ray.state.table import (
    LakeTable, _files_for_first_keys, prune_files)

TS = "2024-01-01T00:00:00"
TS2 = "2024-01-02T00:00:00"
D = dt.datetime


def _int_keyed_table(root: str, n: int = 600) -> LakeTable:
    t = LakeTable.create(root, stats_cols=("id", "v"))
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"id": ids, "v": ids * np.int64(10)})
    for i in range(0, n, 200):  # several files, overlapping nothing
        t.append(tbl.slice(i, 200), run_ts=TS)
    return t


# ------------------------------------------------- 1. int-key merge/delete


def test_files_for_first_keys_int_object_probe(tmp_path):
    t = _int_keyed_table(str(tmp_path / "t"))
    t.build_blooms(["id"], run_ts=TS)
    # the exact probe shape merge uses: np.unique of an object-dtype column
    firsts = np.unique(np.array([5, 250, 599], dtype=object))
    hit = _files_for_first_keys(t.files(), "id", firsts)
    assert len(hit) == 3  # one file per 200-row slice holds one of the keys


def test_merge_on_int_key_after_build_blooms_updates_rows(tmp_path):
    t = _int_keyed_table(str(tmp_path / "t"))
    t.build_blooms(["id"], run_ts=TS)
    upd = pa.table({"id": np.array([5, 250, 599], np.int64),
                    "v": np.array([-1, -2, -3], np.int64)})
    t.merge(upd, key=("id",), run_ts=TS2)
    got = t.to_arrow().sort_by("id")
    assert got.num_rows == 600  # upserts, not duplicate inserts
    df = got.to_pandas().set_index("id")["v"]
    assert df.loc[5] == -1 and df.loc[250] == -2 and df.loc[599] == -3


def test_delete_keys_on_int_key_after_build_blooms(tmp_path):
    t = _int_keyed_table(str(tmp_path / "t"))
    t.build_blooms(["id"], run_ts=TS)
    t.delete_keys(np.array([5, 250, 599], dtype=object), key=("id",),
                  run_ts=TS2)
    ids = set(t.to_arrow(columns=["id"])["id"].to_pylist())
    assert not ids & {5, 250, 599}
    assert len(ids) == 597


# ------------------------------------------------- 2. scan-level probes


@pytest.fixture()
def bloomed(tmp_path):
    t = _int_keyed_table(str(tmp_path / "t"))
    t.build_blooms(["id"], run_ts=TS)
    return t


def test_prune_files_float_probe_on_int_column(bloomed):
    files = bloomed.files()
    # 5.0 == int64 5: the file holding id=5 must be KEPT
    assert len(prune_files(files, [("id", "==", 5.0)])) >= 1
    got = bloomed.scan(predicate=[("id", "==", 5)]).take_all()
    assert [r["id"] for r in got] == [5]


def test_prune_files_mixed_in_list_on_int_column(bloomed):
    files = bloomed.files()
    assert len(prune_files(files, [("id", "in", [5, 7.5])])) >= 1
    assert len(prune_files(files, [("id", "in", [5, None])])) >= 1
    # all-nonmatching floats may prune everything — but must not error
    assert prune_files(files, [("id", "in", [7.5, 8.5])]) == []


def test_prune_files_string_probe_on_int_column_is_conservative(bloomed):
    # type confusion -> keep (never a proof of absence)
    assert len(prune_files(bloomed.files(), [("id", "==", "abc")])) == \
        len(bloomed.files())


def test_float_array_probe_matches_arrow_float_build():
    col = pa.array([1.5, 5.0, 7.25])
    build = value_hashes(col)
    probe = value_hashes(np.array([5.0], np.float64))
    assert probe[0] == build[1]


# ------------------------------------------------- 3. EventBridge cron


def test_eventbridge_dow_is_sun_sat():
    # 2024-03-03 is a Sunday; EventBridge dow 1 = SUN
    e = "cron(0 2 ? * 1 *)"
    assert matches(e, D(2024, 3, 3, 2, 0))
    assert not matches(e, D(2024, 3, 4, 2, 0))  # Monday
    # EventBridge MON-FRI = 2-6
    wk = "cron(0 9 ? * 2-6 *)"
    assert matches(wk, D(2024, 3, 4, 9, 0))      # Monday
    assert matches(wk, D(2024, 3, 8, 9, 0))      # Friday
    assert not matches(wk, D(2024, 3, 3, 9, 0))  # Sunday
    # EventBridge SAT = 7 normalizes into range
    assert matches("cron(0 2 ? * 7 *)", D(2024, 3, 9, 2, 0))


def test_bare_six_field_keeps_standard_dow():
    # without the cron() wrapper, 1 = Monday (standard cron)
    e = "0 2 * * 1 *"
    assert matches(e, D(2024, 3, 4, 2, 0))       # Monday
    assert not matches(e, D(2024, 3, 3, 2, 0))   # Sunday


def test_a_slash_step_means_from_a_every_step():
    assert parse_cron("0/10 * * * *")[0] == frozenset({0, 10, 20, 30, 40, 50})
    assert parse_cron("3/15 * * * *")[0] == frozenset({3, 18, 33, 48})
    assert next_fire("0/10 * * * *", D(2024, 3, 4, 2, 0)) == \
        D(2024, 3, 4, 2, 10)
    # plain single value still means the single value
    assert parse_cron("5 * * * *")[0] == frozenset({5})


def test_eventbridge_star_dow_unaffected():
    e = "cron(0 2 * * ? *)"  # the reference's prod trigger
    assert matches(e, D(2024, 3, 5, 2, 0))
    assert next_fire(e, D(2024, 3, 5, 2, 0)) == D(2024, 3, 6, 2, 0)


# ------------------------------------------------- 4. clone pin collisions


def test_same_basename_clones_both_survive_gc(tmp_path, source_files_small):
    src = LakeTable.create(str(tmp_path / "src"))
    src.append(source_files_small, run_ts=TS)
    s1 = src.store.head_id()
    c1 = src.clone_to(str(tmp_path / "a" / "dst"), run_ts=TS)

    src.overwrite(source_files_small.slice(0, 100), run_ts=TS2)
    s2 = src.store.head_id()
    c2 = src.clone_to(str(tmp_path / "b" / "dst"), run_ts=TS2)

    tags = src.tags()
    assert tags.get(f"clone-dst-{s1}") == s1  # first pin NOT overwritten
    assert tags.get(f"clone-dst-{s2}") == s2

    for seed in (1, 2, 3):
        src.overwrite(source_files_small.slice(0, 50), run_ts=TS2)
    src.expire_snapshots(keep_last=1)
    src.gc_orphans()
    assert c1.scan().count() == len(source_files_small)
    assert c2.scan().count() == 100
