"""Hive-partitioned LakeTables: manifest partition values, exact pruning,
partition-preserving maintenance (round-1 verdict #5; reference layout
bronze_digit.py:148)."""

import os

import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files, make_updates
from aws_medallion_datalake_ray.state.table import LakeTable, prune_files

TS = "2024-01-01T00:00:00"


@pytest.fixture()
def ptable(tmp_path, ray_session):
    t = LakeTable.create(str(tmp_path / "t"), partition_cols=("lang",))
    base = make_source_files(n_rows=3000, seed=5)
    for i in range(0, 3000, 1000):
        t.append(base.slice(i, 1000), run_ts=TS)
    return t, base


def test_partition_values_in_manifest(ptable):
    t, base = ptable
    files = t.files()
    langs = set(base["lang"].to_pylist())
    assert all(set(f.partition) == {"lang"} for f in files)
    assert {f.partition["lang"] for f in files} == langs


def test_partition_predicate_opens_only_that_partition(ptable):
    t, base = ptable
    files = t.files()
    kept = prune_files(files, [("lang", "==", "py")])
    assert all(f.partition["lang"] == "py" for f in kept)
    n_py = sum(1 for x in base["lang"].to_pylist() if x == "py")
    assert t.scan(predicate=[("lang", "==", "py")]).count() == n_py
    # 'in' pruning too
    kept2 = prune_files(files, [("lang", "in", ["py", "rs"])])
    assert all(f.partition["lang"] in ("py", "rs") for f in kept2)


def test_scan_reattaches_partition_column(ptable):
    t, base = ptable
    ds = t.scan(columns=["lang", "repo"])
    assert ds.schema().names == ["lang", "repo"]
    got = sorted(ds.unique("lang"))
    assert got == sorted(set(base["lang"].to_pylist()))
    assert t.scan().count() == 3000


def test_compact_scoped_and_partition_preserving(ptable):
    t, _ = ptable
    fp0 = t.sha256_checksum("content")
    res = t.compact(target_file_bytes=8 << 20, run_ts=TS)
    assert res["files_out"] >= 1
    files = t.files()
    # bins never crossed partitions: every output file still has one value
    assert all(set(f.partition) == {"lang"} for f in files)
    assert t.sha256_checksum("content") == fp0
    # predicate-scoped compact touches only that partition's files
    before_other = {f.path for f in files if f.partition["lang"] != "py"}
    t.compact(target_file_bytes=1 << 30, predicate=[("lang", "==", "py")],
              min_files_per_bin=1, run_ts=TS)
    after_other = {f.path for f in t.files() if f.partition["lang"] != "py"}
    assert before_other == after_other


def test_merge_and_zorder_on_partitioned_table(ptable):
    t, base = ptable
    m = t.merge(make_updates(base, 200, seed=9), run_ts=TS)
    assert m["updates"] > 0
    files = t.files()
    assert all(set(f.partition) == {"lang"} for f in files)
    # full schema (incl. the partition column) survives maintenance commits
    assert "lang" in t.schema().names
    n = t.scan().count()
    z = t.zorder(["repo", "path"], target_file_bytes=4 << 20, run_ts=TS)
    assert z["files_out"] >= 1
    assert t.scan().count() == n
    assert all(set(f.partition) == {"lang"} for f in t.files())


def test_partition_range_predicate_residue(ptable):
    """Range predicates on a partition column evaluate exactly (post-attach
    residue filter — formerly rejected with ValueError)."""
    t, base = ptable
    langs = base["lang"].to_pylist()
    pivot = sorted(set(langs))[len(set(langs)) // 2]
    expect = sum(1 for v in langs if v > pivot)
    assert t.scan(predicate=[("lang", ">", pivot)]).count() == expect
    # column projection that EXCLUDES the predicate column still filters
    got = t.scan(predicate=[("lang", ">", pivot)], columns=["repo"])
    assert got.count() == expect
    assert got.schema().names == ["repo"]


def test_delete_keys_on_partitioned_table(ptable):
    """Copy-on-write delete preserves partition values and the full schema."""
    t, base = ptable
    df = base.to_pandas().head(5)
    keys = [
        f"{r.repo}\x1f{r.path}\x1f{r.commit}" for r in df.itertuples()
    ]
    res = t.delete_keys(keys)
    assert res["rows_deleted"] == 5
    assert t.scan().count() == 2995
    assert all(set(f.partition) == {"lang"} for f in t.files())
    assert "lang" in t.schema().names
