"""Regression tests for the round-3 ADVICE findings.

1. time travel to a pre-evolution snapshot on a PARTITIONED table must read
   that snapshot's schema (not HEAD's evolved one);
2. an unscoped compact retires the evolution spec once no pre-evolution file
   remains, unblocking historical rename sources;
3. unknown parquet null counts must not enable the metadata-only DELETE
   fast path;
4. heterogeneous external files adopted via add_files into one directory
   must each be read with their own physical schema;
5. tags.json updates are serialized under the commit lock.
"""

import os
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files
from aws_medallion_datalake_ray.state.manifest import DataFile
from aws_medallion_datalake_ray.state.table import LakeTable, predicate_covers_file

TS = "2024-01-01T00:00:00"


# -------------------------------------------- 1. partitioned pre-evolution time travel
def test_time_travel_pre_evolution_partitioned(tmp_path):
    t = LakeTable.create(str(tmp_path / "p"), partition_cols=("lang",))
    base = make_source_files(120, seed=21)
    t.append(base, run_ts=TS)
    pre = t.store.head().snapshot_id
    t.evolve_schema(rename={"path": "filepath"},
                    add={"stars": (pa.int64(), 3)}, run_ts=TS)
    # HEAD sees the evolved schema
    head = t.to_arrow()
    assert "filepath" in head.column_names and "path" not in head.column_names
    # time travel sees the OLD schema — this used to KeyError on 'filepath'
    old = t.to_arrow(snapshot_id=pre)
    assert len(old) == 120
    assert "path" in old.column_names and "filepath" not in old.column_names
    assert "stars" not in old.column_names
    assert old["lang"].null_count == 0  # partition values attached
    # streaming scan path too, with a partition predicate
    n_py = len([v for v in base["lang"].to_pylist() if v == "py"])
    assert t.scan(snapshot_id=pre,
                  predicate=[("lang", "==", "py")]).count() == n_py


def test_time_travel_pre_evolution_schema_api(tmp_path):
    t = LakeTable.create(str(tmp_path / "s"))
    t.append(make_source_files(40, seed=3), run_ts=TS)
    pre = t.store.head().snapshot_id
    t.evolve_schema(rename={"lang": "language"}, run_ts=TS)
    assert "lang" in t.schema(pre).names
    assert "language" in t.schema().names


# -------------------------------------------- 2. compact retires the evolution spec
def test_compact_retires_rename_spec(tmp_path):
    t = LakeTable.create(str(tmp_path / "r"))
    t.append(make_source_files(80, seed=5), run_ts=TS)
    t.evolve_schema(rename={"lang": "language"}, run_ts=TS)
    # the historical source name is blocked while old files remain
    with pytest.raises(ValueError, match="historical rename source"):
        t.evolve_schema(add={"lang": (pa.string(), "x")}, run_ts=TS)
    res = t.compact(target_file_bytes=64 * 1024 * 1024, run_ts=TS)
    assert res.get("evolution_retired") is True
    assert t._evolution() is None
    # the advertised remedy now actually unblocks the old name
    t.evolve_schema(add={"lang": (pa.string(), "x")}, run_ts=TS)
    got = t.to_arrow()
    assert "language" in got.column_names and "lang" in got.column_names
    assert set(got["lang"].to_pylist()) == {"x"}


def test_compact_forces_rewrite_of_large_pre_evolution_files(tmp_path):
    """A pre-evolution file at target size (never binned before) must still
    be rewritten by an unscoped compact so the spec can retire."""
    t = LakeTable.create(str(tmp_path / "f"))
    t.append(make_source_files(60, seed=7), run_ts=TS)
    t.evolve_schema(rename={"path": "filepath"}, run_ts=TS)
    # tiny target -> the single existing file counts as "large"
    res = t.compact(target_file_bytes=1, min_files_per_bin=2, run_ts=TS)
    assert res["files_in"] >= 1  # forced despite being over target
    assert res.get("evolution_retired") is True
    for f in t.files():
        assert "filepath" in pq.read_schema(t.abs(f.path)).names


def test_compact_does_not_retire_while_old_files_remain(tmp_path):
    """A predicate-SCOPED compact leaves out-of-scope pre-evolution files
    untouched: the spec must survive."""
    t = LakeTable.create(str(tmp_path / "k"))
    base = make_source_files(100, seed=9)
    t.append(base, run_ts=TS)
    t.evolve_schema(rename={"path": "filepath"}, run_ts=TS)
    repo0 = base["repo"][0].as_py()
    t.compact(target_file_bytes=64 * 1024 * 1024, run_ts=TS,
              predicate=[("repo", "==", repo0)])
    assert t._evolution() is not None  # old files remain -> spec kept
    # scans still reconcile correctly
    assert "filepath" in t.to_arrow().column_names


# -------------------------------------------- 3. unknown null counts
def test_unknown_null_count_blocks_metadata_delete():
    f = DataFile(path="x.parquet", rows=10, bytes=100,
                 stats={"a": {"min": 1, "max": 1, "nulls": None}})
    # bounds prove every NON-NULL row matches, but the null count is
    # unknown -> the file may hold NULL rows that survive the predicate
    assert predicate_covers_file(f, [("a", "==", 1)]) is False
    f2 = DataFile(path="y.parquet", rows=10, bytes=100,
                  stats={"a": {"min": 1, "max": 1, "nulls": 0}})
    assert predicate_covers_file(f2, [("a", "==", 1)]) is True


def test_footer_stats_none_statistics_gives_unknown_nulls(tmp_path, monkeypatch):
    """A row group without footer statistics -> nulls=None, never 0."""
    import aws_medallion_datalake_ray.stages.stats as stats_mod

    p = str(tmp_path / "f.parquet")
    pq.write_table(pa.table({"a": [1, 2, None]}), p)

    real = pq.ParquetFile

    class _Col:
        statistics = None

    class _RG:
        def __init__(self, inner):
            self.num_rows = inner.num_rows

        def column(self, j):
            return _Col()

    class _MD:
        def __init__(self, inner):
            self._inner = inner
            self.num_row_groups = inner.num_row_groups
            self.num_rows = inner.num_rows

        def row_group(self, i):
            return _RG(self._inner.row_group(i))

    class NoStats:
        def __init__(self, path):
            pf = real(path)
            self.schema_arrow = pf.schema_arrow
            self.metadata = _MD(pf.metadata)

    monkeypatch.setattr(stats_mod.pq, "ParquetFile", NoStats)
    rows, _b, st = stats_mod.parquet_footer_stats(p, ("a",))
    assert rows == 3
    assert st["a"]["nulls"] is None
    assert st["a"]["min"] is None and st["a"]["max"] is None


# -------------------------------------------- 4. heterogeneous add_files dirs
def test_add_files_heterogeneous_schemas_same_dir(tmp_path):
    ext = tmp_path / "ext"
    ext.mkdir()
    a = str(ext / "a.parquet")
    b = str(ext / "b.parquet")
    pq.write_table(pa.table({"k": [1, 2, 3], "v": ["x", "y", "z"]}), a)
    pq.write_table(
        pa.table({"k": [4, 5, 6], "v": ["p", "q", "r"], "w": [9, 9, 9]}), b)

    t = LakeTable.create(str(tmp_path / "t"))
    t.add_files([a], run_ts=TS)
    t.evolve_schema(add={"w": (pa.int64(), 1)}, run_ts=TS)
    t.add_files([b], run_ts=TS)
    got = t.to_arrow().sort_by("k")
    assert got["k"].to_pylist() == [1, 2, 3, 4, 5, 6]
    # a-rows default-fill w=1; b-rows keep their REAL w=9 (pre-fix the
    # one-footer-per-dir grouping read b with a's column list)
    assert got["w"].to_pylist() == [1, 1, 1, 9, 9, 9]


# -------------------------------------------- 5. tag lock
def test_concurrent_taggers_lose_nothing(tmp_path):
    t = LakeTable.create(str(tmp_path / "tag"))
    t.append(make_source_files(10, seed=1), run_ts=TS)
    sid = t.store.head().snapshot_id
    errs = []

    def tag_many(prefix):
        try:
            for i in range(25):
                t.tag_snapshot(f"{prefix}-{i}", sid)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=tag_many, args=(p,))
               for p in ("a", "b", "c")]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    tags = t.tags()
    assert len(tags) == 75  # unlocked RMW loses tags here
    assert not os.path.exists(os.path.join(t.store.dir, "COMMIT.lock"))
