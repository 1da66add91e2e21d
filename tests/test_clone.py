"""SHALLOW CLONE: zero-copy independent tables sharing immutable files."""

import os

import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files, make_updates
from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"
TS2 = "2024-02-01T00:00:00"
FP = ("repo", "path", "commit", "lang", "content")


@pytest.fixture()
def table(tmp_path):
    t = LakeTable.create(str(tmp_path / "src"))
    t.append(make_source_files(300, seed=41), run_ts=TS)
    t.append(make_source_files(100, seed=42), run_ts=TS)
    return t


def test_clone_is_zero_copy_and_equal(table, tmp_path):
    fp = table.content_checksum(FP)
    c = table.clone_to(str(tmp_path / "dst"), run_ts=TS2)
    assert c.content_checksum(FP) == fp
    # zero data copied: the clone's data dir is empty
    files_in_dest = [
        f for _d, _s, fs in os.walk(os.path.join(str(tmp_path / "dst"), "data"))
        for f in fs
    ]
    assert files_in_dest == []
    assert c.store.head().operation == "clone"


def test_clone_diverges_independently(table, tmp_path):
    fp_src = table.content_checksum(FP)
    c = table.clone_to(str(tmp_path / "dst"), run_ts=TS2)
    c.merge(make_updates(make_source_files(300, seed=41), 50, seed=9),
            run_ts=TS2)
    c.compact(min_files_per_bin=1, run_ts=TS2)
    assert table.content_checksum(FP) == fp_src  # source untouched
    assert c.content_checksum(FP) != fp_src
    # clone GC never deletes the source's files
    c.expire_snapshots(keep_last=1)
    deleted = c.gc_orphans()
    assert all(not os.path.isabs(p) or str(tmp_path / "src") not in p
               for p in deleted)
    assert table.scan().count() == 400


def test_clone_pins_source_snapshot_against_retention(table, tmp_path):
    src_head = table.store.head_id()
    table.clone_to(str(tmp_path / "dst"), run_ts=TS2)
    assert table.tags().get(f"clone-dst-{src_head}") == src_head
    # churn + retention on the source: the pinned snapshot survives
    for seed in (1, 2, 3):
        table.overwrite(make_source_files(50, seed=seed), run_ts=TS2)
    table.expire_snapshots(keep_last=1)
    table.gc_orphans()
    c = LakeTable(str(tmp_path / "dst"))
    assert c.scan().count() == 400  # still fully readable


def test_clone_carries_evolution_spec(table, tmp_path):
    table.evolve_schema(add={"stars": (pa.int64(), 7)},
                        rename={"lang": "language"}, run_ts=TS)
    c = table.clone_to(str(tmp_path / "dst"), run_ts=TS2)
    got = c.to_arrow(columns=["language", "stars"])
    assert got.num_rows == 400
    assert got["stars"].null_count == 0


def test_clone_pinned_snapshot(table, tmp_path):
    first = table.store.snapshots()[0].snapshot_id
    c = table.clone_to(str(tmp_path / "old"), snapshot_id=first, run_ts=TS2)
    assert c.scan().count() == 300  # pre-second-append state


def test_clone_carries_pending_delete_spec(table, tmp_path):
    table.delete_where([("lang", "==", "py")], mode="lazy", run_ts=TS)
    n_src = table.scan().count()  # masked already
    c = table.clone_to(str(tmp_path / "dst"), run_ts=TS2)
    assert c.scan().count() == n_src
    assert c.scan(predicate=[("lang", "==", "py")]).count() == 0
    # materializing in the clone does not disturb the source's pending spec
    c.apply_pending_deletes(run_ts=TS2)
    assert c.scan().count() == n_src
    assert table.scan().count() == n_src


def test_clone_carries_blooms_and_partition_pruning(tmp_path):
    from aws_medallion_datalake_ray.state.table import prune_files

    base = make_source_files(400, seed=5)
    t = LakeTable.create(str(tmp_path / "psrc"), partition_cols=("lang",))
    for i in range(0, 400, 100):
        t.append(base.slice(i, 100), run_ts=TS)
    t.build_blooms(["path"], run_ts=TS)
    probe = base["path"][0].as_py()
    c = t.clone_to(str(tmp_path / "pdst"), run_ts=TS2)
    # partition values carried: equality scan prunes to one partition
    files = c.files()
    py = prune_files(files, [("lang", "==", "py")])
    assert py and all(f.partition.get("lang") == "py" for f in py)
    # blooms carried: a point probe keeps fewer files than the full set
    hit = prune_files(files, [("path", "==", probe)])
    assert 0 < len(hit) < len(files)
    assert any("bloom" in f.stats.get("path", {}) for f in files)
