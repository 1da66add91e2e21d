"""Manifest/snapshot tree: atomic swap, incremental commits, conflicts, expiry."""

import pytest

from aws_medallion_datalake_ray.state.manifest import (
    MANIFEST_CHUNK,
    CommitConflict,
    DataFile,
    ManifestStore,
)

TS = "2024-01-01T00:00:00"


def df(path, rows=10, size=100, **stats):
    return DataFile(path=path, rows=rows, bytes=size, stats=stats)


def test_commit_and_head(tmp_path):
    st = ManifestStore(str(tmp_path))
    assert st.head() is None
    s1 = st.commit([df("data/a.parquet")], [], "append", TS)
    assert s1.snapshot_id == 1 and st.head_id() == 1
    s2 = st.commit([df("data/b.parquet")], [], "append", TS)
    assert {f.path for f in st.files()} == {"data/a.parquet", "data/b.parquet"}
    assert s2.parent_id == 1
    # snapshot-consistent read of the older snapshot
    assert {f.path for f in st.files(s1)} == {"data/a.parquet"}


def test_remove_and_incremental_manifest_reuse(tmp_path):
    st = ManifestStore(str(tmp_path))
    st.commit([df("data/a.parquet")], [], "append", TS)
    s2 = st.commit([df("data/b.parquet")], [], "append", TS)
    # 2 manifests now; removing b should rewrite only b's manifest
    s3 = st.commit([df("data/c.parquet")], ["data/b.parquet"], "compact", TS)
    assert {f.path for f in st.files(s3)} == {"data/a.parquet", "data/c.parquet"}
    reused = set(s2.manifests) & set(s3.manifests)
    assert reused  # at least one parent manifest reused by reference


def test_remove_unknown_file_raises(tmp_path):
    st = ManifestStore(str(tmp_path))
    st.commit([df("data/a.parquet")], [], "append", TS)
    with pytest.raises(ValueError):
        st.commit([], ["data/zzz.parquet"], "compact", TS)


def test_optimistic_conflict(tmp_path):
    st = ManifestStore(str(tmp_path))
    s1 = st.commit([df("data/a.parquet")], [], "append", TS)
    st.commit([df("data/b.parquet")], [], "append", TS)  # concurrent writer won
    with pytest.raises(CommitConflict):
        st.commit([df("data/c.parquet")], [], "append", TS, expected_parent=s1.snapshot_id)


def test_summary_totals(tmp_path):
    st = ManifestStore(str(tmp_path))
    st.commit([df("data/a.parquet", rows=5, size=50)], [], "append", TS)
    s2 = st.commit([df("data/b.parquet", rows=7, size=70)], [], "append", TS)
    assert s2.summary["total_files"] == 2
    assert s2.summary["total_rows"] == 12
    assert s2.summary["total_bytes"] == 120


def test_concurrent_commits_serialize(tmp_path):
    """Many writers racing on the O_EXCL commit lock: all commits land, no
    lost updates, snapshot ids strictly sequential."""
    import threading

    st = ManifestStore(str(tmp_path))
    st.commit([df("data/base.parquet")], [], "append", TS)
    errors = []

    def writer(i):
        try:
            ManifestStore(str(tmp_path)).commit(
                [df(f"data/w{i}.parquet")], [], "append", TS
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert st.head_id() == 9
    paths = {f.path for f in st.files()}
    assert paths == {"data/base.parquet"} | {f"data/w{i}.parquet" for i in range(8)}


def test_expire_keeps_reachable_manifests(tmp_path):
    st = ManifestStore(str(tmp_path))
    st.commit([df("data/a.parquet")], [], "append", TS)
    st.commit([df("data/b.parquet")], [], "append", TS)
    st.commit([df("data/c.parquet")], [], "append", TS)
    expired = st.expire(keep_last=2)
    assert expired == [1]
    ids = [s.snapshot_id for s in st.snapshots()]
    assert ids == [2, 3]
    # remaining snapshots still fully readable
    assert len(st.files(st.head())) == 3
    assert len(st.files(st.snapshot(2))) == 2
