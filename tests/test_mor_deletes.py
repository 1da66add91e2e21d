"""Merge-on-read (lazy) DELETE: O(manifest) predicate deletes whose rows are
masked at scan time and folded into files by apply_pending_deletes — the
Iceberg-v2 delete-file semantics, expressed as predicate specs riding the
snapshot chain (cf. copy-on-write ``delete_where``, the default mode)."""

import pandas as pd
import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"
FP = ("repo", "path", "commit", "lang", "content")


def _mk(n: int = 300) -> pa.Table:
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    df = pd.DataFrame({
        "repo": [f"org/r{i % 10}" for i in range(n)],
        "path": [f"p{i}" for i in range(n)],
        "commit": [f"{i:040x}" for i in range(n)],
        "lang": ["py" if i % 3 else "go" for i in range(n)],
        "content": [f"line {i} " * 4 for i in range(n)],
    })
    return pa.Table.from_pandas(df, preserve_index=False).cast(SOURCE_FILES_SCHEMA)


@pytest.fixture()
def t(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"))
    src = _mk()
    for i in range(0, len(src), 100):
        t.append(src.slice(i, 100), run_ts=TS)
    return t


def test_lazy_delete_masks_rows_without_rewrite(t):
    files_before = {f.path for f in t.files()}
    n_go = t.scan(predicate=[("lang", "==", "go")]).count()
    assert n_go > 0
    out = t.delete_where([("lang", "==", "go")], run_ts=TS, mode="lazy")
    assert out["files_rewritten"] == 0 and out["files_masked"] > 0
    # no data file moved — the DELETE was a metadata commit
    assert {f.path for f in t.files()} == files_before
    # but scans, to_arrow and counts see the logical content
    assert t.scan(predicate=[("lang", "==", "go")]).count() == 0
    got = t.to_arrow(columns=["lang"])["lang"].to_pylist()
    assert "go" not in got
    assert t.scan().count() == 300 - n_go
    # column pruning still works when the spec column isn't requested
    assert t.scan(columns=["path"]).count() == 300 - n_go
    assert set(t.scan(columns=["path"]).schema().names) == {"path"}


def test_lazy_delete_time_travel_and_materialize(t):
    pre = t.store.head().snapshot_id
    n_go = t.scan(predicate=[("lang", "==", "go")]).count()
    t.delete_where([("lang", "==", "go")], run_ts=TS, mode="lazy")
    fp_lazy = t.content_fingerprint(FP)
    # time travel BEFORE the delete sees the rows
    assert t.scan(snapshot_id=pre).count() == 300
    # materialization changes nothing logically, clears the specs
    res = t.apply_pending_deletes(run_ts=TS)
    assert res["specs_applied"] == 1 and res["rows_deleted"] == n_go
    assert t._pending_deletes() == []
    assert t.content_fingerprint(FP) == fp_lazy
    assert t.scan().count() == 300 - n_go
    # physical rows are gone now
    assert sum(f.rows for f in t.files()) == 300 - n_go


def test_lazy_matches_copy_on_write_twin(tmp_path):
    ta = LakeTable.create(str(tmp_path / "a"))
    tb = LakeTable.create(str(tmp_path / "b"))
    src = _mk()
    for x in (ta, tb):
        for i in range(0, len(src), 100):
            x.append(src.slice(i, 100), run_ts=TS)
    pred = [("repo", "==", "org/r3")]
    ta.delete_where(pred, run_ts=TS, mode="lazy")
    tb.delete_where(pred, run_ts=TS)  # copy-on-write
    assert ta.content_fingerprint(FP) == tb.content_fingerprint(FP)
    ta.apply_pending_deletes(run_ts=TS)
    assert ta.content_fingerprint(FP) == tb.content_fingerprint(FP)


def test_stacked_specs_and_rewriting_op_guard(t):
    t.delete_where([("lang", "==", "go")], run_ts=TS, mode="lazy")
    t.delete_where([("repo", "==", "org/r1")], run_ts=TS, mode="lazy")
    assert len(t._pending_deletes()) == 2
    expect = t.scan().count()
    fp = t.content_fingerprint(FP)
    # a rewriting op must NOT resurrect masked rows: compact materializes
    # the specs first, then rewrites
    t.compact(target_file_bytes=4 * 1024 * 1024, run_ts=TS)
    assert t._pending_deletes() == []
    assert t.scan().count() == expect
    assert t.content_fingerprint(FP) == fp
    assert t.scan(predicate=[("lang", "==", "go")]).count() == 0
    assert t.scan(predicate=[("repo", "==", "org/r1")]).count() == 0


def test_merge_does_not_resurrect_lazy_deleted_rows(t):
    t.delete_where([("lang", "==", "go")], run_ts=TS, mode="lazy")
    survivors = t.scan().count()
    # upsert ONE existing py row (merge auto-materializes pending specs)
    one = t.to_arrow().slice(0, 1)
    one = one.set_column(
        one.schema.get_field_index("content"), "content",
        pa.array(["updated!"], pa.large_string()))
    t.merge(one, run_ts=TS)
    assert t._pending_deletes() == []
    assert t.scan().count() == survivors
    assert t.scan(predicate=[("lang", "==", "go")]).count() == 0


def test_concurrent_lazy_deletes_keep_both_specs(tmp_path):
    """The pending-spec list is read-modify-write summary state: a lazy
    delete racing another writer's lazy delete must RETRY (optimistic
    parent check), not silently wipe the other spec and resurrect its
    rows."""
    t = LakeTable.create(str(tmp_path / "c"))
    src = _mk()
    for i in range(0, len(src), 100):
        t.append(src.slice(i, 100), run_ts=TS)
    t2 = LakeTable(t.root)  # competing writer on the same table
    real_commit = t.store.commit
    state = {"injected": False}

    def racing_commit(*a, **kw):
        if not state["injected"]:
            state["injected"] = True  # lands BETWEEN t's spec read + commit
            t2.delete_where([("repo", "==", "org/r5")], run_ts=TS, mode="lazy")
        return real_commit(*a, **kw)

    t.store.commit = racing_commit
    try:
        t.delete_where([("lang", "==", "go")], run_ts=TS, mode="lazy")
    finally:
        t.store.commit = real_commit
    specs = t._pending_deletes()
    assert len(specs) == 2, specs
    assert t.scan(predicate=[("lang", "==", "go")]).count() == 0
    assert t.scan(predicate=[("repo", "==", "org/r5")]).count() == 0


def test_partition_column_only_projection(tmp_path):
    """Regression (found by q58): scanning ONLY partition columns on a Hive
    table must return every row with the manifest values attached — a
    zero-physical-column read used to come back empty."""
    t = LakeTable.create(str(tmp_path / "pc"), partition_cols=("lang",))
    src = _mk()
    t.append(src, run_ts=TS)
    ds = t.scan(columns=["lang"])
    assert ds.count() == len(src)
    assert ds.schema().names == ["lang"]
    got = sorted(set(t.to_arrow(columns=["lang"])["lang"].to_pylist()))
    assert got == sorted(set(src["lang"].to_pylist()))


def test_lazy_delete_partition_drop_is_metadata_only(tmp_path):
    t = LakeTable.create(str(tmp_path / "p"), partition_cols=("lang",))
    src = _mk()
    t.append(src, run_ts=TS)
    n_go = sum(1 for v in src["lang"].to_pylist() if v == "go")
    out = t.delete_where([("lang", "==", "go")], run_ts=TS, mode="lazy")
    # partition fully covered -> dropped with zero IO even in lazy mode
    assert out["files_dropped"] >= 1 and out["files_masked"] == 0
    assert out["rows_deleted_metadata_only"] == n_go
    assert t._pending_deletes() == []
    assert t.scan().count() == 300 - n_go


def test_rollback_across_lazy_delete_restores_masked_rows(tmp_path, ray_session):
    """Rollback to a pre-delete snapshot must RESTORE the target's spec
    state — not inherit the current head's pending masks (which would keep
    hiding rows the restored snapshot had)."""
    from aws_medallion_datalake_ray.sources.fixtures import make_source_files

    t = LakeTable.create(str(tmp_path / "rb"))
    t.append(make_source_files(200, seed=1), run_ts=TS)
    pre = t.store.head_id()
    n_pre = t.scan().count()
    t.delete_where([("lang", "==", "py")], mode="lazy", run_ts=TS)
    assert t.scan().count() < n_pre
    t.rollback(pre, run_ts=TS)
    assert t.scan().count() == n_pre
    # and rolling FORWARD to the post-delete snapshot re-masks
    assert t._pending_deletes() == []
