"""Schema evolution: metadata-only add/rename/widen with on-the-fly scan
reconciliation, physical upgrade via compact, and exact time travel."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files
from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"


@pytest.fixture()
def table(tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"))
    base = make_source_files(300, seed=11)
    t.append(base.slice(0, 150), run_ts=TS)
    t.append(base.slice(150, 150), run_ts=TS)
    return t


def test_add_column_with_default(table):
    pre = table.store.head().snapshot_id
    table.evolve_schema(add={"stars": (pa.int64(), 0)}, run_ts=TS)
    got = table.to_arrow()
    assert "stars" in got.column_names
    assert got["stars"].null_count == 0
    assert set(got["stars"].to_pylist()) == {0}
    # time travel to the pre-evolution snapshot sees the old schema
    old = table.to_arrow(snapshot_id=pre)
    assert "stars" not in old.column_names


def test_add_column_null_default(table):
    table.evolve_schema(add={"notes": pa.string()}, run_ts=TS)
    got = table.to_arrow()
    assert got["notes"].null_count == len(got)


def test_rename_column_and_scan(table):
    n_py = len(table.to_arrow(predicate=[("lang", "==", "py")]))
    table.evolve_schema(rename={"lang": "language"}, run_ts=TS)
    got = table.to_arrow(columns=["language", "repo"])
    assert got.column_names == ["language", "repo"]
    # predicate on the NEW name over OLD files (physical pushdown translated)
    assert len(table.to_arrow(predicate=[("language", "==", "py")])) == n_py


def test_chained_rename(table):
    table.evolve_schema(rename={"lang": "language"}, run_ts=TS)
    table.evolve_schema(rename={"language": "lingua"}, run_ts=TS)
    spec = table.store.head().summary["evolution"]
    assert spec["renames"]["lang"] == "lingua"
    assert spec["renames"]["language"] == "lingua"
    got = table.to_arrow()
    assert "lingua" in got.column_names
    # pre-FIRST-rename files (physical name 'lang') must still resolve: the
    # one-to-many inverse picks whichever historical name a file carries
    assert got["lingua"].null_count == 0
    assert len(table.to_arrow(predicate=[("lingua", "==", "py")])) > 0


def test_add_of_historical_rename_source_rejected(table):
    """Re-adding a renamed-away name would make old files carry the physical
    name twice for the reader — refuse until compaction retires it."""
    table.evolve_schema(rename={"lang": "language"}, run_ts=TS)
    with pytest.raises(ValueError):
        table.evolve_schema(add={"lang": (pa.string(), "x")}, run_ts=TS)
    with pytest.raises(ValueError):
        table.evolve_schema(rename={"repo": "lang"}, run_ts=TS)
    # scans keep working after the rejected attempts
    assert len(table.to_arrow()) == 300


def test_widen_type(tmp_path):
    t = LakeTable.create(str(tmp_path / "w"), stats_cols=("k",))
    t.append(pa.table({"k": pa.array([1, 2, 3], pa.int32()),
                       "v": ["a", "b", "c"]}), run_ts=TS)
    t.evolve_schema(widen={"k": pa.int64()}, run_ts=TS)
    got = t.to_arrow()
    assert got.schema.field("k").type == pa.int64()
    assert got["k"].to_pylist() == [1, 2, 3]


def test_predicate_on_added_column_post_filter(table):
    n = len(table.to_arrow())
    table.evolve_schema(add={"stars": (pa.int64(), 0)}, run_ts=TS)
    assert len(table.to_arrow(predicate=[("stars", "==", 0)])) == n
    assert len(table.to_arrow(predicate=[("stars", ">", 0)])) == 0
    # conjunction mixing pushable and synthesized terms
    n_py = len(table.to_arrow(predicate=[("lang", "==", "py")]))
    assert len(table.to_arrow(
        predicate=[("lang", "==", "py"), ("stars", "==", 0)])) == n_py


def test_compact_materializes_evolution(table):
    table.evolve_schema(add={"stars": (pa.int64(), 7)},
                        rename={"lang": "language"}, run_ts=TS)
    fp_before = table.content_fingerprint(("repo", "path", "language", "stars"))
    table.compact(target_file_bytes=64 * 1024 * 1024, run_ts=TS)
    fp_after = table.content_fingerprint(("repo", "path", "language", "stars"))
    assert fp_before == fp_after
    # compacted files physically carry the evolved schema
    f = table.files()[0]
    phys = pq.read_schema(table.abs(f.path))
    assert "stars" in phys.names and "language" in phys.names
    assert "lang" not in phys.names


def test_append_old_shape_after_evolve(table):
    """Writers lagging behind the evolution keep working: their files are
    reconciled at scan like any pre-evolution file."""
    table.evolve_schema(add={"stars": (pa.int64(), 0)}, run_ts=TS)
    table.append(make_source_files(50, seed=99), run_ts=TS)
    got = table.to_arrow()
    assert len(got) == 350
    assert got["stars"].null_count == 0
    sch = table.schema()
    assert "stars" in sch.names


def test_merge_after_evolution(table):
    from aws_medallion_datalake_ray.sources.fixtures import make_updates

    base = table.to_arrow(columns=["repo", "path", "commit", "lang", "content"])
    table.evolve_schema(add={"stars": (pa.int64(), 0)}, run_ts=TS)
    upd_old_shape = make_updates(base, 40, seed=3)
    # updates conform to the evolved schema (stars present)
    upd = upd_old_shape.append_column(
        "stars", pa.array([1] * len(upd_old_shape), pa.int64()))
    res = table.merge(upd, run_ts="2024-01-02T00:00:00")
    n_keys = len(set(zip(upd["repo"].to_pylist(), upd["path"].to_pylist(),
                         upd["commit"].to_pylist())))
    assert res["updates"] == n_keys  # merge keeps the latest per key
    got = table.to_arrow()
    assert len(got) >= 300
    assert set(got["stars"].to_pylist()) == {0, 1}


def test_partition_columns_are_immutable(tmp_path):
    t = LakeTable.create(str(tmp_path / "p"), partition_cols=("lang",))
    t.append(make_source_files(50, seed=1), run_ts=TS)
    with pytest.raises(NotImplementedError):
        t.evolve_schema(rename={"lang": "language"}, run_ts=TS)
    with pytest.raises(NotImplementedError):
        t.evolve_schema(widen={"lang": pa.large_string()}, run_ts=TS)


def test_partitioned_table_evolution(tmp_path):
    """Add + data-column rename on a Hive-partitioned table: old files
    reconcile with manifest partition values attached; partition pruning
    still exact; compact upgrades without materializing partition cols."""
    t = LakeTable.create(str(tmp_path / "p"), partition_cols=("lang",))
    base = make_source_files(200, seed=13)
    t.append(base.slice(0, 100), run_ts=TS)
    t.append(base.slice(100, 100), run_ts=TS)  # 2 files/partition -> bins
    n_py = t.scan(predicate=[("lang", "==", "py")]).count()
    t.evolve_schema(add={"stars": (pa.int64(), 4)},
                    rename={"path": "filepath"}, run_ts=TS)
    got = t.to_arrow()
    assert len(got) == 200
    assert set(got["stars"].to_pylist()) == {4}
    assert "filepath" in got.column_names and "path" not in got.column_names
    assert got["lang"].null_count == 0  # partition values attached
    # partition pruning + predicate on the renamed data column
    assert t.scan(predicate=[("lang", "==", "py")]).count() == n_py
    got_py = t.to_arrow(predicate=[("lang", "==", "py"), ("stars", "==", 4)])
    assert len(got_py) == n_py
    # compact keeps content, upgrades files, leaves partition cols virtual
    fp0 = t.content_fingerprint(("repo", "filepath", "lang", "stars"))
    t.compact(target_file_bytes=64 * 1024 * 1024, run_ts=TS)
    assert t.content_fingerprint(("repo", "filepath", "lang", "stars")) == fp0
    import pyarrow.parquet as _pq

    # range predicate on the partition column: exact via post-attach residue
    # (the non-evolved path refuses it; the evolved path evaluates it)
    langs = sorted(set(base["lang"].to_pylist()))
    below = {v for v in langs if v < langs[len(langs) // 2]}
    n_below = sum(1 for v in base["lang"].to_pylist() if v in below)
    assert len(t.to_arrow(
        predicate=[("lang", "<", langs[len(langs) // 2])])) == n_below
    compacted = [f for f in t.files() if "compacted-" in f.path]
    assert compacted, "no bins formed; fixture needs 2+ files per partition"
    phys = _pq.read_schema(t.abs(compacted[0].path))
    assert "lang" not in phys.names          # still virtual (Hive)
    assert "stars" in phys.names and "filepath" in phys.names


def test_random_evolution_sequences_preserve_content(tmp_path):
    """Property: any interleaving of evolve/append/compact/zorder keeps the
    (repo, path, commit, content) multiset intact and scans stay coherent
    with the current schema."""
    import random

    rng = random.Random(7)
    t = LakeTable.create(str(tmp_path / "seq"))
    t.append(make_source_files(200, seed=1), run_ts=TS)
    fp_cols = ("repo", "path", "commit", "content")
    fp0 = t.content_fingerprint(fp_cols)
    n_rows = 200
    added_cols = 0
    for step in range(8):
        op = rng.choice(["evolve_add", "evolve_rename", "append", "compact"])
        if op == "evolve_add":
            added_cols += 1
            t.evolve_schema(add={f"extra{added_cols}": (pa.int64(), step)},
                            run_ts=TS)
        elif op == "evolve_rename":
            sch = t.schema()
            cands = [c for c in sch.names if c.startswith("extra")]
            if cands:
                src = rng.choice(cands)
                t.evolve_schema(rename={src: f"{src}_r{step}"}, run_ts=TS)
        elif op == "append":
            t.append(make_source_files(50, seed=100 + step), run_ts=TS)
            n_rows += 50
        else:
            t.compact(target_file_bytes=32 * 1024 * 1024, run_ts=TS)
        got = t.to_arrow()
        assert len(got) == n_rows
        assert set(got.column_names) == set(t.schema().names)
    assert t.content_fingerprint(fp_cols) != "" and len(t.to_arrow()) == n_rows
    # the original columns' content survived every mutation
    base_now = t.to_arrow(columns=list(fp_cols))
    import hashlib

    from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols

    allh = np.sort(hash_batch_cols(base_now, fp_cols))
    # recompute expected multiset from the inputs that were appended
    exp = [make_source_files(200, seed=1)]
    seeds = []
    rng2 = random.Random(7)
    added2 = 0
    for step in range(8):
        op = rng2.choice(["evolve_add", "evolve_rename", "append", "compact"])
        if op == "append":
            seeds.append(100 + step)
        elif op == "evolve_add":
            added2 += 1
    exp += [make_source_files(50, seed=s) for s in seeds]
    exp_t = pa.concat_tables(exp)
    exph = np.sort(hash_batch_cols(exp_t, fp_cols))
    assert np.array_equal(allh, exph)


def test_overwrite_clears_spec(table):
    table.evolve_schema(add={"stars": (pa.int64(), 0)}, run_ts=TS)
    assert table._evolution() is not None
    table.overwrite(make_source_files(30, seed=5), run_ts=TS)
    assert table._evolution() is None
    assert "stars" not in table.to_arrow().column_names
