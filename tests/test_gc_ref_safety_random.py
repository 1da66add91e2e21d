"""Randomized ref/retention/GC interleaving safety (round-5 belt after the
four targeted audit fixes in this family): NO interleaving of append /
tag / branch / clone / rollback / fast-forward / expire / gc may ever
delete a file reachable from any live ref — main HEAD, any tag, any
branch head, any shallow clone's pinned source snapshot.

Seeded and deterministic: 200 ops from one RNG; after every expire/gc the
full reachability invariant is re-checked, and at the end every surviving
ref is scanned end-to-end and must return exactly its tracked row count."""

import os

import numpy as np
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files
from aws_medallion_datalake_ray.state.manifest import CommitConflict
from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"


def _abs(t: LakeTable, p: str) -> str:
    return p if os.path.isabs(p) else t.abs(p)


def _assert_refs_intact(t: LakeTable, clones: list) -> None:
    live = {s.snapshot_id for s in t.store.snapshots()}
    for name, sid in t.tags().items():
        assert sid in live, f"tag {name} dangles: snapshot {sid} expired"
    for name, sid in t.branches().items():
        assert sid in live, f"branch {name} dangles: snapshot {sid} expired"
    for s in t.store.snapshots():
        for f in t.store.files(s):
            assert os.path.exists(_abs(t, f.path)), \
                f"snapshot {s.snapshot_id} lost file {f.path}"
    for c, _rows in clones:
        for s in c.store.snapshots():
            for f in c.store.files(s):
                assert os.path.exists(_abs(c, f.path)), \
                    f"clone {c.root} lost file {f.path} (source GC?)"


@pytest.mark.parametrize("seed0", [20260818, 414243])
def test_random_ref_gc_interleaving_never_breaks_a_ref(tmp_path, ray_session, seed0):
    rng = np.random.default_rng(seed0)
    t = LakeTable.create(str(tmp_path / "tbl"))
    seed = 1000
    snap = t.append(make_source_files(40, seed=seed), run_ts=TS)

    rows_at = {snap.snapshot_id: 40}   # rows per committed snapshot
    main_rows = 40
    my_tags: dict[str, int] = {}       # tag -> expected rows
    branch_rows: dict[str, int] = {}   # branch -> expected rows
    clones: list = []                  # (LakeTable, expected rows)
    n_branches = n_clones = 0

    for step in range(200):
        seed += 1
        op = rng.choice(
            ["append", "tag", "drop_tag", "mk_branch", "br_append",
             "drop_branch", "clone", "rollback", "ff", "expire", "gc"],
            p=[0.33, 0.10, 0.05, 0.06, 0.12, 0.04, 0.03, 0.07, 0.04,
               0.08, 0.08])
        if op == "append":
            n = int(rng.integers(10, 40))
            s = t.append(make_source_files(n, seed=seed), run_ts=TS)
            main_rows += n
            rows_at[s.snapshot_id] = main_rows
        elif op == "tag":
            name = f"t{step}"
            t.tag_snapshot(name)
            my_tags[name] = main_rows
        elif op == "drop_tag" and my_tags:
            name = list(my_tags)[int(rng.integers(0, len(my_tags)))]
            t.drop_tag(name)
            del my_tags[name]
        elif op == "mk_branch" and n_branches < 8:
            name = f"b{step}"
            t.create_branch(name)
            branch_rows[name] = main_rows
            n_branches += 1
        elif op == "br_append" and branch_rows:
            name = list(branch_rows)[int(rng.integers(0, len(branch_rows)))]
            n = int(rng.integers(5, 25))
            br = t.branch(name)
            s = br.append(make_source_files(n, seed=seed), run_ts=TS)
            branch_rows[name] += n
            rows_at[s.snapshot_id] = branch_rows[name]
        elif op == "drop_branch" and branch_rows:
            name = list(branch_rows)[int(rng.integers(0, len(branch_rows)))]
            t.drop_branch(name)
            del branch_rows[name]
        elif op == "clone" and n_clones < 6:
            dest = str(tmp_path / f"clone{step}")
            c = t.clone_to(dest, run_ts=TS)
            clones.append((c, main_rows))
            n_clones += 1
        elif op == "rollback":
            ids = sorted(rows_at)
            sid = ids[int(rng.integers(0, len(ids)))]
            if sid in {s.snapshot_id for s in t.store.snapshots()}:
                s = t.rollback(sid, run_ts=TS)
                main_rows = rows_at[sid]
                rows_at[s.snapshot_id] = main_rows
        elif op == "ff" and branch_rows:
            name = list(branch_rows)[int(rng.integers(0, len(branch_rows)))]
            try:
                t.fast_forward(name)
                main_rows = branch_rows[name]
            except CommitConflict:
                pass  # main advanced since the fork — correct refusal
        elif op == "expire":
            t.expire_snapshots(keep_last=int(rng.integers(1, 4)))
            _assert_refs_intact(t, clones)
        elif op == "gc":
            t.gc_orphans()
            _assert_refs_intact(t, clones)

    # terminal vacuum: tightest retention, then GC — refs must all survive
    t.expire_snapshots(keep_last=1)
    t.gc_orphans()
    _assert_refs_intact(t, clones)

    # end-to-end: every surviving ref scans and returns its tracked rows
    assert t.scan().count() == main_rows
    for name, n in my_tags.items():
        assert t.scan_tag(name).count() == n, f"tag {name}"
    for name, n in branch_rows.items():
        assert t.branch(name).scan().count() == n, f"branch {name}"
    for c, n in clones:
        assert c.scan().count() == n, f"clone {c.root}"
