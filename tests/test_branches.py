"""Branch refs: writable named pointers sharing one snapshot tree.

The reference has no branch concept at all (its tables are Glue paths with
in-place overwrite, ``silver_digit_clean.py:127``); branches here are the
multi-commit generalization of write-audit-publish — an audited SERIES of
commits adopted by one fast-forward."""

import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files
from aws_medallion_datalake_ray.state.manifest import CommitConflict
from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"
TS2 = "2024-02-01T00:00:00"


@pytest.fixture()
def table(tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"))
    t.append(make_source_files(200, seed=41), run_ts=TS)
    return t


def test_branch_commits_do_not_move_main(table):
    head = table.store.head_id()
    table.create_branch("audit")
    br = table.branch("audit")
    br.append(make_source_files(50, seed=90), run_ts=TS2)
    assert table.store.head_id() == head
    assert table.scan().count() == 200
    assert br.scan().count() == 250
    assert table.branches()["audit"] == br.store.head_id()


def test_fast_forward_adopts_branch_series(table):
    table.create_branch("fix")
    br = table.branch("fix")
    br.append(make_source_files(30, seed=91), run_ts=TS2)
    br.append(make_source_files(20, seed=92), run_ts=TS2)
    snap = table.fast_forward("fix")
    assert table.store.head_id() == snap.snapshot_id
    assert table.scan().count() == 250


def test_fast_forward_refuses_diverged_main(table):
    table.create_branch("slow")
    br = table.branch("slow")
    br.append(make_source_files(10, seed=93), run_ts=TS2)
    table.append(make_source_files(10, seed=94), run_ts=TS2)  # main advances
    with pytest.raises(CommitConflict):
        table.fast_forward("slow")
    # branch is intact and can keep committing
    br.append(make_source_files(5, seed=95), run_ts=TS2)
    assert br.scan().count() == 215


def test_branch_maintenance_preserves_content(table):
    table.create_branch("maint")
    br = table.branch("maint")
    fp = br.content_checksum(("repo", "path"))
    br.compact(target_file_bytes=1 << 30, min_files_per_bin=1, run_ts=TS2)
    assert br.content_checksum(("repo", "path")) == fp
    # main never saw the compaction
    assert table.store.head().operation != "compact"
    table.fast_forward("maint")
    assert table.content_checksum(("repo", "path")) == fp


def test_create_branch_validations(table):
    table.create_branch("a")
    with pytest.raises(ValueError):
        table.create_branch("a")  # duplicate
    with pytest.raises(ValueError):
        table.create_branch("HEAD")
    with pytest.raises(FileNotFoundError):
        table.create_branch("ghost", at=99999)  # unknown snapshot


def test_dropped_branch_rejects_commits(table):
    table.create_branch("dead")
    br = table.branch("dead")
    table.drop_branch("dead")
    with pytest.raises((CommitConflict, ValueError)):
        br.append(make_source_files(5, seed=96), run_ts=TS2)


def test_branch_pins_retention_until_dropped(table):
    table.create_branch("keep")
    br = table.branch("keep")
    br.append(make_source_files(10, seed=97), run_ts=TS2)
    branch_head = br.store.head_id()
    # churn main far past keep_last
    for seed in (1, 2, 3, 4):
        table.append(make_source_files(5, seed=seed), run_ts=TS2)
    table.expire_snapshots(keep_last=1)
    # the branch chain survived expiry and still scans
    assert br.scan().count() == 210
    assert table.store.snapshot(branch_head).snapshot_id == branch_head
    # dropping the branch releases the pin; its snapshots expire + GC
    table.drop_branch("keep")
    table.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        table.store.snapshot(branch_head)
    orphans = table.gc_orphans(dry_run=True)
    assert orphans  # the branch-only data files are now collectable
    table.gc_orphans()
    assert table.scan().count() == 220  # main unaffected


def test_branch_at_historic_snapshot_time_travels_writes(table):
    first = table.store.head_id()
    table.append(make_source_files(40, seed=98), run_ts=TS2)
    table.create_branch("redo", at=first)
    br = table.branch("redo")
    assert br.scan().count() == 200  # pre-second-append state
    br.append(make_source_files(1, seed=99), run_ts=TS2)
    assert br.scan().count() == 201
    assert table.scan().count() == 240


def test_concurrent_branch_and_main_commits_serialize(table):
    """Branch and main writers share ONE commit lock: interleaved commits
    from two threads never lose an update on either ref."""
    import threading

    table.create_branch("race")
    br = table.branch("race")
    errs = []

    def main_writer():
        try:
            for i in range(5):
                table.append(make_source_files(20, seed=100 + i), run_ts=TS2)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def branch_writer():
        try:
            for i in range(5):
                br.append(make_source_files(20, seed=200 + i), run_ts=TS2)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = [threading.Thread(target=main_writer),
          threading.Thread(target=branch_writer)]
    [t.start() for t in th]
    [t.join() for t in th]
    assert not errs
    assert table.scan().count() == 300   # 200 + 5x20
    assert br.scan().count() == 300      # 200 + 5x20
    # both chains are intact ancestries of their refs
    assert table.store.head_id() != br.store.head_id()


def test_branch_handle_expire_never_deletes_main_history(table):
    """expire through a BRANCH handle must pin main's whole chain — only
    the branch's own ancestry is subject to keep_last."""
    table.create_branch("side")  # fork FIRST ...
    main_ids = [table.store.head_id()]
    for seed in (11, 12):  # ... then main advances PAST the fork point:
        table.append(make_source_files(10, seed=seed), run_ts=TS2)
        main_ids.append(table.store.head_id())  # not branch ancestors
    br = table.branch("side")
    for seed in (13, 14, 15):
        br.append(make_source_files(10, seed=seed), run_ts=TS2)
    br.expire_snapshots(keep_last=1)
    # every main snapshot still resolves; main still scans
    for sid in main_ids:
        assert table.store.snapshot(sid).snapshot_id == sid
    assert table.scan().count() == 220
    assert br.scan().count() == 230
    table.gc_orphans()
    assert table.scan().count() == 220


def test_branch_handle_drop_staged_refuses_ref_chains(table):
    """drop_staged through a branch handle must refuse snapshots on MAIN's
    chain (and any other ref's) — not just the branch's own ancestry."""
    table.create_branch("side2")
    main_head = table.store.head_id()
    table.append(make_source_files(5, seed=31), run_ts=TS2)  # main advances
    advanced = table.store.head_id()
    br = table.branch("side2")
    for sid in (main_head, advanced):
        with pytest.raises(ValueError, match="published/ref chain"):
            br.drop_staged(sid)
    # a genuinely staged snapshot still drops fine through the branch handle
    staged = table.stage_append(make_source_files(5, seed=32), run_ts=TS2)
    br.drop_staged(staged.snapshot_id)
    with pytest.raises(FileNotFoundError):
        table.store.snapshot(staged.snapshot_id)
