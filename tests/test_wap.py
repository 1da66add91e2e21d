"""Write-audit-publish: staged snapshots, publish/abandon, retention."""

import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files
from aws_medallion_datalake_ray.state.manifest import CommitConflict
from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"


@pytest.fixture()
def table(tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"))
    t.append(make_source_files(200, seed=41), run_ts=TS)
    return t


def test_stage_does_not_move_head(table):
    head_before = table.store.head_id()
    staged = table.stage_append(make_source_files(50, seed=90), run_ts=TS)
    assert table.store.head_id() == head_before
    assert staged.summary.get("staged") is True
    # readers see the old table; auditors see the staged one
    assert table.scan().count() == 200
    assert table.scan(snapshot_id=staged.snapshot_id).count() == 250


def test_publish_moves_head_atomically(table):
    staged = table.stage_append(make_source_files(50, seed=91), run_ts=TS)
    # audit: checksum over the staged snapshot before anyone can read it
    assert table.content_checksum(("repo", "path"),
                                  snapshot_id=staged.snapshot_id) != 0
    table.publish(staged.snapshot_id)
    assert table.store.head_id() == staged.snapshot_id
    assert table.scan().count() == 250


def test_publish_conflicts_when_table_advanced(table):
    staged = table.stage_append(make_source_files(50, seed=92), run_ts=TS)
    table.append(make_source_files(10, seed=93), run_ts=TS)  # someone else lands
    with pytest.raises(CommitConflict):
        table.publish(staged.snapshot_id)
    # the staged snapshot is still auditable and can be abandoned
    table.drop_staged(staged.snapshot_id)


def test_staged_ids_never_collide_with_commits(table):
    staged = table.stage_append(make_source_files(10, seed=94), run_ts=TS)
    snap2 = table.append(make_source_files(10, seed=95), run_ts=TS)
    assert snap2.snapshot_id != staged.snapshot_id
    assert table.scan(snapshot_id=staged.snapshot_id).count() == 210
    assert table.scan().count() == 210  # 200 + the published 10


def test_gc_protects_staged_files_and_reclaims_dropped(table):
    staged = table.stage_append(make_source_files(30, seed=96), run_ts=TS)
    deleted = table.gc_orphans()
    assert table.scan(snapshot_id=staged.snapshot_id).count() == 230
    table.drop_staged(staged.snapshot_id)
    deleted = table.gc_orphans()
    assert len(deleted) > 0  # abandoned load reclaimed
    assert table.scan().count() == 200


def test_expire_keeps_staged_and_recent(table):
    staged = table.stage_append(make_source_files(5, seed=97), run_ts="2024-06-01T00:00:00")
    for i in range(4):
        table.append(make_source_files(5, seed=200 + i),
                     run_ts=f"2024-0{i + 2}-01T00:00:00")
    expired = table.expire_snapshots(keep_last=1, older_than="2024-03-15T00:00:00")
    ids = {s.snapshot_id for s in table.store.snapshots()}
    assert staged.snapshot_id in ids  # staged always kept
    # snapshots newer than the bound survive even beyond keep_last
    kept_ts = [s.ts for s in table.store.snapshots()]
    assert all(ts >= "2024-03-15T00:00:00" or s_id in ids
               for ts, s_id in zip(kept_ts, ids))
    assert expired  # something old actually expired
    assert table.scan().count() == 220


def test_drop_staged_refuses_published(table):
    with pytest.raises(ValueError):
        table.drop_staged(table.store.head_id())


def test_expire_reclaims_aborted_commit_orphans(table):
    """An off-chain snap file WITHOUT the staged flag (e.g. a fencing-aborted
    commit) must expire — only explicitly staged snapshots survive off-chain."""
    import json
    import os

    staged = table.stage_append(make_source_files(5, seed=98), run_ts=TS)
    # forge an aborted-commit orphan: an off-chain snapshot with no flag
    d = table.store.dir
    with open(os.path.join(d, f"snap-{staged.snapshot_id}.json")) as f:
        orphan = json.load(f)
    orphan["snapshot_id"] = staged.snapshot_id + 50
    orphan["summary"] = {k: v for k, v in orphan["summary"].items()
                         if k != "staged"}
    with open(os.path.join(d, f"snap-{orphan['snapshot_id']}.json"), "w") as f:
        json.dump(orphan, f)

    for i in range(3):
        table.append(make_source_files(5, seed=300 + i), run_ts=TS)
    expired = table.expire_snapshots(keep_last=2)
    ids = {s.snapshot_id for s in table.store.snapshots()}
    assert orphan["snapshot_id"] not in ids       # orphan reclaimed
    assert staged.snapshot_id in ids              # real staged load kept
    assert orphan["snapshot_id"] in expired


def test_tags_pin_snapshots(table):
    """Named tags: scan by tag, retention never expires a tagged snapshot,
    drop_tag releases it; gc dry-run previews without deleting."""
    s1 = table.store.head_id()
    table.tag_snapshot("train-v1")
    for i in range(4):
        table.append(make_source_files(5, seed=400 + i), run_ts=TS)
    table.expire_snapshots(keep_last=1)
    assert table.scan_tag("train-v1").count() == 200  # still readable
    assert table.tags() == {"train-v1": s1}

    table.drop_tag("train-v1")
    table.compact(target_file_bytes=64 * 1024 * 1024, run_ts=TS)
    table.expire_snapshots(keep_last=1)
    preview = table.gc_orphans(dry_run=True)
    assert preview  # the untagged old files are now orphans
    import os
    assert all(os.path.exists(table.abs(p)) for p in preview)  # untouched
    deleted = table.gc_orphans()
    assert sorted(deleted) == sorted(preview)
