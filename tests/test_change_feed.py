"""Change data feed: row-level diff between snapshots from the file-level
manifest delta — pure maintenance cancels, merges surface as updates."""

import collections

import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.sources.fixtures import make_source_files, make_updates
from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"
KEY = ("repo", "path", "commit")


@pytest.fixture()
def table(tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"))
    base = make_source_files(300, seed=21)
    t.append(base.slice(0, 150), run_ts=TS)
    t.append(base.slice(150, 150), run_ts=TS)
    return t


def _feed(t, a, b=None, key=KEY):
    df = t.change_feed(a, b, key_cols=key).to_pandas()
    return df, collections.Counter(df.get("_change", []))


def test_append_only_is_all_inserts(table):
    s1 = table.store.head().snapshot_id
    table.append(make_source_files(40, seed=77), run_ts=TS)
    df, counts = _feed(table, s1)
    assert counts == {"insert": 40}


def test_compaction_yields_empty_feed(table):
    s1 = table.store.head().snapshot_id
    table.compact(target_file_bytes=64 * 1024 * 1024, run_ts=TS)
    df, counts = _feed(table, s1)
    assert len(df) == 0


def test_zorder_yields_empty_feed(table):
    s1 = table.store.head().snapshot_id
    table.zorder(["repo", "lang", "path"], run_ts=TS)
    df, counts = _feed(table, s1)
    assert len(df) == 0


def test_merge_surfaces_updates(table):
    base = table.to_arrow(columns=["repo", "path", "commit", "lang", "content"])
    s1 = table.store.head().snapshot_id
    upd = make_updates(base, 30, seed=9)
    res = table.merge(upd, run_ts="2024-01-02T00:00:00")
    df, counts = _feed(table, s1)
    # expected delta computed independently: an update row that is an EXACT
    # duplicate of a base row (make_updates' idempotent ~10%) must cancel;
    # rows merely co-located in rewritten files cancel too
    base_keys = set(zip(base["repo"].to_pylist(), base["path"].to_pylist(),
                        base["commit"].to_pylist()))
    base_rows = {tuple(r.values()) for r in base.to_pylist()}
    exp_ins = exp_upd = 0
    seen = set()
    for r in upd.to_pylist():
        k = (r["repo"], r["path"], r["commit"])
        if k in seen:
            continue
        seen.add(k)
        if k not in base_keys:
            exp_ins += 1
        elif tuple(r.values()) not in base_rows:
            exp_upd += 1
    assert counts.get("insert", 0) == exp_ins
    assert counts.get("update", 0) == exp_upd
    assert res["updates"] == len(seen)
    assert counts.get("delete", 0) == 0


def test_same_key_new_content_is_update(table):
    base = table.to_arrow(columns=["repo", "path", "commit", "lang", "content"])
    s1 = table.store.head().snapshot_id
    upd = base.slice(0, 5).set_column(
        4, "content",
        pa.array([f"rewritten body {i}\n" for i in range(5)], pa.large_string()),
    )
    table.merge(upd, run_ts="2024-01-02T00:00:00")
    df, counts = _feed(table, s1)
    assert counts == {"update": 5}
    assert sorted(df["content"]) == sorted(upd["content"].to_pylist())
    # post-image rows carry the NEW content
    upd_map = {}
    for r in upd.to_pylist():
        upd_map[(r["repo"], r["path"], r["commit"])] = r["content"]
    changed = df[df["_change"] == "update"]
    for _, row in changed.iterrows():
        assert row["content"] == upd_map[(row["repo"], row["path"], row["commit"])]


def test_delete_surfaces_deletes(table):
    s1 = table.store.head().snapshot_id
    got = table.to_arrow(columns=["repo", "path", "commit"]).slice(0, 25)
    victims = ["\x1f".join(v) for v in zip(got["repo"].to_pylist(),
                                           got["path"].to_pylist(),
                                           got["commit"].to_pylist())]
    table.delete_keys(victims, run_ts="2024-01-02T00:00:00")
    df, counts = _feed(table, s1)
    assert counts.get("delete", 0) == 25
    assert counts.get("insert", 0) == 0


def test_update_preimages(table):
    base = table.to_arrow(columns=["repo", "path", "commit", "lang", "content"])
    s1 = table.store.head().snapshot_id
    upd = base.slice(0, 5).set_column(
        4, "content",
        pa.array([f"pre/post body {i}\n" for i in range(5)], pa.large_string()),
    )
    table.merge(upd, run_ts="2024-01-02T00:00:00")
    df = table.change_feed(s1, key_cols=KEY, include_preimages=True).to_pandas()
    c = collections.Counter(df["_change"])
    assert c == {"update_preimage": 5, "update_postimage": 5}
    pre = set(df[df["_change"] == "update_preimage"]["content"])
    post = set(df[df["_change"] == "update_postimage"]["content"])
    assert post == set(upd["content"].to_pylist())
    assert pre == set(base.slice(0, 5)["content"].to_pylist())


def test_identical_snapshots_empty(table):
    s1 = table.store.head().snapshot_id
    df, counts = _feed(table, s1, s1)
    assert len(df) == 0


def test_unknown_snapshot_raises(table):
    with pytest.raises(ValueError):
        table.change_feed(9999)


def test_change_feed_on_partitioned_table(tmp_path):
    """CDC works over Hive-partitioned tables: the partition columns are
    re-attached from manifest values before rows are compared."""
    t = LakeTable.create(str(tmp_path / "p"), partition_cols=("lang",))
    base = make_source_files(300, seed=51)
    t.append(base, run_ts=TS)
    s1 = t.store.head_id()
    t.compact(target_file_bytes=32 * 1024 * 1024, run_ts=TS)
    assert t.change_feed(s1, key_cols=KEY).count() == 0
    upd = base.slice(0, 6).set_column(
        4, "content",
        pa.array([f"partitioned rewrite {i}\n" for i in range(6)],
                 pa.large_string()),
    )
    s2 = t.store.head_id()
    t.merge(upd, run_ts="2024-01-02T00:00:00")
    df = t.change_feed(s2, key_cols=KEY).to_pandas()
    c = collections.Counter(df["_change"])
    assert c == {"update": 6}
    assert set(df.columns) >= {"repo", "path", "commit", "lang", "content"}


def test_columns_prunes_feed_output(table):
    """columns= prunes the second pass and the output; detection still sees
    every column (an update to the UNREQUESTED content column must still
    surface)."""
    base = table.to_arrow(columns=["repo", "path", "commit", "lang", "content"])
    s1 = table.store.head().snapshot_id
    upd = base.slice(0, 7).set_column(
        4, "content",
        pa.array([f"pruned body {i}\n" for i in range(7)], pa.large_string()),
    )
    table.merge(upd, run_ts="2024-01-02T00:00:00")
    df = table.change_feed(s1, key_cols=KEY, columns=["repo", "lang"]).to_pandas()
    assert sorted(df.columns) == ["_change", "lang", "repo"]
    assert collections.Counter(df["_change"]) == {"update": 7}
    # full-feed parity on the surviving columns
    full = table.change_feed(s1, key_cols=KEY).to_pandas()
    assert sorted(df["repo"]) == sorted(full["repo"])


def test_columns_append_only_and_validation(table):
    s1 = table.store.head().snapshot_id
    table.append(make_source_files(12, seed=88), run_ts=TS)
    df = table.change_feed(s1, columns=["path"]).to_pandas()
    assert sorted(df.columns) == ["_change", "path"]
    assert len(df) == 12
    with pytest.raises(KeyError):
        table.change_feed(s1, columns=["no_such_col"])
    with pytest.raises(ValueError):
        table.change_feed(s1, columns=[])


def test_columns_on_shuffle_fallback(table, monkeypatch):
    """Forcing the full-row co-partition plan must honor columns= too."""
    import aws_medallion_datalake_ray.state.table as tbl

    monkeypatch.setattr(tbl, "CHANGE_FEED_BROADCAST_KEYS", 0)
    base = table.to_arrow(columns=["repo", "path", "commit", "lang", "content"])
    s1 = table.store.head().snapshot_id
    upd = base.slice(0, 4).set_column(
        4, "content",
        pa.array([f"fallback body {i}\n" for i in range(4)], pa.large_string()),
    )
    table.merge(upd, run_ts="2024-01-02T00:00:00")
    df = table.change_feed(s1, key_cols=KEY, columns=["path", "lang"]).to_pandas()
    assert sorted(df.columns) == ["_change", "lang", "path"]
    assert collections.Counter(df["_change"]) == {"update": 4}


def test_lazy_delete_emits_delete_rows(tmp_path, ray_session):
    """A merge-on-read DELETE changes no file, but its masked rows must
    still surface in the feed as deletes (CDC = row-level truth, not file
    deltas)."""
    t = LakeTable.create(str(tmp_path / "cfl"))
    t.append(make_source_files(200, seed=1), run_ts=TS)
    s1 = t.store.head_id()
    t.delete_where([("lang", "==", "py")], mode="lazy", run_ts=TS)
    s2 = t.store.head_id()
    n_masked = 200 - t.scan().count()
    assert n_masked > 0
    feed = t.change_feed(s1, s2, key_cols=("repo", "path", "commit")).to_pandas()
    assert len(feed) == n_masked
    assert set(feed["_change"]) == {"delete"}
    assert set(feed["lang"]) == {"py"}


def test_feed_across_lazy_delete_then_merge_matches_ground_truth(
        tmp_path, ray_session):
    """After a lazy delete, a merge's feed must equal the true visible-row
    diff: no masked row resurrects as a delete pre-image, every genuinely
    new row appears."""
    t = LakeTable.create(str(tmp_path / "cfm"))
    base = make_source_files(200, seed=1)
    t.append(base, run_ts=TS)
    t.delete_where([("lang", "==", "py")], mode="lazy", run_ts=TS)
    s2 = t.store.head_id()
    t.merge(make_updates(base, 30, seed=9), run_ts=TS)
    s3 = t.store.head_id()

    def keys(sid):
        df = t.scan(snapshot_id=sid).to_pandas()
        return set(zip(df["repo"], df["path"], df["commit"]))

    ka, kb = keys(s2), keys(s3)
    feed = t.change_feed(s2, s3, key_cols=("repo", "path", "commit")).to_pandas()
    ins = feed[feed["_change"] == "insert"]
    dele = feed[feed["_change"] == "delete"]
    assert set(zip(ins["repo"], ins["path"], ins["commit"])) == kb - ka
    assert set(zip(dele["repo"], dele["path"], dele["commit"])) == ka - kb


def test_stacked_lazy_deletes_feed_without_double_emit(tmp_path, ray_session):
    """Two lazy deletes between the snapshots: every masked row emits
    exactly once even where the specs' file sets overlap."""
    t = LakeTable.create(str(tmp_path / "cfs"))
    t.append(make_source_files(200, seed=1), run_ts=TS)
    s1 = t.store.head_id()
    t.delete_where([("lang", "==", "py")], mode="lazy", run_ts=TS)
    t.delete_where([("lang", "==", "js")], mode="lazy", run_ts=TS)
    s3 = t.store.head_id()
    n_masked = 200 - t.scan().count()
    feed = t.change_feed(s1, s3, key_cols=("repo", "path", "commit")).to_pandas()
    assert len(feed) == n_masked
    assert set(feed["_change"]) == {"delete"}
    assert not feed.duplicated(["repo", "path", "commit"]).any()
