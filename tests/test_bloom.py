"""Per-file Bloom filters: point-lookup file skipping beyond min/max stats.

The scenario min/max cannot help with: a high-cardinality column (``commit``
hashes) whose per-file [min, max] ranges all span the whole domain — every
``==`` probe keeps every file on range stats alone.  ``build_blooms`` must
make those probes skip, with zero false negatives.
"""

import numpy as np
import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.functions.bloom import (
    bloom_build, bloom_contains, bloom_may_contain_any, bloom_encode,
    bloom_params, value_hashes)
from aws_medallion_datalake_ray.state.table import LakeTable, prune_files

TS = "2024-01-01T00:00:00"


# ---------------------------------------------------------------- kernel


def test_bloom_no_false_negatives_and_bounded_fpp():
    rng = np.random.default_rng(7)
    present = rng.integers(0, 2**63, 5000, dtype=np.int64)
    h = value_hashes(present)
    m, k = bloom_params(len(h), fpp=0.02)
    bits = bloom_build(h, m, k)
    # every inserted value answers "maybe" — no false negatives, ever
    assert bloom_contains(bits, h, m, k).all()
    # absent values answer "no" almost always (allow 3x the design fpp)
    absent = rng.integers(-(2**63), 0, 5000, dtype=np.int64)
    fp = bloom_contains(bits, value_hashes(absent), m, k).mean()
    assert fp < 0.06


def test_bloom_probe_scalar_matches_column_hash():
    """An int probe constant must hash identically to the same value read
    from an Arrow int64 column (build/probe symmetry)."""
    vals = [3, 1_000_000_007, -42]
    col_hashes = value_hashes(pa.array(vals, pa.int64()))
    for v, hc in zip(vals, col_hashes):
        assert value_hashes(v)[0] == hc
    svals = ["abc", "xyz-123"]
    s_hashes = value_hashes(pa.array(svals))
    for v, hc in zip(svals, s_hashes):
        assert value_hashes(v)[0] == hc


def test_bloom_empty_file_filter_skips_everything():
    m, k = bloom_params(0, fpp=0.02)
    enc = bloom_encode(bloom_build(np.array([], np.uint64), m, k), m, k, 0)
    assert not bloom_may_contain_any(enc, "anything")
    assert not bloom_may_contain_any(enc, [1, 2, 3])


# ---------------------------------------------------------------- table


@pytest.fixture()
def bloom_table(tmp_path, source_files_small):
    t = LakeTable.create(str(tmp_path / "btbl"))
    for i in range(0, len(source_files_small), 500):
        t.append(source_files_small.slice(i, 500), run_ts=TS)
    return t


def test_build_blooms_prunes_point_lookup(bloom_table):
    t = bloom_table
    commits = t.to_arrow(columns=["commit"])["commit"].to_pylist()
    files_before = t.files()
    # the motivating failure: commit hashes' min/max overlap across files,
    # so range stats alone keep (nearly) every file for an == probe
    assert len(prune_files(files_before, [("commit", "==", commits[0])])) >= \
        len(files_before) - 1

    snap = t.build_blooms(["commit"], run_ts=TS)
    assert snap.operation == "build-blooms"
    files = t.files()
    assert all(f.stats.get("commit", {}).get("bloom") for f in files)

    # present value: correct rows (no false negatives through the full scan)
    got = t.scan(predicate=[("commit", "==", commits[0])]).count()
    assert got == sum(1 for c in commits if c == commits[0])
    # and the probe now skips most files (each commit lives in ~1 file)
    kept = prune_files(files, [("commit", "==", commits[0])])
    assert len(kept) < len(files) / 2

    # absent value: proof of absence -> zero files (modulo ~2% fp per file)
    kept_absent = prune_files(
        files, [("commit", "==", "0000000000000000000000000000000000000000")]
    )
    assert len(kept_absent) <= max(1, len(files) // 10)


def test_bloom_in_probe_and_rewrite_stats_reindex(bloom_table):
    t = bloom_table
    commits = t.to_arrow(columns=["commit"])["commit"].to_pylist()
    t.build_blooms(["commit"], run_ts=TS)
    probe = [commits[0], commits[-1], "not-a-commit"]
    kept = prune_files(t.files(), [("commit", "in", probe)])
    assert 1 <= len(kept) < len(t.files())
    got = t.scan(predicate=[("commit", "in", probe)]).count()
    assert got == sum(1 for c in commits if c in set(probe))

    # rewrite_stats must re-index (bloom_cols persisted in table config)
    t.rewrite_stats(run_ts=TS)
    files = t.files()
    assert all(f.stats.get("commit", {}).get("bloom") for f in files)
    kept2 = prune_files(
        files, [("commit", "==", "0000000000000000000000000000000000000000")]
    )
    assert len(kept2) <= max(1, len(files) // 10)


# ------------------------------------------------------- runtime join filter


def test_dataset_key_bloom_matches_driver_build():
    """The distributed per-block OR build equals a single driver-side build
    (fixed m makes OR associative), and over-budget returns None."""
    import ray

    from aws_medallion_datalake_ray.functions.bloom import dataset_key_bloom

    keys = [f"key-{i:06d}" for i in range(20_000)]
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(7)
    got = dataset_key_bloom(ds, "k", len(keys), fpp=0.01)
    assert got is not None
    bits, m, k = got
    m2, k2 = bloom_params(len(keys), 0.01)
    assert (m, k) == (m2, k2)
    ref = np.frombuffer(
        bloom_build(value_hashes(np.array(keys, object)), m, k), np.uint8)
    assert np.array_equal(bits, ref)
    assert dataset_key_bloom(ds, "k", len(keys), max_bytes=8) is None


def test_delete_keys_partitioned_bloom_runtime_filter(tmp_path, source_files_small):
    """The partitioned anti-join must report the bloom plan and produce the
    exact same survivor multiset as the broadcast plan."""
    from aws_medallion_datalake_ray.functions.hashing import sha256_col  # noqa: F401

    ta = LakeTable.create(str(tmp_path / "a"))
    tb = LakeTable.create(str(tmp_path / "b"))
    for t in (ta, tb):
        for i in range(0, len(source_files_small), 700):
            t.append(source_files_small.slice(i, 700), run_ts=TS)
    rows = source_files_small.to_pylist()
    keys = ["\x1f".join([r["repo"], r["path"], r["commit"]])
            for r in rows[5:400:7]]
    ra = ta.delete_keys(list(keys), strategy="partitioned", run_ts=TS,
                        runtime_filter=True)  # 'auto' is off on one node
    rb = tb.delete_keys(list(keys), strategy="broadcast", run_ts=TS)
    assert ra["strategy"] == "partitioned+bloom"
    assert ra["rows_deleted"] == rb["rows_deleted"] == len(keys)
    cols = ("repo", "path", "commit", "lang", "content")
    assert ta.content_fingerprint(cols) == tb.content_fingerprint(cols)


def test_merge_partitioned_bloom_runtime_filter(tmp_path, source_files_small):
    """Partitioned merge with the bloom prefilter == broadcast merge result."""
    import ray

    from aws_medallion_datalake_ray.sources.fixtures import make_updates

    ta = LakeTable.create(str(tmp_path / "ma"))
    tb = LakeTable.create(str(tmp_path / "mb"))
    for t in (ta, tb):
        for i in range(0, len(source_files_small), 700):
            t.append(source_files_small.slice(i, 700), run_ts=TS)
    upd = make_updates(source_files_small, 250, seed=9)
    ra = ta.merge_partitioned(ray.data.from_arrow(upd), run_ts=TS,
                              runtime_filter=True)  # 'auto' off on one node
    tb.merge(upd, run_ts=TS, strategy="broadcast")
    assert ra["strategy"] == "partitioned+bloom"
    cols = ("repo", "path", "commit", "lang", "content")
    assert ta.content_fingerprint(cols) == tb.content_fingerprint(cols)


def test_manifest_blooms_prune_merge_delete_affected_files(tmp_path):
    """DELETE/MERGE file pruning: when every file's first-key range spans
    the domain, range intersect keeps all files — a manifest bloom on the
    key column must shrink the affected set (fewer copy-on-write rewrites)
    without changing the result."""
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    import pandas as pd

    n = 400
    df = pd.DataFrame({
        "repo": [f"org/r{i % 40:02d}" for i in range(n)],
        "path": [f"p{i}" for i in range(n)],
        "commit": [f"{i:040x}" for i in range(n)],
        "lang": ["py"] * n,
        "content": [f"line {i} " * 3 for i in range(n)],
    })
    t = LakeTable.create(str(tmp_path / "t"))
    # interleave repos across 4 files: every file's repo range spans all
    for r in range(4):
        part = df[df.index % 4 == r]
        t.append(pa.Table.from_pandas(part, preserve_index=False)
                 .cast(SOURCE_FILES_SCHEMA), run_ts=TS)
    t.build_blooms(["repo"], run_ts=TS)
    n_files = len(t.files())

    # delete rows of ONE repo that lives in exactly one file (index % 4
    # fixed => repo r00 rows all have index % 40 == 0, i.e. index % 4 == 0)
    rows = df[df["repo"] == "org/r00"]
    keys = ["\x1f".join([r.repo, r.path, r.commit])
            for r in rows.itertuples(index=False)]
    out = t.delete_keys(keys, run_ts=TS)
    assert out["rows_deleted"] == len(keys)
    assert out["affected_files"] == 1 < n_files
    assert t.scan(predicate=[("repo", "==", "org/r00")]).count() == 0
    assert sum(f.rows for f in t.files()) == n - len(keys)


def test_runtime_filter_auto_off_single_node():
    """'auto' must resolve to OFF in this single-node sandbox (the filter
    only pays when the avoided shuffle crosses a network)."""
    from aws_medallion_datalake_ray.state.table import _multi_node

    assert _multi_node() is False


def test_compact_drops_blooms_conservatively(bloom_table):
    """Files rewritten by compaction lose their filters until the next
    build/rewrite — scans must stay correct (no bloom -> no skip), and the
    maintenance autopilot must notice the coverage drop and re-index."""
    t = bloom_table
    commits = t.to_arrow(columns=["commit"])["commit"].to_pylist()
    t.build_blooms(["commit"], run_ts=TS)
    t.compact(target_file_bytes=4 * 1024 * 1024, run_ts=TS)
    got = t.scan(predicate=[("commit", "==", commits[0])]).count()
    assert got == sum(1 for c in commits if c == commits[0])
    assert any(f.stats.get("commit", {}).get("bloom") is None for f in t.files())
    # the autopilot counts bloom coverage: it must re-index here
    actions = t.maintain(run_ts=TS, target_file_bytes=4 * 1024 * 1024)
    assert "rewrite_stats" in actions
    assert all(f.stats.get("commit", {}).get("bloom") for f in t.files())
    kept = prune_files(
        t.files(), [("commit", "==", "0000000000000000000000000000000000000000")]
    )
    assert len(kept) <= max(1, len(t.files()) // 10)
