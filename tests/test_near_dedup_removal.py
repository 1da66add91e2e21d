"""Distributed near-dup pipeline: pairs (broadcast + joined plans), mega-bucket
cap, and LakeTable.dedup_near copy-on-write removal with multiset invariants."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from aws_medallion_datalake_ray.functions.dedup import (
    jaccard,
    minhash_near_dups,
    near_dup_pairs,
)
from aws_medallion_datalake_ray.state.table import LakeTable


def _disjoint_corpus(n_docs: int = 40, doc_len: int = 30) -> pa.Table:
    """Docs with pairwise-disjoint vocabularies — zero cross-doc Jaccard."""
    texts = [
        " ".join(f"w{i}_{j}" for j in range(doc_len)) for i in range(n_docs)
    ]
    return pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _plant(corpus: pa.Table, n: int, id_offset: int = 10_000) -> pa.Table:
    df = corpus.slice(0, n).to_pandas()
    df["doc_id"] = df["doc_id"] + id_offset
    df["text"] = df["text"] + " extra"
    return pa.concat_tables(
        [corpus, pa.Table.from_pandas(df, preserve_index=False)]
    )


def test_near_dup_pairs_exactly_planted(ray_session):
    corpus = _plant(_disjoint_corpus(), 6)
    out = minhash_near_dups(
        ray.data.from_arrow(corpus), threshold=0.5, num_perm=64, bands=32
    )
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert got == {(i, i + 10_000) for i in range(6)}
    # exact jaccard values match the kernel
    texts = dict(zip(corpus["doc_id"].to_pylist(), corpus["text"].to_pylist()))
    for a, b, j in zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                       out["jaccard"].to_pylist()):
        assert j == pytest.approx(jaccard(texts[a], texts[b]))


def test_near_dup_pairs_joined_plan_matches_broadcast(ray_session):
    corpus = _plant(_disjoint_corpus(), 6)
    broad = minhash_near_dups(
        ray.data.from_arrow(corpus), threshold=0.5, num_perm=64, bands=32
    ).to_pandas()
    joined = (
        near_dup_pairs(
            ray.data.from_arrow(corpus), threshold=0.5, num_perm=64, bands=32,
            broadcast_threshold=0,  # force the Dataset.join verify plan
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(broad, joined, check_like=True)


def test_distributed_candidate_id_semi_join_matches_broadcast(ray_session):
    """id_broadcast_threshold=0 forces the candidate-id Dataset semi-join
    (no driver id array); results must equal the broadcast-id plan."""
    corpus = _plant(_disjoint_corpus(), 6)
    broad = minhash_near_dups(
        ray.data.from_arrow(corpus), threshold=0.5, num_perm=64, bands=32
    ).to_pandas()
    ds_ids = (
        near_dup_pairs(
            ray.data.from_arrow(corpus), threshold=0.5, num_perm=64, bands=32,
            id_broadcast_threshold=0,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(broad, ds_ids, check_like=True)


def test_candidate_count_matches_exact_and_state_is_sublinear(ray_session):
    """The distributed collision scan must (a) equal an exact in-process
    bucket-count ground truth and (b) carry only O(P) rollup rows — three
    integers per hash partition — never an O(docs x bands) map."""
    from aws_medallion_datalake_ray.functions.dedup import (
        BandEmitter,
        near_dup_candidate_count,
    )

    corpus = _plant(_disjoint_corpus(60), 10)
    got = near_dup_candidate_count(
        ray.data.from_arrow(corpus), text_col="text", id_col="doc_id",
        num_perm=64, bands=16, num_partitions=8,
    )
    # exact ground truth: same emitter, single process
    em = BandEmitter(id_col="doc_id", text_col="text", bands=16, num_perm=64)
    buckets = em.buckets_of(corpus["text"].to_pylist()).reshape(-1)
    uk, c = np.unique(buckets, return_counts=True)
    assert got["buckets"] == len(uk)
    assert got["collision_buckets"] == int((c > 1).sum())
    assert got["colliding_rows"] == int(c[c > 1].sum())
    # sublinear by construction: the driver-side result of the rollup stage
    # is bounded by num_partitions rows regardless of corpus size
    assert got["buckets"] > 8  # many buckets, yet the scan returned 3 ints


def test_verify_plan_byte_budget_forces_join(ray_session):
    """Few-but-huge candidate docs must take the JOINED verify plan even
    though the candidate COUNT is tiny — the broadcast decision is budgeted
    on bytes, not count — and the result must match the broadcast plan."""
    from aws_medallion_datalake_ray.functions import dedup as dd

    n_docs, doc_len = 8, 2000  # ~8 x ~14 KB of text
    texts = [" ".join(f"w{i}_{j}" for j in range(doc_len)) for i in range(n_docs)]
    corpus = pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                       "text": pa.array(texts, pa.string())})
    corpus = _plant(corpus, 3)

    # default 256 MB budget: tiny corpus broadcasts...
    broad = minhash_near_dups(
        ray.data.from_arrow(corpus), threshold=0.5, num_perm=64, bands=32
    )
    assert dd.LAST_VERIFY_PLAN["plan"] == "broadcast"
    # ...but a 100 KB budget forces the joined plan despite only 6 candidates
    out = near_dup_pairs(
        ray.data.from_arrow(corpus), threshold=0.5, num_perm=64, bands=32,
        broadcast_bytes_budget=50_000,
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert dd.LAST_VERIFY_PLAN["plan"] == "joined"
    assert dd.LAST_VERIFY_PLAN["candidates"] <= 8
    assert dd.LAST_VERIFY_PLAN["candidate_bytes"] > 50_000
    pd.testing.assert_frame_equal(broad.to_pandas(), out, check_like=True)


def test_mega_bucket_chain_bounded(ray_session):
    """An all-identical corpus lands in one bucket; the chain fallback keeps
    pair count O(n) and removal still keeps exactly one representative."""
    n = 200
    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()),
         "text": pa.array(["same text " * 10] * n, pa.string())}
    )
    out = minhash_near_dups(
        ray.data.from_arrow(t), threshold=0.9, max_bucket=16
    )
    # chain pairs: far fewer than n^2/2, and connectivity covers every doc
    assert out.num_rows < 4 * n
    removed = set(out["id_b"].to_pylist())
    assert set(range(n)) - removed == {0}


def test_dedup_near_sha256_multiset_exact(tmp_path, ray_session):
    """Removal set == planted set exactly on a no-background-dup corpus; the
    survivors' sha256 multiset equals the original base's."""
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    base_df = pd.DataFrame(
        {
            "repo": [f"org/r{i % 4}" for i in range(40)],
            "path": [f"src/f{i}.py" for i in range(40)],
            "commit": [f"{i:040x}" for i in range(40)],
            "lang": ["py"] * 40,
            "content": [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(40)],
        }
    )
    base = pa.Table.from_pandas(base_df, preserve_index=False).cast(SOURCE_FILES_SCHEMA)
    dup_df = base_df.head(6).copy()
    dup_df["path"] = "zzz_" + dup_df["path"]
    dup_df["commit"] = [f"f{i:039x}" for i in range(6)]
    dup_df["content"] = dup_df["content"] + " extra"
    dups = pa.Table.from_pandas(dup_df, preserve_index=False).cast(SOURCE_FILES_SCHEMA)

    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.concat_tables([base, dups]))
    t_base = LakeTable.create(str(tmp_path / "base_only"))
    t_base.append(base)

    res = t.dedup_near(text_col="content", threshold=0.5)
    assert res["rows_deleted"] == 6 and res["near_dup_rows"] == 6
    assert t.scan().count() == 40
    assert t.sha256_checksum("content") == t_base.sha256_checksum("content")


def test_dedup_near_partitioned_path_sha256_multiset_exact(tmp_path, ray_session):
    """Same invariants as the broadcast test, but through the partitioned
    anti-join fallback (broadcast_threshold=0 forces it): removal ids stay a
    Dataset end-to-end, no driver key array."""
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    base_df = pd.DataFrame(
        {
            "repo": [f"org/r{i % 4}" for i in range(40)],
            "path": [f"src/f{i}.py" for i in range(40)],
            "commit": [f"{i:040x}" for i in range(40)],
            "lang": ["py"] * 40,
            "content": [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(40)],
        }
    )
    base = pa.Table.from_pandas(base_df, preserve_index=False).cast(SOURCE_FILES_SCHEMA)
    dup_df = base_df.head(6).copy()
    dup_df["path"] = "zzz_" + dup_df["path"]
    dup_df["commit"] = [f"f{i:039x}" for i in range(6)]
    dup_df["content"] = dup_df["content"] + " extra"
    dups = pa.Table.from_pandas(dup_df, preserve_index=False).cast(SOURCE_FILES_SCHEMA)

    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.concat_tables([base, dups]))
    t_base = LakeTable.create(str(tmp_path / "base_only"))
    t_base.append(base)

    res = t.dedup_near(text_col="content", threshold=0.5, broadcast_threshold=0)
    assert res.get("strategy", "").startswith("partitioned")
    assert res["rows_deleted"] == 6 and res["near_dup_rows"] == 6
    assert t.scan().count() == 40
    assert t.sha256_checksum("content") == t_base.sha256_checksum("content")
    # post-delete schema must round-trip the canonical large_string content
    assert t.schema().field("content").type == t_base.schema().field("content").type


def test_delete_keys_partitioned_strategy_direct(tmp_path, ray_session):
    """delete_keys(strategy='partitioned') from a driver key list removes
    exactly the named rows (duplicate removal keys collapse to one)."""
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    df = pd.DataFrame(
        {
            "repo": [f"org/r{i % 3}" for i in range(30)],
            "path": [f"p{i}" for i in range(30)],
            "commit": [f"{i:040x}" for i in range(30)],
            "lang": ["py"] * 30,
            "content": [f"line {i} " * 5 for i in range(30)],
        }
    )
    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.Table.from_pandas(df, preserve_index=False).cast(SOURCE_FILES_SCHEMA))
    keys = [
        "\x1f".join([df["repo"][i], df["path"][i], df["commit"][i]]) for i in (0, 5, 9)
    ]
    out = t.delete_keys(keys + keys[:1], strategy="partitioned")
    assert out["strategy"].startswith("partitioned")
    assert out["removed_keys"] == 3 and out["rows_deleted"] == 3
    surv = t.to_arrow(columns=["path"])["path"].to_pylist()
    assert set(surv) == {f"p{i}" for i in range(30)} - {"p0", "p5", "p9"}


def test_dedup_near_noop_on_unique_corpus(tmp_path, ray_session):
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    base_df = pd.DataFrame(
        {
            "repo": ["org/r0"] * 10,
            "path": [f"src/f{i}.py" for i in range(10)],
            "commit": [f"{i:040x}" for i in range(10)],
            "lang": ["py"] * 10,
            "content": [" ".join(f"u{i}_{j}" for j in range(25)) for i in range(10)],
        }
    )
    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.Table.from_pandas(base_df, preserve_index=False).cast(SOURCE_FILES_SCHEMA))
    head_before = t.store.head().snapshot_id
    res = t.dedup_near(text_col="content", threshold=0.5)
    assert res["rows_deleted" if "rows_deleted" in res else "removed_keys"] in (0,)
    # no-op removal must not commit a new snapshot
    assert t.store.head().snapshot_id == head_before
    assert t.scan().count() == 10


def test_delete_keys_empty_and_missing(tmp_path, ray_session):
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    df = pd.DataFrame(
        {
            "repo": ["org/r0"] * 4,
            "path": [f"p{i}" for i in range(4)],
            "commit": [f"{i:040x}" for i in range(4)],
            "lang": ["py"] * 4,
            "content": ["a b c d e f"] * 4,
        }
    )
    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.Table.from_pandas(df, preserve_index=False).cast(SOURCE_FILES_SCHEMA))
    assert t.delete_keys([])["affected_files"] == 0
    # keys that match nothing: files may be scanned but no rows disappear
    out = t.delete_keys(["org/zzz\x1fnope\x1f" + "0" * 40])
    assert t.scan().count() == 4


def test_batch_jaccard_matches_per_pair_intersect():
    """The vectorized batch kernel must equal per-pair intersect1d exactly,
    including empty-set pairs (union 0 -> 1.0)."""
    import numpy as np

    from aws_medallion_datalake_ray.functions.dedup import _batch_jaccard

    rng = np.random.default_rng(7)
    A, B = [], []
    for _ in range(200):
        A.append(np.unique(rng.integers(0, 500, rng.integers(0, 80))
                           .astype(np.uint64)))
        B.append(np.unique(rng.integers(0, 500, rng.integers(0, 80))
                           .astype(np.uint64)))
    A.append(np.array([], np.uint64))
    B.append(np.array([], np.uint64))
    got = _batch_jaccard(A, B)
    for j, (a, b) in enumerate(zip(A, B)):
        inter = np.intersect1d(a, b, assume_unique=True).size
        u = a.size + b.size - inter
        assert abs(got[j] - (inter / u if u else 1.0)) < 1e-12
    assert len(_batch_jaccard([], [])) == 0


def test_dedup_near_cluster_policy_transitive(tmp_path, ray_session):
    """A~B and B~C with A!~C: pair policy keeps both local minima; cluster
    policy keeps exactly the component minimum."""
    from aws_medallion_datalake_ray.schema import SOURCE_FILES_SCHEMA

    base = " ".join(f"c{j}" for j in range(30))
    extra = [f"e{j}" for j in range(30)]
    x = base                                        # key a.py (component min)
    z = base + " " + " ".join(extra)                # key b.py
    y = base + " " + " ".join(extra[:12])           # key z.py (chain middle)
    assert jaccard(x, y) >= 0.5 and jaccard(y, z) >= 0.5 and jaccard(x, z) < 0.5

    df = pd.DataFrame({
        "repo": ["org/r"] * 3,
        "path": ["a.py", "b.py", "z.py"],
        "commit": ["1" * 40, "2" * 40, "3" * 40],
        "lang": ["py"] * 3,
        "content": [x, z, y],
    })
    tab = pa.Table.from_pandas(df, preserve_index=False).cast(SOURCE_FILES_SCHEMA)

    t_pairs = LakeTable.create(str(tmp_path / "pairs"))
    t_pairs.append(tab)
    res = t_pairs.dedup_near(text_col="content", threshold=0.5, bands=32)
    assert res["near_dup_rows"] == 1  # only the chain middle (largest key)
    assert sorted(t_pairs.scan(columns=["path"]).to_pandas()["path"]) == [
        "a.py", "b.py"]

    t_clust = LakeTable.create(str(tmp_path / "clust"))
    t_clust.append(tab)
    res = t_clust.dedup_near(text_col="content", threshold=0.5, bands=32,
                             policy="cluster")
    assert res["near_dup_rows"] == 2  # one survivor per component
    assert sorted(t_clust.scan(columns=["path"]).to_pandas()["path"]) == ["a.py"]
