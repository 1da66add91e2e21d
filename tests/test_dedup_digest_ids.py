"""dedup_near id_mode="digest": fixed-width 128-bit ids through the pair
pipeline (the 100-TB shuffle-volume mode) must remove exactly one row per
dup pair/cluster, leave a survivor per cluster, and survive the partitioned
translation path — same corpus invariants as the key-mode tests."""

import pandas as pd
import pyarrow as pa

from aws_medallion_datalake_ray.state.table import LakeTable


def _corpus():
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
    return base, dups


def test_digest_mode_removes_one_per_pair(tmp_path, ray_session):
    """6 planted pairs -> 6 removals; every cluster keeps exactly one
    member (which one is digest-order, i.e. arbitrary but deterministic),
    so the surviving CONTENT multiset is one-of-each-pair."""
    base, dups = _corpus()
    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.concat_tables([base, dups]))

    res = t.dedup_near(text_col="content", threshold=0.5, id_mode="digest")
    assert res["rows_deleted"] == 6 and res["near_dup_rows"] == 6
    assert t.scan().count() == 40

    # exactly one survivor per planted pair: for i<6 either f{i} or zzz_f{i}
    left = set(t.scan(columns=["path"]).to_pandas()["path"])
    for i in range(6):
        assert (f"src/f{i}.py" in left) != (f"zzz_src/f{i}.py" in left)
    for i in range(6, 40):  # non-dup rows untouched
        assert f"src/f{i}.py" in left


def test_digest_mode_partitioned_translation(tmp_path, ray_session):
    """broadcast_threshold=0 forces the joined plan in BOTH the digest
    translation semi-join and delete_keys — same removal invariants."""
    base, dups = _corpus()
    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.concat_tables([base, dups]))

    res = t.dedup_near(
        text_col="content", threshold=0.5, id_mode="digest",
        broadcast_threshold=0,
    )
    assert res["rows_deleted"] == 6
    assert t.scan().count() == 40


def test_digest_mode_determinism(tmp_path, ray_session):
    """Two identical tables dedup to the SAME survivor set in digest mode
    (the digest is a pure function of the key)."""
    base, dups = _corpus()
    seen = []
    for sub in ("a", "b"):
        t = LakeTable.create(str(tmp_path / sub))
        t.append(pa.concat_tables([base, dups]))
        t.dedup_near(text_col="content", threshold=0.5, id_mode="digest")
        seen.append(tuple(sorted(t.scan(columns=["path"]).to_pandas()["path"])))
    assert seen[0] == seen[1]


def test_chunked_joined_verify_matches_broadcast(ray_session):
    """A tiny verify_chunk_bytes forces the joined plan to split the pair
    set into several sequential join chunks; the union must equal the
    single-pass broadcast result exactly."""
    import ray.data

    from aws_medallion_datalake_ray.functions import dedup as dd

    texts = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(40)]
    texts += [t + " extra" for t in texts[:12]]  # 12 planted near-dups
    corpus = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(corpus)

    broad = dd.minhash_near_dups(ds, threshold=0.5, num_perm=64, bands=32)
    chunked = dd.near_dup_pairs(
        ds, threshold=0.5, num_perm=64, bands=32,
        broadcast_threshold=0,      # force the joined plan
        verify_chunk_bytes=1,       # force the byte budget to demand chunks
        verify_chunk_min_pairs=6,   # ... floored at ~6 pairs per chunk
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert dd.LAST_VERIFY_PLAN["plan"] == "joined"
    assert dd.LAST_VERIFY_PLAN["chunks"] > 1
    pd.testing.assert_frame_equal(broad.to_pandas(), chunked)


def test_local_verify_matches_broadcast_pairs(ray_session):
    """near_dup_pairs_local (texts on the banding shuffle, bucket-local
    verify) must produce the exact pair set + jaccards of the broadcast
    plan, including through the mega-bucket chain path."""
    import ray.data

    from aws_medallion_datalake_ray.functions import dedup as dd

    texts = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(40)]
    texts += [t + " extra" for t in texts[:12]]
    # one mega-clique: 20 docs sharing one long template -> a bucket > max_bucket
    texts += ["tpl " * 40 + f"tail{i}" for i in range(20)]
    corpus = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(corpus)

    kw = dict(threshold=0.5, num_perm=64, bands=32, max_bucket=8)
    broad = dd.minhash_near_dups(ds, **kw).to_pandas()
    local = dd.near_dup_pairs_local(
        ds, **kw).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    local["jaccard"] = local["jaccard"].astype(float)
    pd.testing.assert_frame_equal(broad, local)


def test_dedup_near_local_verify_digest(tmp_path, ray_session):
    """The dense-corpus configuration (verify="local" + id_mode="digest")
    removes exactly the planted dups."""
    base, dups = _corpus()
    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.concat_tables([base, dups]))

    res = t.dedup_near(text_col="content", threshold=0.5,
                       verify="local", id_mode="digest")
    assert res["rows_deleted"] == 6
    assert t.scan().count() == 40


def test_mega_bucket_recall_under_random_ids(ray_session):
    """Recall guard for the digest-id regime: when ids carry NO semantic
    locality and max_bucket forces chains inside whole-corpus mega-buckets,
    every planted twin pair must still verify — via twin-only small buckets
    in tail-sensitive bands plus the triple chains (sorted-id / sig0
    minhash-order / hash-order) inside the crowded ones.  Pins the
    candidate-coverage property the 9.7M-row rehearsal relies on."""
    import numpy as np
    import ray.data

    from aws_medallion_datalake_ray.functions import dedup as dd

    rng = np.random.default_rng(3)
    shared = " ".join(f"tok{i}" for i in range(200))
    # 20 twin PAIRS behind one shared template: every doc shares a 200-token
    # prefix (so whole-corpus mega-buckets form, sim ~0.5 cross-pair) and
    # only its twin clears the threshold (~0.97).  With max_bucket=8 the
    # candidate set inside the mega-buckets comes from CHAINS alone — a
    # random (digest-like) id order links mostly sub-threshold cross pairs,
    # and only the sig0 (minhash-order) chain keeps twins adjacent
    texts = []
    for k in range(20):
        tail = " ".join(f"pair{k}_w{j}" for j in range(100))
        texts.append(f"{shared} {tail}")
        texts.append(f"{shared} {tail} extra_token")
    ids = rng.permutation(len(texts)).astype(np.int64)  # random = digest-like
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts, pa.string()),
    }))
    pairs = dd.near_dup_pairs(
        ds, threshold=0.9, num_perm=64, bands=16, max_bucket=8,
    ).to_pandas()
    twin = {ids[2 * k]: ids[2 * k + 1] for k in range(20)}
    got = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    missing = [k for k, (a, b) in enumerate(twin.items())
               if (min(a, b), max(a, b)) not in got]
    assert not missing, f"{len(missing)} twin pairs missed: {missing}"
