"""Embedding similarity search over a ``list<float>`` column.

- :func:`cosine_topk` — brute-force cosine top-k: the query matrix is
  broadcast ONCE (``ray.put``), each batch does one numpy matmul and emits
  only its local top-k candidates; the driver merges tiny partials (no global
  sort of scores).
- :class:`LshBucketer` / :func:`ann_lsh` — the scale path: random-hyperplane
  LSH buckets; a query probes only its bucket(s), turning O(N) scans into
  O(N / 2^planes) per probe.
- :func:`build_ivf_centroids` / :func:`assign_ivf` / :func:`ann_ivf` — the
  IVF scale path: spherical k-means centroids trained on a BOUNDED sample
  (driver state = sample_size × dim, independent of corpus size), streaming
  cluster assignment (broadcast centroids, per-batch matmul argmax), and
  nprobe-cluster query scans.  At 100 TB the assigned dataset is written as
  a LakeTable clustered on ``ivf_cluster`` so the probe filter prunes files
  via manifest stats instead of streaming the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _as_matrix(col) -> np.ndarray:
    """list<float> / tensor-extension column -> (n, d) float64 matrix."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            return flat.reshape(len(col), -1)
        # Ray's ArrowTensorArray (from_pandas list columns) and friends
        arr = col.to_numpy(zero_copy_only=False)
        return np.stack([np.asarray(x, np.float64) for x in arr]) if arr.dtype == object \
            else np.asarray(arr, np.float64)
    return np.stack(
        [np.asarray(x, np.float64) for x in (col.to_numpy() if isinstance(col, pd.Series) else col)]
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norm, 1e-12)


def _score_batch(
    batch: pa.Table, queries_ref, k: int, id_col: str, vec_col: str
) -> pa.Table:
    """Per-batch matmul + local argpartition top-k.  The normalized query
    matrix is a ZERO-COPY plasma fetch (fixed-dtype numpy) per task — never
    re-shipped with the task."""
    q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
    m = _normalize(_as_matrix(batch[vec_col]))
    ids = np.asarray(batch[id_col].to_pandas())
    scores = q @ m.T  # (Q, n)
    k = min(k, scores.shape[1])
    part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    out_q, out_id, out_s = [], [], []
    for qi in range(scores.shape[0]):
        out_q.extend([qi] * k)
        out_id.extend(ids[part[qi]])
        out_s.extend(scores[qi, part[qi]])
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id),
            "score": pa.array(out_s, pa.float64()),
        }
    )


def cosine_topk(
    ds: Dataset, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Global cosine top-k per query row.  Returns (query_idx, rank, id, score)
    sorted by (query_idx, rank); ties broken by id for determinism."""
    queries = np.atleast_2d(np.asarray(queries, np.float64))
    ref = ray.put(np.ascontiguousarray(_normalize(queries)))
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        _score_batch,
        fn_kwargs={"queries_ref": ref, "k": k, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow",
    )
    df = partials.to_pandas()  # Q * k * n_batches rows — tiny
    df["score_r"] = df["score"].round(6)
    df = df.sort_values(
        ["query_idx", "score_r", id_col], ascending=[True, False, True], kind="stable"
    )
    df = df.groupby("query_idx", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_idx").cumcount() + 1
    return df[["query_idx", "rank", id_col, "score_r"]].rename(columns={"score_r": "score"})


class LshBucketer:
    """Random-hyperplane signature: bucket = sign bits of (v @ planes)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11,
                 vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.vec_col = vec_col

    def bucket_of(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[self.vec_col])
        return batch.append_column("lsh_bucket", pa.array(self.bucket_of(m)))


def embedding_near_dups(
    ds: Dataset, dim: int, threshold: float = 0.9, n_planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 11,
    max_bucket: int = 1024, as_dataset: bool = False,
) -> "pd.DataFrame | Dataset":
    """Embedding-cosine near-duplicate pairs via LSH-bucketed blocking.

    Vectors are bucketed by hyperplane signature (near-identical vectors
    collide with high probability); each bucket does an exact pairwise cosine
    check.  Only pairs with cos >= threshold are returned — the all-pairs
    O(n^2) never happens, only O(sum bucket^2) with buckets ~ n / 2^planes.

    Mega-bucket cap: a bucket over ``max_bucket`` rows (an all-similar
    corpus) is ordered by a SECONDARY seeded projection and compared in
    50%-overlapping windows of ``max_bucket`` — near-identical vectors have
    near-identical projections, so true near-dups stay within a window and
    per-group work is bounded O(n * max_bucket), never O(n²).
    """
    sec_rng = np.random.default_rng(seed + 1)
    sec_plane = sec_rng.standard_normal(dim)

    def exact_pairs(m, ids):
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cosine": np.round(sims[iu, ju][keep], 6)}
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        m = _normalize(np.stack([np.asarray(v, np.float64) for v in g[vec_col]]))
        ids = g[id_col].to_numpy()
        if len(g) <= max_bucket:
            return exact_pairs(m, ids)
        order = np.argsort(m @ sec_plane, kind="stable")
        step = max(1, max_bucket // 2)
        chunks = []
        for s in range(0, len(order), step):
            w = order[s : s + max_bucket]
            if len(w) >= 2:
                chunks.append(exact_pairs(m[w], ids[w]))
        out = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame(
            {"id_a": [], "id_b": [], "cosine": []}
        )
        return out.drop_duplicates(["id_a", "id_b"])

    pairs_ds = (
        ds.map_batches(
            LshBucketer,
            fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed,
                                   "vec_col": vec_col},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("lsh_bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    if as_dataset:
        # scale path: pairs stay a Dataset (hash-partitioned distinct) —
        # feed dedup/removal pipelines without a driver materialization
        from aws_medallion_datalake_ray.functions.dedup import exact_dedup

        return exact_dedup(pairs_ds, ("id_a", "id_b"), rebundle_narrow=True)
    out = pairs_ds.to_pandas()
    return out.drop_duplicates(["id_a", "id_b"]).sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)


def build_ivf_centroids(
    ds: Dataset, n_centroids: int = 16, sample_size: int = 20_000,
    iters: int = 15, seed: int = 11, vec_col: str = "embedding",
) -> np.ndarray:
    """Train spherical k-means centroids on a bounded sample of the corpus.

    The sample is a deterministic STRIDE over the whole dataset (every
    ``ceil(n/sample_size)``-th row of every batch) — unlike a ``limit()``
    prefix it covers a corpus stored in clustered/sorted order, and unlike
    ``random_sample`` it is reproducible for a fixed input.  The sample is
    the ONLY driver-side state; Lloyd iterations on (sample × dim) are pure
    numpy.  Empty clusters re-seed to the worst-assigned point.  Returns a
    unit-normalized (n_centroids, dim) matrix.
    """
    vecs = ds.select_columns([vec_col])
    n = vecs.count()
    stride = max(1, -(-n // max(1, sample_size)))  # ceil
    if stride > 1:
        vecs = vecs.map_batches(
            lambda t, s=stride: t.take(
                pa.array(np.arange(0, len(t), s, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
    sample = _normalize(
        _as_matrix(vecs.limit(sample_size).to_pandas()[vec_col])
    )
    n = len(sample)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, n)
    cent = sample[rng.choice(n, k, replace=False)]
    for _ in range(iters):
        sims = sample @ cent.T  # (n, k)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        new = np.zeros_like(cent)
        np.add.at(new, assign, sample)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            worst = np.argsort(best)[: int(empty.sum())]
            new[empty] = sample[worst]
            counts[empty] = 1
        cent = _normalize(new / counts[:, None])
    return cent


def assign_ivf(
    ds: Dataset, centroids: np.ndarray, vec_col: str = "embedding",
    out_col: str = "ivf_cluster",
) -> Dataset:
    """Streaming cluster assignment: centroids broadcast once (``ray.put``),
    one matmul + argmax per batch."""
    ref = ray.put(np.ascontiguousarray(centroids))

    def fn(t: pa.Table) -> pa.Table:
        c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = _normalize(_as_matrix(t[vec_col]))
        cl = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return t.append_column(out_col, pa.array(cl))

    return ds.map_batches(fn, batch_format="pyarrow")


def ann_ivf(
    ds: Dataset, query: np.ndarray, centroids: np.ndarray, nprobe: int = 4,
    k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    cluster_col: str | None = None,
) -> pd.DataFrame:
    """IVF approximate top-k: exact cosine over only the ``nprobe`` clusters
    whose centroids are nearest the query.

    The ``N * nprobe/n_centroids`` scan cost holds when assignments are
    PRECOMPUTED — pass ``cluster_col`` naming an existing assignment column
    (an ``assign_ivf`` output, materialized or written as a LakeTable
    clustered on it so the probe filter prunes files).  Without it, this
    call streams one assignment pass over the corpus first (compute cost N,
    like the build side of any index).  The partitioning assumption:
    near-neighbors share the query's nearest coarse centroids (standard IVF
    recall/probe tradeoff)."""
    import pyarrow.compute as pc

    q = _normalize(np.atleast_2d(np.asarray(query, np.float64)))
    probe = np.argsort(-(q @ centroids.T)[0], kind="stable")[:nprobe]
    col = cluster_col or "ivf_cluster"
    assigned = ds if cluster_col else assign_ivf(ds, centroids, vec_col)
    filtered = assigned.map_batches(
        lambda t: t.filter(
            pc.is_in(t[col], value_set=pa.array(probe.astype(np.int64)))
        ),
        batch_format="pyarrow",
    )
    return cosine_topk(filtered, query, k=k, id_col=id_col, vec_col=vec_col)


def ann_lsh(
    ds: Dataset, query: np.ndarray, dim: int, k: int = 10, n_planes: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 11,
    n_probe_bits: int = 1,
) -> pd.DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket plus
    all buckets within ``n_probe_bits`` Hamming distance (multi-probe).
    Trades recall for a ~2^n_planes / n_probes scan reduction — the
    documented partitioning assumption is that near-neighbors land within a
    few sign-bit flips of the query's hyperplane signature."""
    import itertools

    import pyarrow.compute as pc

    b = LshBucketer(dim, n_planes, seed, vec_col)
    qbucket = int(b.bucket_of(np.atleast_2d(np.asarray(query, np.float64)))[0])
    probes = {qbucket}
    for r in range(1, n_probe_bits + 1):
        for bits in itertools.combinations(range(n_planes), r):
            flipped = qbucket
            for i in bits:
                flipped ^= 1 << i
            probes.add(flipped)
    probe_list = sorted(probes)
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "seed": seed,
                               "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["lsh_bucket"], value_set=pa.array(probe_list))),
        batch_format="pyarrow",
    )
    return cosine_topk(bucketed, query, k=k, id_col=id_col, vec_col=vec_col)
