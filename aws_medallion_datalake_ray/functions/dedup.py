"""Deduplication operators (exact; near-dup variants live alongside).

Exact dedup re-expresses the reference's ``.distinct()`` on silver/gold
tables (``silver_digit_clean.py:90,98,106``, ``gold_digit_fixed.py:49,67``)
in a scale-safe shape: instead of a per-key shuffle (one tiny group per
distinct key), rows are hash-partitioned into ``num_partitions`` buckets by
key hash and each *bucket* is deduplicated with one vectorized
``drop_duplicates`` — group count = P, not n_distinct, so per-group overhead
is amortized.  The same partitioner underpins MERGE (salted hash join).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols, salted_partition

_PART = "__dedup_part"


def _add_part(key_cols: tuple[str, ...], num_partitions: int):
    def fn(batch: pa.Table) -> pa.Table:
        h = hash_batch_cols(batch, key_cols)
        return batch.append_column(_PART, pa.array(salted_partition(h, num_partitions)))

    return fn


def exact_dedup(ds: Dataset, key_cols, num_partitions: int = 64) -> Dataset:
    """Keep one arbitrary row per distinct key tuple (D1).

    Use when duplicates are exact replicas on the key (e.g. source_files,
    where ``content`` is uniquely determined by (repo, path, commit)).
    """
    key_cols = tuple(key_cols)

    def dedup_group(df):
        return df.drop_duplicates(list(key_cols))

    out = (
        ds.map_batches(_add_part(key_cols, num_partitions), batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(dedup_group, batch_format="pandas")
    )
    return out.drop_columns([_PART])


def keep_latest(
    ds: Dataset, key_cols, order_col, num_partitions: int = 64, keep: str = "last"
) -> Dataset:
    """Keep the row with the max (``keep="last"``) or min (``"first"``)
    ``order_col`` (one or more columns) per key tuple — keep-latest dedup, the
    engine's generalization of the reference's weekly master-data overwrite
    (``bronze_digit_master_weekly.py:108-110``)."""
    key_cols = tuple(key_cols)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def latest_group(df):
        df = df.sort_values(order_cols, kind="stable")
        return df.drop_duplicates(list(key_cols), keep=keep)

    out = (
        ds.map_batches(_add_part(key_cols, num_partitions), batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(latest_group, batch_format="pandas")
    )
    return out.drop_columns([_PART])


# ====================================================================== near-dup
#
# MinHash+LSH / SimHash / n-gram Jaccard — none exist in the reference
# (SURVEY.md §2.7: "No near-dedup"); they are first-class training-data ops
# here.  Pipeline shape (ray_guide): shingle+minhash per batch (stateful
# hasher actor) -> explode to (band, band_hash, doc) rows -> groupby bands ->
# candidate pairs -> exact-Jaccard verify on the (small) candidate set.

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from aws_medallion_datalake_ray.functions.hashing import hash_col  # noqa: E402

_MERSENNE = (1 << 61) - 1


def shingle_set(text: str, k: int = 5) -> np.ndarray:
    """Stable uint64 hashes of k-token shingles (crc32-seeded, process-stable)."""
    from zlib import crc32

    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    return np.unique(
        np.array(
            [crc32(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)],
            dtype=np.uint64,
        )
    )


class MinHasher:
    """Actor-pool stage state: H seeded permutations ``(a*x+b) % p``."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        x = shingle_set(text, self.k)
        with np.errstate(over="ignore"):
            m = (x[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return m.min(axis=1)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = shingle_set(text_a, k), shingle_set(text_b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Character n-gram Jaccard (order-insensitive near-dup measure)."""
    ga = {text_a[i : i + n] for i in range(max(1, len(text_a) - n + 1))}
    gb = {text_b[i : i + n] for i in range(max(1, len(text_b) - n + 1))}
    union = len(ga | gb)
    return len(ga & gb) / union if union else 1.0


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash per document (stable token hashes, vectorized bit sums)."""
    bit_idx = np.arange(64, dtype=np.uint64)
    out = np.empty(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts.fillna("")):
        toks = s.split()
        if not toks:
            out[i] = 0
            continue
        hs = hash_col(np.array(toks, dtype=object))
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits((v > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def merge_count_states(a, b):
    """O(n) merge of two SORTED (keys, counts) numpy-pair states (no re-sort).
    The mergeable-sketch combine for the near-dup bucket counter; associative
    and commutative (property-tested), so Ray may tree-combine in any order."""
    if a is None or len(a[0]) == 0:
        return b
    if b is None or len(b[0]) == 0:
        return a
    ka, va = a
    kb, vb = b
    n = len(ka) + len(kb)
    ib = np.searchsorted(ka, kb) + np.arange(len(kb))
    k = np.empty(n, ka.dtype)
    v = np.empty(n, va.dtype)
    mask = np.ones(n, bool)
    mask[ib] = False
    k[ib], v[ib] = kb, vb
    k[mask], v[mask] = ka, va
    first = np.empty(n, bool)
    first[0] = True
    first[1:] = k[1:] != k[:-1]
    idx = np.flatnonzero(first)
    return (k[idx], np.add.reduceat(v, idx))


class BandEmitter(MinHasher):
    """Actor-pool stage: minhash signature -> (id, bucket) rows, where
    ``bucket`` packs (band_id, band_hash) into one uint64 — a single-column
    shuffle key is dramatically cheaper than a two-column one.  The
    permutation table builds once per actor (``__init__``)."""

    def __init__(self, id_col: str, text_col: str, bands: int, num_perm: int = 64,
                 shingle_k: int = 5, seed: int = 7):
        super().__init__(num_perm=num_perm, shingle_k=shingle_k, seed=seed)
        self.id_col, self.text_col, self.bands = id_col, text_col, bands
        self.rows_per_band = num_perm // bands

    def signatures(self, texts) -> np.ndarray:
        """Vectorized batch minhash: ONE stable hash call for every token in
        the batch, rolling-polynomial k-shingle hashes (k shifted multiplies,
        no per-shingle python), and per-doc minima via ``minimum.reduceat``
        over the concatenated shingle array.  Multiset min == set min, so no
        dedup/sort is needed.  ~10x less allocation churn than per-doc loops
        — this is what keeps per-core throughput flat at high worker counts.
        """
        from aws_medallion_datalake_ray.functions.hashing import hash_col

        k = self.k
        tok_lists = [str(t).split() for t in texts]
        counts = np.array([max(len(tl), k) for tl in tok_lists], dtype=np.int64)
        all_toks = []
        for tl in tok_lists:
            if len(tl) < k:
                tl = tl + [""] * (k - len(tl))
            all_toks.extend(tl)
        if not all_toks:
            return np.zeros((len(tok_lists), self.num_perm), dtype=np.uint64)
        th = hash_col(np.array(all_toks, dtype=object))

        # rolling polynomial over k consecutive token hashes, within-doc only
        B = np.uint64(1099511628211)
        n = len(th)
        with np.errstate(over="ignore"):
            sh = th[: n - k + 1].copy()
            for j in range(1, k):
                sh = sh * B + th[j : n - k + 1 + j]
        # valid shingle windows: those fully inside one doc
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        n_sh = counts - k + 1  # >= 1 by construction
        idx = np.concatenate(
            [np.arange(s, s + m) for s, m in zip(starts, n_sh)]
        )
        sh = sh[idx]
        offsets = np.concatenate([[0], np.cumsum(n_sh)[:-1]])

        with np.errstate(over="ignore"):
            sigs = np.empty((self.num_perm, len(offsets)), dtype=np.uint64)
            for i in range(self.num_perm):
                vals = (sh * self.a[i] + self.b[i]) % np.uint64(_MERSENNE)
                sigs[i] = np.minimum.reduceat(vals, offsets)
        return sigs.T.copy()

    def buckets_of(self, texts) -> np.ndarray:
        """(n_docs, bands) uint64 bucket ids (vectorized fold per band)."""
        sigs = self.signatures(texts)  # (n, num_perm)
        n = sigs.shape[0]
        out = np.empty((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                band = sigs[:, b * self.rows_per_band : (b + 1) * self.rows_per_band]
                folded = band[:, 0].copy()
                for j in range(1, band.shape[1]):
                    folded = folded * np.uint64(1099511628211) + band[:, j]
                out[:, b] = folded * np.uint64(31) + np.uint64(b)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        b = self.buckets_of(batch[self.text_col])
        ids = np.repeat(batch[self.id_col].to_numpy(), self.bands)
        return pd.DataFrame({self.id_col: ids, "bucket": b.reshape(-1).astype(np.int64)})


def near_dup_candidate_count(
    ds, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16,
    shingle_k: int = 5, concurrency=(2, 16),
) -> dict:
    """Distributed near-dup *scan*: count LSH bucket collisions over the whole
    corpus without materializing pairs — the maintenance-cycle stage shape for
    100 TB.  Signatures run on an actor pool; counting is a **mergeable
    sketch** (bucket -> count as sorted numpy pairs) combined by Ray Data's
    tree aggregation — no all-to-all shuffle at all, the only data movement
    is per-block count states (~KBs each)."""
    from ray.data.aggregate import AggregateFnV2 as _AggBase  # Ray 2.49

    banded = ds.select_columns([id_col, text_col]).map_batches(
        BandEmitter,
        fn_constructor_kwargs={
            "id_col": id_col, "text_col": text_col, "bands": bands,
            "num_perm": num_perm, "shingle_k": shingle_k,
        },
        batch_format="pandas",
        concurrency=concurrency,
    )

    class BucketCounts(_AggBase):
        def __init__(self):
            super().__init__(
                name="bucket_counts",
                zero_factory=lambda: (np.array([], np.int64), np.array([], np.int64)),
                on=None,
                ignore_nulls=True,
            )

        def aggregate_block(self, block):
            tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            b = np.asarray(tbl["bucket"].to_pandas(), np.int64)
            uk, counts = np.unique(b, return_counts=True)
            return (uk, counts.astype(np.int64))

        def combine(self, a, b):
            return merge_count_states(a, b)

    # the doc ids aren't needed for counting — drop them before aggregation
    # (8-byte buckets instead of 48-byte rows) and coalesce into a few large
    # blocks so the merge tree is shallow
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    res = (
        banded.select_columns(["bucket"])
        .repartition(max(16, 2 * ncpu))
        .aggregate(BucketCounts())
    )
    uk, counts = res["bucket_counts"]
    coll = counts > 1
    return {
        "buckets": int(len(uk)),
        "collision_buckets": int(coll.sum()),
        "colliding_rows": int(counts[coll].sum()),
    }


def minhash_near_dups(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> pa.Table:
    """MinHash+LSH near-duplicate pairs: returns (id_a, id_b, jaccard) for
    verified pairs with Jaccard >= threshold.

    Scale notes: the signature stage is an actor pool (hasher built once per
    actor); banding explodes to (band, band_hash, id) and the candidate
    groupby shuffles only those tiny rows, never the texts.  Verification
    re-reads just the candidate docs (semi-join via broadcast id set).
    """
    rows_per_band = num_perm // bands

    class Bander(MinHasher):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids, bnd, bh = [], [], []
            for doc, text in zip(batch[id_col], batch[text_col]):
                sig = self.signature(str(text))
                for b in range(bands):
                    band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    ids.append(doc)
                    bnd.append(b)
                    bh.append(int(np.bitwise_xor.reduce(band) % np.uint64(_MERSENNE)))
            return pd.DataFrame({id_col: ids, "band": bnd, "band_hash": bh})

    banded = ds.select_columns([id_col, text_col]).map_batches(
        Bander,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=(1, 8),
    )

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"id_a": a, "id_b": b})

    cand = (
        banded.groupby(["band", "band_hash"])
        .map_groups(pairs_in_group, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if cand.empty:
        return pa.table({"id_a": [], "id_b": [], "jaccard": []})

    # verify: fetch only candidate docs' texts (semi-join on id set)
    need = set(cand["id_a"]) | set(cand["id_b"])
    texts: dict = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        hitmask = b[id_col].isin(need)
        for i, t in zip(b.loc[hitmask, id_col], b.loc[hitmask, text_col]):
            texts[i] = str(t)
    sims = [
        jaccard(texts[x], texts[y], shingle_k) for x, y in zip(cand["id_a"], cand["id_b"])
    ]
    out = cand.assign(jaccard=sims)
    out = out[out["jaccard"] >= threshold].sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
