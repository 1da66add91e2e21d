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


def exact_dedup(
    ds: Dataset, key_cols, num_partitions: int = 64,
    rebundle_narrow: "bool | int | None" = None,
) -> Dataset:
    """Keep one arbitrary row per distinct key tuple (D1).

    Use when duplicates are exact replicas on the key (e.g. source_files,
    where ``content`` is uniquely determined by (repo, path, commit)).

    ``rebundle_narrow``: set True (or an explicit block count) for
    NARROW-row inputs (key pairs, hashes) so the partition shuffle's pieces
    clear Ray's in-band threshold instead of accumulating in the driver
    heap (``functions/blocks.py``); leave None for wide rows (document
    content), whose blocks are already plasma-sized.
    """
    key_cols = tuple(key_cols)

    def dedup_group(df):
        return df.drop_duplicates(list(key_cols))

    tagged = ds.map_batches(_add_part(key_cols, num_partitions),
                            batch_format="pyarrow")
    if rebundle_narrow:
        from aws_medallion_datalake_ray.functions.blocks import rebundle

        tagged = rebundle(
            tagged, None if rebundle_narrow is True else rebundle_narrow)
    out = tagged.groupby(_PART).map_groups(dedup_group, batch_format="pandas")
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
    """Actor-pool stage state: H seeded affine permutations ``a*x+b mod 2^64``
    (odd ``a`` — multiply-shift family).  Full-word wraparound instead of a
    mod-prime: the min is dominated by the multiplier's strong high bits, and
    dropping the ``%`` makes the permutation loop ~2.3x faster (it is the
    single largest cost in the near-dup scan)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.k = shingle_k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        x = shingle_set(text, self.k)
        with np.errstate(over="ignore"):
            m = x[None, :] * self.a[:, None] + self.b[:, None]
        return m.min(axis=1)


def shingle_hashes64(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 64-bit rolling-polynomial hashes of k-token shingles.

    64-bit (vs the crc32 ``shingle_set``) so distinct-shingle counting in the
    exact-Jaccard verify kernel can't be perturbed by 32-bit collisions at
    corpus scale; uses the same stable token hash as the MinHash signatures.
    """
    toks = str(text).split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    th = hash_col(np.array(toks, dtype=object))
    B = np.uint64(1099511628211)
    n = len(th)
    with np.errstate(over="ignore"):
        sh = th[: n - k + 1].copy()
        for j in range(1, k):
            sh = sh * B + th[j : n - k + 1 + j]
    return np.unique(sh)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = shingle_hashes64(text_a, k), shingle_hashes64(text_b, k)
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
    """64-bit SimHash per document, batch-vectorized: ONE stable hash call for
    every token in the batch, per-doc bit-vote sums via ``add.reduceat`` — no
    per-document Python loop (same pattern as ``BandEmitter.signatures``)."""
    tok_lists = [str(s).split() for s in texts.fillna("")]
    counts = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
    out = np.zeros(len(tok_lists), dtype=np.uint64)
    all_toks = [t for tl in tok_lists for t in tl]
    if not all_toks:
        return out
    hs = hash_col(np.array(all_toks, dtype=object))
    nz = counts > 0
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nz]
    # per-bit 1-D reduceat over the contiguous token-hash array: 64 cheap
    # contiguous passes beat one strided 2-D reduceat by ~80x
    sums = np.empty((len(starts), 64), dtype=np.int64)
    one = np.uint64(1)
    for b in range(64):
        sums[:, b] = np.add.reduceat(
            (hs >> np.uint64(b)) & one, starts
        ).astype(np.int64)
    votes = 2 * sums - counts[nz][:, None]  # (+1 per 1-bit, -1 per 0-bit)
    packed = np.packbits((votes > 0).astype(np.uint8), axis=1, bitorder="little")
    out[nz] = packed.view(np.uint64).ravel()
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
    # states may round-trip through Arrow blocks as lists — re-materialize
    ka, va = np.asarray(a[0]), np.asarray(a[1])
    kb, vb = np.asarray(b[0]), np.asarray(b[1])
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
                np.multiply(sh, B, out=sh)  # in-place: avoid fresh-page cost
                np.add(sh, th[j : n - k + 1 + j], out=sh)
        # valid shingle windows: those fully inside one doc
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        n_sh = counts - k + 1  # >= 1 by construction
        idx = np.concatenate(
            [np.arange(s, s + m) for s, m in zip(starts, n_sh)]
        )
        sh = sh[idx]
        offsets = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
        return self._perm_minima(sh, offsets)  # affine mod 2^64, odd a

    def buckets_of(self, texts) -> np.ndarray:
        """(n_docs, bands) uint64 bucket ids (vectorized fold per band)."""
        return self._fold_buckets(self.signatures(texts))

    def signatures_arrow(self, arr) -> np.ndarray:
        """Arrow-native :meth:`signatures` — identical output (asserted in
        tests): C-speed whitespace split, token hashes over the
        dictionary-DISTINCT tokens only (Zipf corpora: 5-20× fewer SipHash
        calls), vectorized pad/scatter for short docs.  The permutation loop
        (the dominant cost) is shared with the pandas path."""
        from aws_medallion_datalake_ray.functions.hashing import (
            flat_token_hashes, rolling_token_windows)

        if len(arr) == 0:
            return np.zeros((0, self.num_perm), dtype=np.uint64)
        th, counts = flat_token_hashes(arr, self.k)
        sh, offsets = rolling_token_windows(
            th, counts, self.k, np.uint64(1099511628211)
        )
        return self._perm_minima(sh, offsets)

    def _perm_minima(self, sh: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Affine-permutation minima with ONE reusable buffer: `sh*a+b` as
        fresh arrays cost 2 allocations x num_perm x 8B x n_shingles of
        first-touch page faults per batch (~3 GB at 96 perms / 2M shingles),
        which measured ~50x the arithmetic on this host."""
        with np.errstate(over="ignore"):
            sigs = np.empty((self.num_perm, len(offsets)), dtype=np.uint64)
            buf = np.empty_like(sh)
            for i in range(self.num_perm):
                np.multiply(sh, self.a[i], out=buf)
                np.add(buf, self.b[i], out=buf)
                sigs[i] = np.minimum.reduceat(buf, offsets)
        return sigs.T.copy()

    def _fold_buckets(self, sigs: np.ndarray) -> np.ndarray:
        """(n, num_perm) signatures -> (n, bands) packed uint64 bucket ids."""
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

    def emit_arrow(self, t: pa.Table, with_text: bool = False,
                   compress_text: bool = False) -> pa.Table:
        """Arrow batch -> (id[, text], bucket) rows without materializing
        Python strings: columns replicate via ``Table.take`` (C-speed, works
        for string ids too).  ``with_text=True`` carries the document text
        alongside each banding row — the local-verify plan's payload;
        ``compress_text=True`` zlib-compresses it ONCE per doc before the
        bands-fold replication (the payload crosses the shuffle bands x, and
        template-heavy corpora compress ~4x — the shuffle is network/disk
        bound at scale, the codec is CPU on otherwise-idle map workers)."""
        sigs = self.signatures_arrow(t[self.text_col])
        b = self._fold_buckets(sigs)
        # sig0 (first permutation minimum) rides along as a SIMILARITY proxy:
        # near-identical docs share it with probability ~ their Jaccard, so
        # ordering a mega-bucket by sig0 puts true near-dups adjacent — the
        # chain cap's recall then survives arbitrary (e.g. digest) id orders
        sig0 = np.repeat(sigs[:, 0].astype(np.int64), self.bands)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), self.bands)
        if with_text and compress_text:
            import zlib

            z = pa.array(
                [zlib.compress(s.encode("utf-8"), 1)
                 for s in t[self.text_col].to_pylist()],
                pa.binary(),
            )
            base = pa.table({self.id_col: t[self.id_col], "__ztext": z})
            out = base.take(pa.array(idx))
        else:
            cols = [self.id_col] + ([self.text_col] if with_text else [])
            out = t.select(cols).take(pa.array(idx))
        out = out.append_column("sig0", pa.array(sig0))
        return out.append_column(
            "bucket", pa.array(b.reshape(-1).astype(np.int64))
        )


_EMITTER_CACHE: dict = {}


def band_emit_batch(df: pd.DataFrame, **kw) -> pd.DataFrame:
    """Stateless-task variant of :class:`BandEmitter`: the emitter (seeded
    permutation table, compiled state) is cached PER WORKER PROCESS, so plain
    ``map_batches(band_emit_batch, fn_kwargs=...)`` gets init-once semantics
    without an actor pool — pools idle the non-pool CPUs, stateless tasks
    use them all (better scaling at high CPU counts)."""
    k = tuple(sorted(kw.items()))
    e = _EMITTER_CACHE.get(k)
    if e is None:
        e = BandEmitter(**kw)
        _EMITTER_CACHE[k] = e
    return e(df)


def band_emit_batch_arrow(t: pa.Table, with_text: bool = False,
                          compress_text: bool = False, **kw) -> pa.Table:
    """Arrow-native stateless banding task (``batch_format="pyarrow"``): the
    text column never materializes Python strings (the production path for
    the near-dup scan and pair pipeline); same per-worker emitter cache as
    :func:`band_emit_batch`."""
    k = tuple(sorted(kw.items()))
    e = _EMITTER_CACHE.get(k)
    if e is None:
        e = BandEmitter(**kw)
        _EMITTER_CACHE[k] = e
    return e.emit_arrow(t, with_text=with_text, compress_text=compress_text)


def near_dup_candidate_count(
    ds, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16,
    shingle_k: int = 5, num_partitions: int | None = None,
) -> dict:
    """Distributed near-dup *scan*: count LSH bucket collisions over the whole
    corpus without materializing pairs — the maintenance-cycle stage shape for
    100 TB.

    Scale shape (every state SUBLINEAR in corpus size — the round-2 version's
    mergeable sketch was an exact bucket→count map whose ROOT state grew
    O(docs × bands), a driver OOM at 10^9 docs):

    1. vectorized banding -> per-block partial ``np.unique`` collapses
       within-block duplicate buckets to (partition, bucket, count) rows;
    2. one hash-partitioned shuffle co-locates equal buckets (P = O(cluster
       CPUs) groups, never per-bucket groups);
    3. each partition rolls up to THREE integers (buckets, collision_buckets,
       colliding_rows) with one vectorized sort+reduceat;
    4. the driver sums P rows of 3 ints.

    Texts never leave the workers; the only all-to-all moves 24-byte partial
    count rows (<= docs × bands, less after block-level collapse)."""
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    P = num_partitions or max(32, 2 * ncpu)

    def band_partial_counts(t: pa.Table) -> pa.Table:
        # banding and the per-block partial count run in ONE task so the wide
        # (id, bucket) banded table never reaches the object store — same
        # wall as two chained map_batches at this scale (A/B parity at 2.4M
        # docs / 16 CPUs), but docs×bands×(id+8B) fewer intermediate bytes
        # held per in-flight block at cluster scale
        bt = band_emit_batch_arrow(
            t, id_col=id_col, text_col=text_col, bands=bands,
            num_perm=num_perm, shingle_k=shingle_k,
        )
        b = np.asarray(bt["bucket"].to_pandas(), np.int64)
        uk, c = np.unique(b, return_counts=True)
        part = (uk.astype(np.uint64) >> np.uint64(3)) % np.uint64(P)
        return pa.table(
            {
                "__part": pa.array(part.astype(np.int64)),
                "bucket": pa.array(uk),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    def part_rollup(df: pd.DataFrame) -> pd.DataFrame:
        b = df["bucket"].to_numpy()
        c = df["n"].to_numpy()
        order = np.argsort(b, kind="stable")
        b, c = b[order], c[order]
        first = np.ones(len(b), bool)
        first[1:] = b[1:] != b[:-1]
        idx = np.flatnonzero(first)
        tot = np.add.reduceat(c, idx) if len(idx) else np.array([], np.int64)
        coll = tot > 1
        return pd.DataFrame(
            {
                "buckets": [int(len(idx))],
                "collision_buckets": [int(coll.sum())],
                "colliding_rows": [int(tot[coll].sum())],
            }
        )

    from aws_medallion_datalake_ray.functions.blocks import rebundle

    counts = (
        ds.select_columns([id_col, text_col])
        # 4096-doc batches: whole-block batches (50k docs) build ~50 MB
        # shingle buffers and load-balance poorly (few tasks, stragglers);
        # tiny blocks pay per-task overhead.  Measured 2.6-2.8x faster than
        # batch_size=None on BOTH block shapes at 16 CPUs / 2.4M docs
        .map_batches(band_partial_counts, batch_format="pyarrow", batch_size=4096)
    )
    rolled = (
        # rebundle the 24 B/row count blocks so the shuffle's per-partition
        # pieces land in plasma, not the driver heap (blocks.py rationale;
        # measured: driver ru_maxrss 2.1 GB -> flat at 2.4M docs)
        rebundle(counts)
        .groupby("__part")
        .map_groups(part_rollup, batch_format="pandas")
        .to_pandas()  # <= P rows of 3 ints
    )
    return {
        "buckets": int(rolled["buckets"].sum()),
        "collision_buckets": int(rolled["collision_buckets"].sum()),
        "colliding_rows": int(rolled["colliding_rows"].sum()),
    }


def _bucket_pairs_fn(id_col: str, max_bucket: int):
    """Candidate pairs for EVERY LSH bucket hash-routed to one partition.

    Scale shape: the groupby key is a HASH PARTITION of the bucket space
    (P = O(cluster CPUs) groups), never the bucket itself — a collision-rich
    corpus has millions of buckets, and a per-bucket pandas group costs ~1 ms
    of groupby machinery each (measured 8 min for the pair stage on a 50k-doc
    / 220k-collision-bucket fixture; this shape runs it in seconds).  Inside
    a partition one lexsort + run-boundary scan recovers the buckets and each
    run emits vectorized.

    Per-bucket semantics (unchanged): all-pairs (sorted ``triu``) up to
    ``max_bucket`` ids; above that, consecutive-chain pairs under TWO
    independent orderings (sorted-id and hashed-id) — 2(n-1) pairs, O(n)
    instead of O(n²), bounding work when an all-similar corpus lands every
    doc in one bucket.

    Recall tradeoff (documented, by design): chains preserve candidate-stage
    cluster *connectivity*, but if an adjacent chain pair later fails the
    exact-Jaccard verify, a cluster can split and dedup retain a true
    near-dup.  The second (hash-order) chain densifies connectivity — a split
    needs BOTH orderings to fail at the same frontier — while staying O(n);
    exhaustive recall inside mega-buckets would be O(n²) by definition."""

    def pairs_in_part(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        b = g["bucket"].to_numpy()
        sig0 = (g["sig0"].to_numpy() if "sig0" in g.columns
                else np.zeros(len(g), np.int64))
        order = np.lexsort((ids, b))
        b, ids, sig0 = b[order], ids[order], sig0[order]
        keep = np.ones(len(b), bool)  # drop (bucket, id) duplicates
        keep[1:] = (b[1:] != b[:-1]) | (ids[1:] != ids[:-1])
        b, ids, sig0 = b[keep], ids[keep], sig0[keep]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        out_a: list = []
        out_b: list = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            m = e - s
            if m < 2:
                continue
            u = ids[s:e]  # unique AND ascending within this bucket
            if m <= max_bucket:
                ia, ib = np.triu_indices(m, k=1)
                out_a.append(u[ia])
                out_b.append(u[ib])
            else:
                # three O(n) chains: sorted-id (key-prefix locality when ids
                # are natural keys), sig0-order (minhash similarity proxy —
                # near-dups stay adjacent under ARBITRARY id orders, e.g.
                # digests), and hash-order (connectivity densifier)
                perm = np.argsort(
                    pd.util.hash_pandas_object(
                        pd.Series(u), index=False).to_numpy(),
                    kind="stable",
                )
                h = u[perm]
                sperm = np.lexsort((u, sig0[s:e]))
                sv = u[sperm]
                cand = pd.DataFrame(
                    {
                        "id_a": np.concatenate(
                            [u[:-1], np.minimum(h[:-1], h[1:]),
                             np.minimum(sv[:-1], sv[1:])]),
                        "id_b": np.concatenate(
                            [u[1:], np.maximum(h[:-1], h[1:]),
                             np.maximum(sv[:-1], sv[1:])]),
                    }
                ).drop_duplicates()
                out_a.append(cand["id_a"].to_numpy())
                out_b.append(cand["id_b"].to_numpy())
        if not out_a:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        # partition-local pre-dedup: a pair that collides in several bands
        # often lands multiple of its buckets in the SAME partition — dropping
        # the copies here shrinks the global pair-dedup shuffle (string-pair
        # rows are the pipeline's widest narrow data) at zero recall cost
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        ).drop_duplicates(["id_a", "id_b"])

    return pairs_in_part


def _batch_jaccard(sets_a: list, sets_b: list) -> np.ndarray:
    """Exact Jaccard for a BATCH of SORTED-unique hash-set pairs
    (:func:`shingle_hashes64` returns ``np.unique`` output, so both sides
    arrive sorted): per pair, one ``searchsorted`` of the smaller set into
    the larger counts the intersection — O(la log lb) per pair with no
    allocation beyond the index array.  Replaces a batch-wide
    flatten+lexsort kernel whose O(T log T) sort over the batch's total
    shingle count dominated the verify stage (measured ~10x slower at
    ~1 KB docs / 4096-pair batches)."""
    n = len(sets_a)
    if n == 0:
        return np.empty(0, np.float64)
    out = np.empty(n, np.float64)
    for i in range(n):
        a, b = sets_a[i], sets_b[i]
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            out[i] = 1.0 if la == lb else 0.0  # union 0 -> similarity 1.0
            continue
        if lb < la:
            a, b, la, lb = b, a, lb, la
        idx = np.searchsorted(b, a)
        idx[idx == lb] = lb - 1  # clamp: a-values above b's max match nothing
        inter = int(np.count_nonzero(b[idx] == a))
        out[i] = inter / (la + lb - inter)
    return out


class PairVerifier:
    """Actor-pool verify stage (broadcast texts): exact shingle-Jaccard per
    candidate pair.  The candidate text dict is ``ray.get`` once per actor;
    shingle arrays are computed once per doc and cached across pairs/batches
    (docs repeat across many pairs); all intersections of a batch run in one
    vectorized :func:`_batch_jaccard` kernel."""

    # shingle arrays inflate ~8x over text bytes (8 B/char); an unbounded
    # cache over a 256 MB broadcast therefore approaches 2 GB per actor.
    # Cap the cached hash count (~128 MB) and reset — pairs arrive grouped
    # by id_a after the pair dedup, so locality survives a reset
    _CACHE_MAX_HASHES = 16_000_000

    def __init__(self, texts_ref, id_cols=("id_a", "id_b"), shingle_k: int = 5):
        import ray as _ray

        self.texts = _ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref
        self.id_a, self.id_b = id_cols
        self.k = shingle_k
        self._cache: dict = {}
        self._cached_hashes = 0

    def _sh(self, i):
        s = self._cache.get(i)
        if s is None:
            s = shingle_hashes64(self.texts[i], self.k)
            if self._cached_hashes + len(s) > self._CACHE_MAX_HASHES:
                self._cache.clear()
                self._cached_hashes = 0
            self._cache[i] = s
            self._cached_hashes += len(s)
        return s

    def __call__(self, t: pa.Table) -> pa.Table:
        sets_a = [self._sh(a) for a in t[self.id_a].to_pylist()]
        sets_b = [self._sh(b) for b in t[self.id_b].to_pylist()]
        sims = _batch_jaccard(sets_a, sets_b)
        return t.append_column("jaccard", pa.array(sims, pa.float64()))


def _verify_pairs_texts(t: pa.Table, shingle_k: int = 5) -> pa.Table:
    """Stateless verify for the joined path: pairs carry text_a/text_b columns;
    a per-batch shingle cache keyed by id amortizes repeated docs; the
    intersections run in one :func:`_batch_jaccard` kernel."""
    cache: dict = {}

    def sh(i, txt):
        s = cache.get(i)
        if s is None:
            s = shingle_hashes64(txt, shingle_k)
            cache[i] = s
        return s

    sets_a = [sh(a, ta) for a, ta in zip(t["id_a"].to_pylist(),
                                         t["text_a"].to_pylist())]
    sets_b = [sh(b, tb) for b, tb in zip(t["id_b"].to_pylist(),
                                         t["text_b"].to_pylist())]
    sims = _batch_jaccard(sets_a, sets_b)
    return pa.table(
        {"id_a": t["id_a"], "id_b": t["id_b"], "jaccard": pa.array(sims, pa.float64())}
    )


# introspection for tests/telemetry: which verify plan the last
# near_dup_pairs call took, and why
LAST_VERIFY_PLAN: dict = {}


def near_dup_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 512,
    broadcast_threshold: int = 200_000,
    broadcast_bytes_budget: int = 256 * 1024 * 1024,
    id_broadcast_threshold: int = 5_000_000,
    concurrency=(2, 16),
    verify_chunk_bytes: int = 256 << 20,
    verify_chunk_min_pairs: int = 100_000,
):
    """MinHash+LSH near-duplicate pairs, fully distributed: returns a Dataset
    of (id_a, id_b, jaccard) with exact shingle-Jaccard >= threshold.

    Pipeline shape (nothing big touches the driver):

    1. vectorized signature+banding actor pool -> (id, bucket) rows — only
       8-byte buckets + ids shuffle, never texts;
    2. ``groupby(bucket).map_groups`` -> candidate pairs (mega-buckets fall
       back to consecutive-chain pairs, see ``_bucket_pairs_fn``);
    3. distinct pairs via hash-partitioned dedup (a pair collides in many
       bands);
    4. candidate doc ids via hash-partitioned distinct — broadcast as one
       sorted array while they fit (``id_broadcast_threshold``), else kept a
       DATASET and semi-joined distributed, so even a
       billion-colliding-doc corpus never lands an id array on the driver;
    5. exact verify: candidate texts semi-joined from the corpus and
       MATERIALIZED once in the object store (so neither plan re-scans the
       corpus); **broadcast plan** when the candidate set is small by BOTH
       count (``broadcast_threshold``) and bytes (``broadcast_bytes_budget``
       — a handful of 100 MB docs must not squeeze through the driver heap):
       texts ``ray.put`` once, verified on an actor pool with per-actor
       shingle caches; otherwise the **joined plan**: ``Dataset.join``
       pairs⋈texts twice, stateless verify.
    """
    import ray as _ray
    import ray.data as _rd

    banded = ds.select_columns([id_col, text_col]).map_batches(
        band_emit_batch_arrow,
        fn_kwargs={
            "id_col": id_col, "text_col": text_col, "bands": bands,
            "num_perm": num_perm, "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        batch_size=4096,  # see near_dup_candidate_count: 2.6x vs block-sized
    )
    from aws_medallion_datalake_ray.functions.blocks import rebundle

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    nparts_pairs = max(8, 4 * ncpu)

    def _tag_bucket_part(t: pa.Table) -> pa.Table:
        part = (
            t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(nparts_pairs)
        ).astype(np.int32)
        return t.append_column(_PART, pa.array(part))

    pairs = (
        # (id, bucket) rows are ~16-24 B: rebundle so the partition shuffle's
        # pieces stream through plasma, not the driver heap (blocks.py).
        # Group key = bucket-hash PARTITION (P = O(CPUs) groups), not the
        # bucket: per-bucket pandas groups cost ~1 ms each and a collision-
        # rich corpus has millions of buckets (see _bucket_pairs_fn)
        rebundle(banded).map_batches(_tag_bucket_part, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(_bucket_pairs_fn(id_col, max_bucket), batch_format="pandas")
    )
    pairs = exact_dedup(pairs, ("id_a", "id_b"),
                        rebundle_narrow=True).materialize()

    def _ids_of(t: pa.Table) -> pa.Table:
        ca, cb = t["id_a"], t["id_b"]
        chunks = list(ca.chunks) + list(cb.chunks)
        return pa.table({"cid": pa.chunked_array(chunks, type=ca.type)})

    ids_ds = exact_dedup(
        pairs.map_batches(_ids_of, batch_format="pyarrow"), ("cid",),
        rebundle_narrow=True,
    ).materialize()
    n_cand = ids_ds.count()
    if n_cand == 0:
        # empty-result schema keeps the INPUT id type (ids may be strings —
        # dedup_near joins key tuples into string ids)
        id_type = ds.schema().base_schema.field(id_col).type
        return _rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    if n_cand <= id_broadcast_threshold:
        cand_ids = np.array(sorted(ids_ds.unique("cid")))
        ids_ref = _ray.put(cand_ids)

        def _semi_ids(t: pa.Table, ref=ids_ref) -> pa.Table:
            keys = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            v = np.asarray(t[id_col].to_pandas())
            idx = np.clip(np.searchsorted(keys, v), 0, len(keys) - 1)
            return t.filter(pa.array(keys[idx] == v))

        cand_texts = ds.select_columns([id_col, text_col]).map_batches(
            _semi_ids, batch_format="pyarrow"
        )
    else:
        # distributed semi-join: the distinct candidate ids STAY a Dataset
        nparts_ids = max(2, ncpu // 2)
        cand_texts = ds.select_columns([id_col, text_col]).join(
            ids_ds, join_type="inner", num_partitions=nparts_ids,
            on=(id_col,), right_on=("cid",),
        ).map_batches(
            lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
        )
    cand_texts = cand_texts.materialize()
    cand_bytes = cand_texts.size_bytes() or 0

    use_broadcast = (
        n_cand <= broadcast_threshold and cand_bytes <= broadcast_bytes_budget
    )
    LAST_VERIFY_PLAN.clear()
    LAST_VERIFY_PLAN.update(
        plan="broadcast" if use_broadcast else "joined",
        candidates=int(n_cand),
        candidate_bytes=int(cand_bytes),
    )
    if use_broadcast:
        texts: dict = {}
        for b in cand_texts.iter_batches(batch_size=8192, batch_format="pyarrow"):
            texts.update(zip(b[id_col].to_pylist(), b[text_col].to_pylist()))
        texts_ref = _ray.put(texts)
        verified = pairs.map_batches(
            PairVerifier,
            fn_constructor_kwargs={"texts_ref": texts_ref, "shingle_k": shingle_k},
            batch_format="pyarrow",
            # block-sized batches build block-sized shingle buffers (the
            # _batch_jaccard flatten is O(batch total shingles)) and starve
            # the pool's load balancing; 4096 pairs bounds both
            batch_size=4096,
            concurrency=concurrency,
        )
    else:
        # join aggregators are actors: more partitions than CPUs deadlocks a
        # small cluster (each aggregator waits for a core), so size to ~half
        # the CPUs — at 256 nodes this still gives hundreds of partitions
        nparts = max(2, ncpu // 2)
        ta = cand_texts.map_batches(
            lambda t: t.rename_columns(["id_a", "text_a"]), batch_format="pyarrow"
        )
        tb = cand_texts.map_batches(
            lambda t: t.rename_columns(["id_b", "text_b"]), batch_format="pyarrow"
        )
        # pairs x texts inflates each pair row by BOTH docs' text — a dense
        # corpus (tens of millions of verified-candidate pairs) makes the
        # hash-join aggregators hold pair_count/nparts x 2 x avg_text bytes
        # EACH (measured: 6 GB/aggregator -> node OOM at 9.7M docs).  Cap
        # per-aggregator memory by verifying in sequential pair CHUNKS
        # (stable-hash split of the pair set): each chunk's join holds a
        # bounded slice, verified narrow rows materialize, texts stream
        # again next chunk — trading re-shuffles of the (materialized)
        # candidate texts for O(1) memory at any pair density
        n_pairs = pairs.count()
        avg_text = cand_bytes / max(1, n_cand)
        est_joined = n_pairs * (2.0 * avg_text + 96.0)
        # floor each chunk at verify_chunk_min_pairs: Ray 2.49's hash join
        # errors when a join partition's left side is built ONLY from 0-row
        # blocks (schema-less empty table into Acero) — a shape only near-
        # empty chunks can produce; healthy chunks populate every partition
        n_chunks = max(1, min(
            int(np.ceil(est_joined / (nparts * verify_chunk_bytes))),
            int(n_pairs // max(1, verify_chunk_min_pairs)) or 1,
        ))
        LAST_VERIFY_PLAN.update(pairs=int(n_pairs), chunks=int(n_chunks))

        def _chunk_fn(ci: int, nc: int):
            def fn(t: pa.Table) -> pa.Table:
                from aws_medallion_datalake_ray.functions.hashing import hash_cols

                h = hash_cols(t["id_a"], t["id_b"])
                return t.filter(pa.array((h % np.uint64(nc)) == np.uint64(ci)))

            return fn

        chunks_out = []
        for ci in range(n_chunks):
            if n_chunks == 1:
                chunk = pairs
            else:
                # materialize the narrow (id_a, id_b) slice: an all-filtered
                # chunk otherwise reaches the join schema-less (Acero errors
                # on the missing key field), and skipping empties is free
                chunk = pairs.map_batches(
                    _chunk_fn(ci, n_chunks), batch_format="pyarrow"
                ).materialize()
                if chunk.count() == 0:
                    continue
            joined = chunk.join(ta, join_type="inner", num_partitions=nparts,
                                on=("id_a",))
            joined = joined.join(tb, join_type="inner", num_partitions=nparts,
                                 on=("id_b",))
            out = joined.map_batches(
                _verify_pairs_texts,
                fn_kwargs={"shingle_k": shingle_k},
                batch_format="pyarrow",
            ).filter(expr=f"jaccard >= {threshold}")
            chunks_out.append(out.materialize() if n_chunks > 1 else out)
        if not chunks_out:  # every chunk filtered empty
            id_type = pairs.schema().base_schema.field("id_a").type
            return _rd.from_arrow(pa.table({
                "id_a": pa.array([], id_type),
                "id_b": pa.array([], id_type),
                "jaccard": pa.array([], pa.float64()),
            }))
        if len(chunks_out) == 1:
            return chunks_out[0]
        return chunks_out[0].union(*chunks_out[1:])
    return verified.filter(expr=f"jaccard >= {threshold}")


def _local_verify_part_fn(id_col: str, text_col: str, max_bucket: int,
                          shingle_k: int, threshold: float,
                          compressed: bool = False):
    """Bucket-local candidate generation AND exact verify for one bucket-hash
    partition: texts ride the banding shuffle, so every bucket's documents
    are co-resident — pairs are generated positionally (same triu/dual-chain
    semantics as :func:`_bucket_pairs_fn`) and verified immediately against a
    per-partition shingle cache.  Only narrow verified (id_a, id_b, jaccard)
    rows leave the task; no candidate-id distinct, no text semi-join, no
    pairs x texts join ever materializes."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_a": g[id_col].to_numpy()[:0],
            "id_b": g[id_col].to_numpy()[:0],
            "jaccard": np.empty(0, np.float64),
        })
        b = g["bucket"].to_numpy()
        ids = g[id_col].to_numpy()
        txts = g[text_col].to_numpy()
        sig0 = (g["sig0"].to_numpy() if "sig0" in g.columns
                else np.zeros(len(g), np.int64))
        order = np.lexsort((ids, b))
        b, ids, txts, sig0 = b[order], ids[order], txts[order], sig0[order]
        keep = np.ones(len(b), bool)  # drop (bucket, id) duplicates
        keep[1:] = (b[1:] != b[:-1]) | (ids[1:] != ids[:-1])
        b, ids, txts, sig0 = b[keep], ids[keep], txts[keep], sig0[keep]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]

        pos_a: list = []
        pos_b: list = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            m = e - s
            if m < 2:
                continue
            if m <= max_bucket:
                ia, ib = np.triu_indices(m, k=1)
                pos_a.append(s + ia)
                pos_b.append(s + ib)
            else:
                # triple-ordering chains (see _bucket_pairs_fn): positions
                # are id-ascending within the run, so min/max position ==
                # min/max id; the sig0 chain keeps near-dups adjacent under
                # arbitrary id orders (digests)
                u = ids[s:e]
                perm = np.argsort(
                    pd.util.hash_pandas_object(
                        pd.Series(u), index=False).to_numpy(),
                    kind="stable",
                )
                sperm = np.lexsort((u, sig0[s:e]))
                q1, q2 = perm[:-1], perm[1:]
                r1, r2 = sperm[:-1], sperm[1:]
                ca = np.concatenate([np.arange(m - 1), np.minimum(q1, q2),
                                     np.minimum(r1, r2)])
                cb = np.concatenate([np.arange(1, m), np.maximum(q1, q2),
                                     np.maximum(r1, r2)])
                uniq = np.unique(ca.astype(np.int64) * np.int64(m) + cb)
                pos_a.append(s + (uniq // m))
                pos_b.append(s + (uniq % m))
        if not pos_a:
            return empty
        pa_idx = np.concatenate(pos_a)
        pb_idx = np.concatenate(pos_b)

        cache: dict = {}

        def sh(i: int):
            key = ids[i]
            s_ = cache.get(key)
            if s_ is None:
                txt = txts[i]
                if compressed:
                    import zlib

                    txt = zlib.decompress(txt).decode("utf-8")
                s_ = shingle_hashes64(txt, shingle_k)
                cache[key] = s_
            return s_

        out_a: list = []
        out_b: list = []
        out_j: list = []
        CHUNK = 200_000  # bound the per-slice shingle list
        for c0 in range(0, len(pa_idx), CHUNK):
            sl_a = pa_idx[c0:c0 + CHUNK]
            sl_b = pb_idx[c0:c0 + CHUNK]
            sims = _batch_jaccard([sh(i) for i in sl_a.tolist()],
                                  [sh(i) for i in sl_b.tolist()])
            hit = sims >= threshold
            out_a.append(ids[sl_a[hit]])
            out_b.append(ids[sl_b[hit]])
            out_j.append(sims[hit])
        return pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "jaccard": np.concatenate(out_j),
        })

    return fn


def near_dup_pairs_local(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 512,
    num_partitions: int | None = None,
    compress_payload: bool = True,
):
    """MinHash+LSH near-duplicate pairs with BUCKET-LOCAL verification — the
    dense-corpus dual of :func:`near_dup_pairs`.

    The joined verify plan shuffles candidate texts into a pairs x texts
    hash join; when the corpus is collision-rich (template clones, version
    chains — tens of millions of true candidate pairs), that join's
    aggregators hold pair_count/partitions x 2 x text bytes each and OOM
    long before the work is unreasonable (measured at 9.7M docs / ~80M
    candidates on a 128 GB node).  Here the TEXT rides the banding shuffle
    instead (one all-to-all of bands x corpus bytes), every bucket's docs
    land co-resident in a bucket-hash partition, and each partition
    generates AND verifies its pairs locally against a per-task shingle
    cache — memory is O(partition), independent of pair density, and only
    narrow verified rows shuffle again (the cross-band pair dedup).

    Tradeoffs vs the joined plan (pick by corpus): text moves bands x once
    (vs once for the candidate semi-join), so the SPARSE-corpus cost is
    higher; the DENSE-corpus cost is bounded where the join plan's is
    quadratic in density.  Identical output (same candidates, same exact
    Jaccard) — plan equality is pytest-gated.
    """
    import ray as _ray

    from aws_medallion_datalake_ray.functions.blocks import rebundle

    ncpu = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    nparts = num_partitions or max(16, 8 * ncpu)

    banded = ds.select_columns([id_col, text_col]).map_batches(
        band_emit_batch_arrow,
        fn_kwargs={
            "id_col": id_col, "text_col": text_col, "bands": bands,
            "num_perm": num_perm, "shingle_k": shingle_k, "with_text": True,
            # the payload crosses the shuffle bands x: zlib (level 1, C
            # speed) compresses template-heavy corpora ~4x — the shuffle
            # is disk/network bound, the codec rides idle map-worker CPU
            "compress_text": compress_payload,
        },
        batch_format="pyarrow",
        batch_size=4096,
    )
    payload_col = "__ztext" if compress_payload else text_col

    def _tag(t: pa.Table) -> pa.Table:
        part = (
            t["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(nparts)
        ).astype(np.int32)
        return t.append_column(_PART, pa.array(part))

    verified = (
        # rebundle BEFORE the partition shuffle: hundreds of banding output
        # blocks x nparts reduce partitions = 10^5+ shuffle pieces whose
        # driver-side metadata alone measured ~4 GB of driver heap at 2.4M
        # docs; coalescing to O(CPUs) blocks caps pieces at blocks x nparts
        rebundle(banded).map_batches(_tag, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(
            _local_verify_part_fn(id_col, payload_col, max_bucket, shingle_k,
                                  threshold, compressed=compress_payload),
            batch_format="pandas",
        )
    )
    # a pair verifies once per shared band: distinct on (id_a, id_b) — the
    # jaccard is exact and identical across copies, so keep-any is stable
    return exact_dedup(verified, ("id_a", "id_b"), rebundle_narrow=True)


def minhash_near_dups(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 512,
) -> pa.Table:
    """Materialized (small-result) wrapper over :func:`near_dup_pairs` —
    returns a sorted Arrow table of verified (id_a, id_b, jaccard)."""
    out = near_dup_pairs(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, threshold=threshold, max_bucket=max_bucket,
    )
    df = out.to_pandas()
    if df.empty:
        id_type = ds.schema().base_schema.field(id_col).type
        return pa.table(
            {
                "id_a": pa.array([], id_type),
                "id_b": pa.array([], id_type),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    df["jaccard"] = df["jaccard"].astype(float)
    return pa.Table.from_pandas(
        df.sort_values(["id_a", "id_b"]).reset_index(drop=True), preserve_index=False
    )
