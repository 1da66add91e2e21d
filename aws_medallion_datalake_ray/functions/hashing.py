"""Stable, vectorized 64-bit hashing for partitioning / salting / dedup keys.

Built on ``pandas.util.hash_array`` (SipHash-based, cython-vectorized, stable
for a fixed ``hash_key``) so we never loop Python rows in a hot stage.  Used
for:

- MERGE INTO partition keys — ``hash64(repo, path, commit) % P``.  Hashing the
  *full* key triple is the engine's built-in salting scheme for the
  Zipf-skewed ``repo`` column (a hot repo's rows scatter uniformly across
  partitions because path+commit vary); ``salted_partition`` below adds an
  explicit salt for operations keyed on ``repo`` alone.
- Z-order inputs — per-column hashes fed to the bit interleaver.
- Exact dedup — group keys for keep-first/keep-latest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "amdlray-stable16"  # exactly 16 bytes, fixed => stable across runs
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _as_object_array(col) -> np.ndarray:
    """Arrow/pandas/numpy column -> numpy array suitable for hash_array."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(col.type):
            return np.asarray(col.cast(pa.int64()).fill_null(np.int64(-(2**62))))
        # strings (incl. large_string) and everything else via object dtype
        return np.asarray(col.to_pandas(), dtype=object)
    if isinstance(col, pd.Series):
        col = col.to_numpy()
    arr = np.asarray(col)
    if arr.dtype.kind in ("i", "u", "f"):
        return arr
    return arr.astype(object)


def hash_col(col) -> np.ndarray:
    """64-bit stable hash of one column -> uint64 ndarray."""
    arr = _as_object_array(col)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def hash_cols(*cols) -> np.ndarray:
    """Combine per-column hashes into one uint64 key (order-sensitive mix)."""
    with np.errstate(over="ignore"):
        out = hash_col(cols[0])
        for c in cols[1:]:
            h = hash_col(c)
            out = out ^ (h + _MIX + (out << np.uint64(6)) + (out >> np.uint64(2)))
    return out


def hash_batch_cols(batch: pa.Table, cols: list[str] | tuple[str, ...]) -> np.ndarray:
    return hash_cols(*[batch[c] for c in cols])


_HASH_KEY2 = "amdlray-2nd-key!"  # independent 16-byte SipHash key


def hash_cols_alt(*cols) -> np.ndarray:
    """Second, independent 64-bit hash of the same columns (different SipHash
    key) — pairing it with :func:`hash_cols` gives ~128-bit identity for
    broadcast key-set membership without shipping the key strings."""
    with np.errstate(over="ignore"):
        out = pd.util.hash_array(_as_object_array(cols[0]),
                                 hash_key=_HASH_KEY2, categorize=False)
        for c in cols[1:]:
            h = pd.util.hash_array(_as_object_array(c),
                                   hash_key=_HASH_KEY2, categorize=False)
            out = out ^ (h + _MIX + (out << np.uint64(6)) + (out >> np.uint64(2)))
    return out


def hash_batch_cols_alt(batch: pa.Table, cols: list[str] | tuple[str, ...]) -> np.ndarray:
    return hash_cols_alt(*[batch[c] for c in cols])


def salted_partition(
    keys: np.ndarray, num_partitions: int, salt: np.ndarray | None = None
) -> np.ndarray:
    """Partition ids for uint64 keys, optionally salted.

    For skew-prone single-column keys (e.g. a Zipf ``repo``), pass a per-row
    ``salt`` (any uint64, e.g. ``hash_col(path)``): hot keys split into
    sub-partitions ``(key, salt % n_salts)`` and are re-merged by the caller
    after the per-partition work.
    """
    with np.errstate(over="ignore"):
        k = keys if salt is None else keys ^ (salt + _MIX)
    return (k % np.uint64(num_partitions)).astype(np.int64)


def flat_token_hashes(arr, min_tokens: int) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize an Arrow string array and hash every token,
    Arrow-native: ``utf8_trim_whitespace`` + ``utf8_split_whitespace``
    (C-speed, matches Python ``str.split()`` token-for-token), then
    ``dictionary_encode`` the flat tokens so the SipHash runs only over the
    DISTINCT tokens (Zipf corpora: 5-20× fewer hashes) and is gathered back
    by index.  Documents shorter than ``min_tokens`` are padded with the
    empty-string hash via one vectorized scatter.

    Returns ``(flat_hashes, counts)``: a contiguous uint64 array of per-doc
    token hashes (padded) and the per-doc (padded) token counts — the inputs
    every rolling-window kernel (minhash shingles, fingerprints) needs.
    """
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    split = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(arr))
    L = np.asarray(pc.list_value_length(split), dtype=np.int64)
    flat = split.flatten()
    if len(flat):
        dic = flat.dictionary_encode()
        dh = hash_col(dic.dictionary)
        th_real = dh[np.asarray(dic.indices)]
    else:
        th_real = np.array([], dtype=np.uint64)
    counts = np.maximum(L, min_tokens)
    if len(th_real) == int(counts.sum()):  # nothing to pad
        return th_real, counts
    empty_hash = hash_col(np.array([""], dtype=object))[0]
    th = np.full(int(counts.sum()), empty_hash, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    real_starts = np.concatenate([[0], np.cumsum(L)[:-1]])
    intra = np.arange(int(L.sum())) - np.repeat(np.cumsum(L) - L, L)
    th[np.repeat(starts, L) + intra] = th_real[np.repeat(real_starts, L) + intra]
    return th, counts


def rolling_token_windows(
    th: np.ndarray, counts: np.ndarray, k: int, base: np.uint64
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-polynomial hash of every k-token window that lies fully inside
    one document (``counts`` are per-doc token counts, all >= k).  Returns
    ``(window_hashes, doc_offsets)`` ready for ``ufunc.reduceat`` per doc."""
    n = len(th)
    with np.errstate(over="ignore"):
        sh = th[: n - k + 1].copy()
        for j in range(1, k):
            # in-place: fresh 8B*n temporaries per iteration cost more in
            # first-touch page faults than the arithmetic itself (measured
            # ~50x on this host: 1.4 s faulting vs 0.03 s warm for 2M rows)
            np.multiply(sh, base, out=sh)
            np.add(sh, th[j : n - k + 1 + j], out=sh)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_win = counts - k + 1
    widx = np.arange(int(n_win.sum())) - np.repeat(np.cumsum(n_win) - n_win, n_win)
    widx = widx + np.repeat(starts, n_win)
    return sh[widx], np.concatenate([[0], np.cumsum(n_win)[:-1]])


def sha256_col(col) -> np.ndarray:
    """Per-row sha256 hexdigest of a string column (the verification invariant).

    hashlib releases the GIL per call; with Ray this runs one batch per task
    so the Python loop here is bounded by batch_size, and sha256 itself is
    C-speed. Null -> empty-string digest of "" is NOT used; nulls map to None.
    """
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        vals = col.to_pandas()
    else:
        vals = pd.Series(col)
    out = np.empty(len(vals), dtype=object)
    for i, v in enumerate(vals):
        out[i] = None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest()
    return out


def md5_residue(keys, modulus: int) -> np.ndarray:
    """DuckDB-``md5_number_lower``-compatible residue per key: little-endian
    low half of md5(str(key)), mod ``modulus``.  md5 has no vectorized
    kernel, but it runs over the short KEY string only (never content) —
    same trade q41 documents: engine-portable determinism beats a per-batch
    loop of ~100ns digests."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(k).encode()).digest()[8:16], "little")
         % modulus for k in keys),
        np.int64, count=len(keys))


def stratified_sample(
    ds,
    group_col: str,
    key_col: str,
    rates_bp: dict,
    default_bp: int = 0,
):
    """Per-group deterministic sampling: keep a row iff its key's md5
    residue (basis points, exact integer thresholds — no float drift) falls
    below its group's rate.  The corpus-balancing step of LLM data curation
    (downsample over-represented languages/sources to target quotas),
    reproducible across reruns, re-shards, and engines.

    Embarrassingly parallel: one ``map_batches`` filter, no shuffle; the
    rate table is a constant kwarg.
    """
    import pandas as pd
    import pyarrow as pa

    def keep(t: pa.Table) -> pa.Table:
        res = md5_residue(t[key_col].to_pylist(), 10_000)
        bp = (
            pd.Series(t[group_col].to_pylist())
            .map(rates_bp).fillna(default_bp).to_numpy(np.int64)
        )
        return t.filter(pa.array(res < bp))

    return ds.map_batches(keep, batch_format="pyarrow")
