"""Per-file Bloom filters for point-lookup file skipping.

Min/max stats prune RANGE predicates but are useless for ``==`` / ``in``
probes on high-cardinality columns whose per-file ranges overlap (a commit
hash, a user id: every file's [min,max] spans the whole domain).  Delta and
Iceberg solve this with per-file Bloom filters; this is the same public
construction (Bloom 1970; Kirsch-Mitzenmacher double hashing, 2006) sized
by the standard ``m = -n ln p / (ln 2)^2`` formula.

Engine integration (``LakeTable.build_blooms``): one Ray task per file
reads ONLY the indexed column, hashes it with the engine's stable SipHash
(`functions/hashing.hash_col` — the same hash probes the filter at plan
time, so build and probe can never drift), and ships back a bitset that
lives in the manifest under ``stats[col]["bloom"]``.  ``prune_files`` then
drops any file whose filter proves the probe value absent — no false
negatives by construction, false positives only cost a wasted read.

Scale shape: the bitset is O(rows_per_file) bits at a FIXED false-positive
rate (default 2% ≈ 8.1 bits/row — a 64 MB file of ~64k rows carries a
~65 KB filter), manifests stay proportional to file count, and the build
is embarrassingly parallel with nothing but (path, bitset) pairs crossing
the cluster.
"""

from __future__ import annotations

import base64
import math

import numpy as np

from aws_medallion_datalake_ray.functions.hashing import hash_col

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x + _MIX
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def bloom_params(n: int, fpp: float = 0.02) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n`` distinct values at false-positive rate
    ``fpp`` (standard formulas; m rounded up to a byte boundary)."""
    n = max(1, n)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing: pos_i = (h1 + i*h2) mod m."""
    h1 = hashes
    h2 = _splitmix64(hashes) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.int64)


def bloom_build(hashes: np.ndarray, m_bits: int, k: int) -> bytes:
    """Bitset with every hash's k positions set (vectorized, no Python loop
    over values)."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(hashes):
        pos = _positions(np.asarray(hashes, np.uint64).ravel(), m_bits, k)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits.tobytes()


def bloom_contains(bitset, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Per-hash membership (True = possibly present, False = PROVEN absent).
    ``bitset`` may be bytes or a uint8 ndarray (e.g. a zero-copy plasma
    view)."""
    hashes = np.asarray(hashes, np.uint64).ravel()
    if len(hashes) == 0:
        return np.zeros(0, bool)
    bits = (np.frombuffer(bitset, dtype=np.uint8)
            if isinstance(bitset, (bytes, bytearray, memoryview))
            else np.asarray(bitset, np.uint8))
    pos = _positions(hashes, m_bits, k)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & np.uint8(1)
    return hit.all(axis=0).astype(bool)


def bloom_encode(bitset: bytes, m_bits: int, k: int, n: int) -> dict:
    """Manifest-JSON form of one filter."""
    return {"m": int(m_bits), "k": int(k), "n": int(n),
            "b": base64.b64encode(bitset).decode("ascii")}


def value_hashes(values) -> np.ndarray:
    """Stable hashes for bloom build AND probe — one function so the two
    sides can never disagree.  Accepts an Arrow array/column, numpy array,
    list, or a single scalar.  Integer PROBE constants must take the same
    int64 path as Arrow integer COLUMNS — that includes OBJECT-dtype numpy
    arrays of python ints (e.g. a ``.to_numpy(dtype=object)`` key slice):
    SipHash of an object-dtype int differs from the int64-array hash, so
    every all-int input is routed through int64 (verified empirically)."""
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        return hash_col(values)
    if hasattr(values, "dtype") and not np.isscalar(values):
        arr = np.asarray(values)
        if arr.dtype != object:
            if arr.dtype.kind == "f":
                # Arrow FLOAT columns build through the object path
                # (`_as_object_array` casts non-int Arrow to object); a
                # native float64 probe would hash the raw bit view and
                # miss — route floats through object too (verified)
                return hash_col(arr.astype(object))
            return hash_col(arr)
        vals = list(arr)  # object ndarray: fall through to typed dispatch
    elif isinstance(values, (list, tuple, set, frozenset)):
        vals = sorted(values, key=str)
    else:
        vals = [values]
    if vals and all(
        isinstance(v, (int, np.integer)) and not isinstance(v, (bool, np.bool_))
        for v in vals
    ):
        return hash_col(np.array(vals, np.int64))
    return hash_col(np.array(vals, dtype=object))


def dataset_key_bloom(
    ds, col: str, n: int, fpp: float = 0.01,
    max_bytes: int = 512 * 1024 * 1024,
) -> tuple[np.ndarray, int, int] | None:
    """Bloom filter of a Dataset key column, built distributed: per-block
    partial bitsets (fixed ``m`` so OR is associative) stream back to the
    driver and fold incrementally — O(m) driver memory regardless of key
    count, O(keys x 8 B) worker compute.  Returns ``(bits, m, k)`` or None
    when ``n`` keys would need a filter over ``max_bytes`` (callers fall
    back to their unfiltered plan).

    This is the RUNTIME-FILTER (sideways-information-passing) build side:
    broadcast the bitset once and pre-filter the probe side of a semi/anti
    join so only bloom-positive rows (true matches + fpp) enter the
    shuffle."""
    from aws_medallion_datalake_ray.functions.blocks import rebundle

    m, k = bloom_params(max(1, int(n)), fpp)
    if m // 8 > max_bytes:
        return None
    import pyarrow as pa

    def block_bloom(t: pa.Table) -> pa.Table:
        b = bloom_build(value_hashes(t[col]), m, k)
        return pa.table({"b": pa.array([b], pa.large_binary())})

    bits = np.zeros(m // 8, np.uint8)
    parts = rebundle(ds.select_columns([col])).map_batches(
        block_bloom, batch_format="pyarrow")
    for bt in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in bt["b"]:
            bits |= np.frombuffer(buf.as_py(), np.uint8)
    return bits, m, k


def _coerce_probe(values, hint) -> tuple[list, bool]:
    """Map probe constants into the indexed column's value domain before
    hashing.  ``hint`` is a sample value of the column's NATIVE type (the
    file's min stat) — the build side hashed that domain, so a probe in a
    different numeric type (``5.0`` against an int64 column, ``5`` against
    a float column) hashes differently and would be a FALSE NEGATIVE.

    Returns ``(normalized_values, conservative)``.  ``conservative=True``
    means an element could not be mapped (type confusion, e.g. a string
    probe on a numeric column): the caller must keep the file.  Elements
    PROVABLY outside the domain (non-integral floats or None against an
    int column) are dropped — no stored value can equal them."""
    if isinstance(values, (list, tuple, set, frozenset)):
        vals = list(values)
    elif hasattr(values, "dtype") and not np.isscalar(values):
        arr = np.asarray(values).ravel()
        if hint is not None and arr.dtype != object:
            # vectorized fast path for typed probe arrays (the
            # `_files_for_first_keys` slices can hold up to probe_cap
            # values — no per-element Python loop there)
            hint_int = (isinstance(hint, (int, np.integer))
                        and not isinstance(hint, (bool, np.bool_)))
            k = arr.dtype.kind
            if k in ("i", "u"):
                if hint_int:
                    return arr, False
                if isinstance(hint, (float, np.floating)):
                    return arr.astype(np.float64), False
                return list(arr), True
            if k == "f":
                if isinstance(hint, (float, np.floating)):
                    return arr, False
                if hint_int:  # only integral finite floats can equal ints
                    m = np.isfinite(arr) & (arr == np.floor(arr))
                    return arr[m].astype(np.int64), False
                return list(arr), True
            if k in ("U", "S"):
                return (arr, False) if isinstance(hint, str) else (list(arr), True)
            return list(arr), True
        vals = list(arr)
    else:
        vals = [values]
    if hint is None:
        return vals, False
    is_bool = isinstance(hint, (bool, np.bool_))
    out: list = []
    if isinstance(hint, (int, np.integer)) and not is_bool:
        for v in vals:
            if isinstance(v, (bool, np.bool_)):
                return vals, True
            if isinstance(v, (int, np.integer)):
                out.append(int(v))
            elif isinstance(v, (float, np.floating)):
                if float(v).is_integer():
                    out.append(int(v))
                # else: no int equals a non-integral float -> drop
            elif v is None:
                pass  # NULL matches nothing under == / in
            else:
                return vals, True
        return out, False
    if isinstance(hint, (float, np.floating)):
        for v in vals:
            if isinstance(v, (bool, np.bool_)):
                return vals, True
            if isinstance(v, (int, np.integer, float, np.floating)):
                out.append(float(v))
            elif v is None:
                pass
            else:
                return vals, True
        return out, False
    if isinstance(hint, str):
        for v in vals:
            if isinstance(v, str):
                out.append(v)
            elif v is None:
                pass
            else:
                return vals, True
        return out, False
    return vals, True  # unknown column domain: never prune on the bloom


def bloom_may_contain_any(st_bloom: dict, values, hint=None) -> bool:
    """Probe a manifest-stored filter with one or more constants: False
    means NO probe value can be in the file (safe to skip).  Pass ``hint``
    (a native-typed sample of the column, e.g. its min stat) so numeric
    probe constants are cast into the column's hash domain first — on any
    type mismatch the answer falls back to True (keep the file)."""
    vals, conservative = _coerce_probe(values, hint)
    if conservative:
        return True
    if len(vals) == 0:
        return False  # every probe value is provably outside the domain
    bitset = base64.b64decode(st_bloom["b"])
    hits = bloom_contains(bitset, value_hashes(vals),
                          int(st_bloom["m"]), int(st_bloom["k"]))
    return bool(hits.any())
