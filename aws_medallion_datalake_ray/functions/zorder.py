"""Z-order and Hilbert sort keys — bit-interleaved multi-column clustering.

The reference only has static Hive date partitioning (``bronze_digit.py:148``);
the engine's clustering op (BASELINE.json north_star) sorts the table by a
bit-interleaved key over ``(repo, lang, path)`` hashes so that a range shuffle
(``ds.sort``) co-locates rows that are close in *all* clustered dimensions,
and per-file min/max stats then prune multi-column predicates.

Everything here is vectorized numpy over uint64 arrays — no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _top_bits(h: np.ndarray, bits: int) -> np.ndarray:
    """Keep the top ``bits`` bits of each uint64 (right-aligned)."""
    return (h >> np.uint64(64 - bits)).astype(np.uint64)


def interleave_bits(
    cols: list[np.ndarray],
    bits_per_dim: "int | list[int] | None" = None,
    weights: "list[int] | None" = None,
) -> np.ndarray:
    """Interleave the bits of k uint64 arrays into one Z-value.

    Uniform default (MSB first): c0[b-1], c1[b-1], ..., ck[b-1], c0[b-2], ...
    — a Z-order (Morton) curve over the k dims.

    ``weights`` makes the allocation NON-UNIFORM: each round emits
    ``weights[i]`` bits of column i, so a selective leading column can own
    the top of the key.  ``weights=[bits0, 1, ..., 1]`` is leading-column-
    major: ALL of c0's bits first (equality predicates on c0 then map to ONE
    contiguous key range — no Morton fragmentation), remaining dims
    interleaved below.  ``bits_per_dim`` may be per-column; total must be
    <= 63.
    """
    k = len(cols)
    if bits_per_dim is None:
        bits_per_dim = 63 // k
    bits = [bits_per_dim] * k if isinstance(bits_per_dim, int) else list(bits_per_dim)
    if weights is None:
        weights = [1] * k
    vals = [_top_bits(np.asarray(c, dtype=np.uint64), b) for c, b in zip(cols, bits)]
    # bit-emission plan: round-robin, weights[i] bits of col i per round
    plan: list[tuple[int, int]] = []
    pos = [0] * k
    while any(pos[i] < bits[i] for i in range(k)):
        for i in range(k):
            for _ in range(weights[i]):
                if pos[i] < bits[i]:
                    plan.append((i, bits[i] - 1 - pos[i]))
                    pos[i] += 1
    out = np.zeros(len(vals[0]), dtype=np.uint64)
    one = np.uint64(1)
    for i, b in plan:
        out = (out << one) | ((vals[i] >> np.uint64(b)) & one)
    return out


def order_preserving_u64(col, bounds: tuple | None = None) -> np.ndarray:
    """Map a column to uint64 preserving its sort order (NOT a hash).

    Order preservation is what makes Z-order clustering useful: each output
    file then covers a narrow *value* range per dimension, so the manifest's
    min/max stats prune range/equality predicates.  Encodings:

    - strings with a **vocabulary** (``bounds`` = sorted ndarray of distinct
      values): RANK-encoded — rank * (2^64 / n) — so value distinctions live
      in the TOP bits regardless of shared substrings ("org0/repo12" vs
      "org0/repo13" differ at byte 9; byte encodings collapse them, ranks
      never do).  This is what makes equality pruning on a clustered dim
      actually drop files;
    - other strings: 8 bytes big-endian AFTER stripping the column's global
      common prefix (from ``bounds`` = (global_min, global_max) strings);
    - ints/floats: min/max-scaled to the full uint64 range (``bounds`` from
      manifest stats or a pre-pass; identity offset fallback without them).
    Nulls map to 0 (sort first).
    """
    import pandas as pd

    if isinstance(bounds, np.ndarray):  # sorted vocabulary -> rank encode
        if isinstance(col, (pa.Array, pa.ChunkedArray)):
            vals = col.to_pandas().fillna("").to_numpy(dtype=object)
        else:
            vals = pd.Series(col).fillna("").to_numpy(dtype=object)
        ranks = np.searchsorted(bounds, vals).astype(np.uint64)
        step = np.uint64((1 << 64) // max(2, len(bounds) + 1))
        with np.errstate(over="ignore"):
            return ranks * step

    def _encode_str(s: pd.Series) -> np.ndarray:
        skip = 0
        if bounds is not None and isinstance(bounds[0], str):
            lo, hi = bounds[0], bounds[1]
            while skip < min(len(lo), len(hi)) and lo[skip] == hi[skip]:
                skip += 1
        if skip:
            s = s.str.slice(skip)
        try:
            fixed = s.to_numpy(dtype=object).astype("S8")
        except UnicodeEncodeError:
            fixed = np.array([x.encode("utf-8")[:8] for x in s], dtype="S8")
        return np.frombuffer(fixed.tobytes(), dtype=">u8").astype(np.uint64)

    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return _encode_str(col.to_pandas().fillna(""))
        vals = np.asarray(col.to_pandas().fillna(0), dtype=np.float64)
    else:
        s = pd.Series(col)
        if s.dtype == object:
            return _encode_str(s.fillna(""))
        vals = s.fillna(0).to_numpy(dtype=np.float64)
    if bounds is not None and bounds[1] > bounds[0]:
        lo, hi = float(bounds[0]), float(bounds[1])
        frac = np.clip((vals - lo) / (hi - lo), 0.0, 1.0)
        return (frac * float((1 << 63) - 1)).astype(np.uint64) << np.uint64(1)
    with np.errstate(over="ignore"):
        return (vals.astype(np.int64).astype(np.uint64) + np.uint64(1 << 63))


def zorder_key(
    columns,
    bits_per_dim: "int | list[int] | None" = None,
    bounds: list | None = None,
    weights: "list[int] | None" = None,
) -> np.ndarray:
    """Z-order (Morton) key over order-preserving per-column encodings.

    ``columns``: sequence of Arrow/pandas/numpy columns; ``bounds``: optional
    per-column (min, max) for numeric scaling or sorted-vocab ndarray for
    rank encoding; ``weights``: non-uniform bit allocation (see
    :func:`interleave_bits`).
    """
    bounds = bounds or [None] * len(columns)
    keys = [order_preserving_u64(c, b) for c, b in zip(columns, bounds)]
    return interleave_bits(keys, bits_per_dim, weights=weights)


def hilbert_key(
    columns, bits_per_dim: int = 10, bounds: list | None = None,
    lead_bits: int | None = None,
) -> np.ndarray:
    """Hilbert-curve key over k order-preserving column encodings (Skilling's
    transpose algorithm, vectorized across rows; loops only over k*bits).

    Better locality than Z-order (no long diagonal jumps); costlier to
    compute — O(k * bits) numpy passes.

    ``lead_bits``: leading-column-major variant (parity with the Z-curve's
    ``weights`` trick).  The Hilbert transform itself requires EQUAL bits per
    dim (it walks a hypercube), so per-dim bit allocation is achieved by
    COMPOSITION instead: the lead column's rank owns the top ``lead_bits``
    bits of the key and the remaining dims are Hilbert-interleaved below —
    an equality predicate on the lead dim then maps to one contiguous key
    range (real file pruning) while the sub-key keeps Hilbert locality.
    """
    k = len(columns)
    if lead_bits and k > 1:
        bnds = list(bounds) if bounds else [None] * k
        lead = _top_bits(order_preserving_u64(columns[0], bnds[0]), lead_bits)
        sub_bits = min(bits_per_dim, max(1, (63 - lead_bits) // (k - 1)))
        sub = hilbert_key(columns[1:], sub_bits, bnds[1:])
        return (lead << np.uint64(sub_bits * (k - 1))) | sub
    bounds = bounds or [None] * k
    x = [
        _top_bits(order_preserving_u64(c, b), bits_per_dim).astype(np.uint64)
        for c, b in zip(columns, bounds)
    ]
    n = len(x[0])
    one = np.uint64(1)

    # Skilling: transpose-form Hilbert encode (in-place Gray-ish transform)
    m = np.uint64(1) << np.uint64(bits_per_dim - 1)
    q = m
    while q > one:
        p = q - one
        for i in range(k):
            mask = (x[i] & q) != 0
            # invert low bits of x[0] where bit set
            x[0] = np.where(mask, x[0] ^ p, x[0])
            # exchange low bits of x[0] and x[i] where bit unset
            t = (x[0] ^ x[i]) & p
            t = np.where(mask, np.uint64(0), t)
            x[0] ^= t
            x[i] ^= t
        q >>= one

    # Gray decode
    for i in range(1, k):
        x[i] ^= x[i - 1]
    t = np.zeros(n, dtype=np.uint64)
    q = m
    while q > one:
        t = np.where((x[k - 1] & q) != 0, t ^ (q - one), t)
        q >>= one
    for i in range(k):
        x[i] ^= t

    # interleave transposed coords into a single key (left-align first:
    # interleave_bits consumes the TOP bits_per_dim bits of each word)
    shift = np.uint64(64 - bits_per_dim)
    return interleave_bits([v << shift for v in x], bits_per_dim)
