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

from aws_medallion_datalake_ray.functions.hashing import hash_col


def _top_bits(h: np.ndarray, bits: int) -> np.ndarray:
    """Keep the top ``bits`` bits of each uint64 (right-aligned)."""
    return (h >> np.uint64(64 - bits)).astype(np.uint64)


def interleave_bits(cols: list[np.ndarray], bits_per_dim: int | None = None) -> np.ndarray:
    """Interleave the bits of k uint64 arrays into one Z-value.

    bit layout (MSB first): c0[b-1], c1[b-1], ..., ck[b-1], c0[b-2], ...
    so sorting by the result is a Z-order (Morton) curve over the k dims.
    """
    k = len(cols)
    if bits_per_dim is None:
        bits_per_dim = 63 // k
    vals = [_top_bits(np.asarray(c, dtype=np.uint64), bits_per_dim) for c in cols]
    out = np.zeros(len(vals[0]), dtype=np.uint64)
    one = np.uint64(1)
    for bit in range(bits_per_dim - 1, -1, -1):
        for v in vals:
            out = (out << one) | ((v >> np.uint64(bit)) & one)
    return out


def zorder_key(columns, bits_per_dim: int | None = None) -> np.ndarray:
    """Z-order key from raw columns (hashed first so any dtype clusters).

    ``columns``: sequence of Arrow/pandas/numpy columns.
    """
    hashes = [hash_col(c) for c in columns]
    return interleave_bits(hashes, bits_per_dim)


def hilbert_key(columns, bits_per_dim: int = 10) -> np.ndarray:
    """Hilbert-curve key over k hashed columns (Skilling's transpose algorithm,
    vectorized across rows; loops only over k*bits, not rows).

    Better locality than Z-order (no long diagonal jumps); costlier to
    compute — O(k * bits) numpy passes.
    """
    k = len(columns)
    x = [ _top_bits(hash_col(c), bits_per_dim).astype(np.uint64) for c in columns ]
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
