"""HyperLogLog approximate-distinct: accuracy, exact mergeability, and the
Dataset aggregate plan."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols
from aws_medallion_datalake_ray.functions.sketches import (
    approx_distinct,
    hll_estimate,
    hll_merge,
    hll_update,
    hll_zero,
)


def _hashes(vals) -> np.ndarray:
    return hash_batch_cols(pa.table({"v": pa.array(vals)}), ("v",))


@pytest.mark.parametrize("n", [50, 1000, 50_000])
def test_hll_accuracy(n):
    est = hll_estimate(hll_update(hll_zero(), _hashes([f"v{i}" for i in range(n)])))
    assert abs(est - n) / n < 0.05, (n, est)


def test_hll_duplicates_do_not_inflate(ray_session):
    vals = [f"v{i % 500}" for i in range(20_000)]
    est = hll_estimate(hll_update(hll_zero(), _hashes(vals)))
    assert abs(est - 500) / 500 < 0.05


def test_hll_merge_equals_union():
    a = hll_update(hll_zero(), _hashes([f"a{i}" for i in range(3000)]))
    b = hll_update(hll_zero(), _hashes([f"b{i}" for i in range(3000)]))
    u = hll_update(hll_zero(), _hashes([f"a{i}" for i in range(3000)]
                                       + [f"b{i}" for i in range(3000)]))
    assert np.array_equal(hll_merge(a, b), u)  # register-max is EXACTLY union


def test_hll_bitlength_edge_values():
    # values near 2^63 are exactly where float log2 misreports bit positions
    from aws_medallion_datalake_ray.functions.sketches import _bit_length_u64

    v = np.array([0, 1, 2, (1 << 63) - 1, 1 << 63, (1 << 64) - 1], dtype=np.uint64)
    assert _bit_length_u64(v).tolist() == [0, 1, 2, 63, 64, 64]


def test_mg_guarantee_on_zipf(ray_session):
    """Every key with true freq > n/k must appear, with count within n/k of
    truth — checked on a skewed stream through the Dataset aggregate."""
    from aws_medallion_datalake_ray.functions.sketches import hot_keys

    rng = np.random.default_rng(5)
    z = rng.zipf(1.5, 30_000)
    vals = [f"repo-{v}" for v in np.minimum(z, 500)]
    ds = ray.data.from_arrow(pa.table({"repo": pa.array(vals)})).repartition(8)
    k = 32
    got = dict(hot_keys(ds, "repo", k=k))
    import collections

    exact = collections.Counter(vals)
    n = len(vals)
    for key, freq in exact.items():
        if freq > n // k:
            assert key in got, f"heavy hitter {key} ({freq}) missing"
            assert freq - n // k <= got[key] <= freq


def test_mg_merge_bounded_state():
    from aws_medallion_datalake_ray.functions.sketches import mg_merge

    a = {f"a{i}": i + 1 for i in range(40)}
    b = {f"b{i}": i + 1 for i in range(40)}
    m = mg_merge(a, b, 16)
    assert len(m) <= 16
    assert all(c > 0 for c in m.values())


def test_approx_distinct_dataset(ray_session):
    n = 20_000
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([f"key-{i % 7000}" for i in range(n)])})
    ).repartition(8)
    est = approx_distinct(ds, ("k",))
    assert abs(est - 7000) / 7000 < 0.03


def test_profile_dataset_one_pass(ray_session):
    """One-pass ANALYZE: exact rows/nulls/min/max, HLL ndv within 5%,
    Misra-Gries top-1 exact for a skewed column, across multiple blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from aws_medallion_datalake_ray.functions.sketches import profile_dataset

    rng = np.random.default_rng(4)
    n = 40_000
    ids = np.arange(n)
    cat = np.where(rng.random(n) < 0.55, "hot",
                   rng.integers(0, 500, n).astype(str))
    val = rng.integers(-100, 100, n).astype(float)
    val[::7] = np.nan  # nulls via NaN -> arrow null after from_pandas? keep explicit
    t = pa.table({
        "id": pa.array(ids),
        "cat": pa.array(cat.tolist()),
        "val": pa.array([None if i % 7 == 0 else float(v)
                         for i, v in enumerate(val)], pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    prof = profile_dataset(ds, ("id", "cat", "val"))
    assert prof["id"]["rows"] == n and prof["id"]["nulls"] == 0
    assert prof["id"]["min"] == 0 and prof["id"]["max"] == n - 1
    assert abs(prof["id"]["ndv"] - n) / n < 0.05
    assert prof["cat"]["top"][0][0] == "hot"  # MG guarantees the majority value
    assert prof["val"]["nulls"] == len([i for i in range(n) if i % 7 == 0])
    assert prof["val"]["null_frac"] > 0.14
    exact_cat = len(set(cat.tolist()))
    assert abs(prof["cat"]["ndv"] - exact_cat) / exact_cat < 0.05
