"""Property-based tests (hypothesis) for the pure planning/encoding kernels."""

from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_medallion_datalake_ray.functions import cleaning as cl
from aws_medallion_datalake_ray.functions.zorder import order_preserving_u64, zorder_key
from aws_medallion_datalake_ray.state.manifest import DataFile
from aws_medallion_datalake_ray.state.table import plan_bins

sizes = st.lists(st.integers(min_value=1, max_value=200 * 1024 * 1024), min_size=0, max_size=60)


@given(sizes, st.integers(min_value=1024, max_value=128 * 1024 * 1024))
@settings(max_examples=60, deadline=None)
def test_plan_bins_invariants(file_sizes, target):
    files = [DataFile(path=f"f{i}", rows=1, bytes=b) for i, b in enumerate(file_sizes)]
    bins = plan_bins(files, target)
    seen = [m.path for b in bins for m in b]
    # no file appears twice; every bin stays within target; bins are worth it
    assert len(seen) == len(set(seen))
    for b in bins:
        assert sum(m.bytes for m in b) <= target
        assert len(b) >= 2
        assert all(m.bytes < int(target * 0.8) for m in b)


ascii_text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40)


@given(st.lists(ascii_text, min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_order_preserving_string_encoding(strings):
    """x <= y on the first 8 chars must imply enc(x) <= enc(y); full order is
    preserved whenever strings differ within the 8-byte window."""
    col = pa.array(strings, pa.string())
    enc = order_preserving_u64(col)
    for i, a in enumerate(strings):
        for j, b in enumerate(strings):
            if a[:8] < b[:8]:
                assert enc[i] < enc[j], (a, b)
            elif a[:8] == b[:8]:
                assert enc[i] == enc[j]


@given(st.lists(ascii_text, min_size=2, max_size=20))
@settings(max_examples=40, deadline=None)
def test_zorder_key_deterministic_and_equal_rows_collide(strings):
    col = pa.array(strings, pa.string())
    k1, k2 = zorder_key([col, col]), zorder_key([col, col])
    assert (k1 == k2).all()
    for i, a in enumerate(strings):
        for j, b in enumerate(strings):
            if a == b:
                assert k1[i] == k1[j]


@given(ascii_text)
@settings(max_examples=80, deadline=None)
def test_cleaning_kernels_idempotent(s):
    for fn in (cl.trim, cl.scrub_control_chars, cl.digits_only):
        once = fn(pa.array([s])).to_pylist()[0]
        twice = fn(pa.array([once])).to_pylist()[0]
        assert once == twice


counts_state = st.lists(
    st.tuples(st.integers(min_value=0, max_value=50), st.integers(min_value=1, max_value=5)),
    max_size=30,
)


@given(st.lists(counts_state, min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_bucket_count_merge_matches_counter_model(states):
    """The O(n) sorted-pair merge must agree with a Counter over any merge
    order (associativity/commutativity of the sketch)."""
    from aws_medallion_datalake_ray.functions.dedup import merge_count_states

    def to_state(pairs):
        c = Counter()
        for k, v in pairs:
            c[k] += v
        ks = np.array(sorted(c), dtype=np.int64)
        vs = np.array([c[k] for k in sorted(c)], dtype=np.int64)
        return (ks, vs)

    model = Counter()
    for pairs in states:
        for k, v in pairs:
            model[k] += v
    acc = (np.array([], np.int64), np.array([], np.int64))
    for pairs in states:
        acc = merge_count_states(acc, to_state(pairs))
    got = dict(zip(acc[0].tolist(), acc[1].tolist()))
    assert got == dict(model)
    # and in reversed merge order (commutativity of the sketch)
    acc2 = (np.array([], np.int64), np.array([], np.int64))
    for pairs in reversed(states):
        acc2 = merge_count_states(acc2, to_state(pairs))
    assert dict(zip(acc2[0].tolist(), acc2[1].tolist())) == dict(model)


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_checksum_partial_permutation_invariant(vals):
    """The per-batch checksum partial must not depend on row order or batch
    boundaries (multiset semantics)."""
    P1 = (1 << 31) - 1
    h = np.array(vals, dtype=np.uint64)
    s_all = int((h % np.uint64(P1)).sum(dtype=np.uint64)) % P1
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(h))
    hp = h[perm]
    cut = len(h) // 2
    s_split = (
        int((hp[:cut] % np.uint64(P1)).sum(dtype=np.uint64))
        + int((hp[cut:] % np.uint64(P1)).sum(dtype=np.uint64))
    ) % P1
    assert s_all == s_split
