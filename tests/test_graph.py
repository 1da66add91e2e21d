"""Connected components: local union-find vs distributed star-contraction.

The two paths must agree exactly; the distributed path is exercised on the
worst-case shapes for label propagation (long paths) where naive min-label
flooding needs O(diameter) rounds but star contraction needs O(log^2 n).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from aws_medallion_datalake_ray.functions.graph import (
    _local_union_find,
    connected_components,
)


def _as_df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("node").reset_index(drop=True)


def _edges_table(pairs) -> pa.Table:
    return pa.table({
        "id_a": pa.array([a for a, _ in pairs], pa.int64()),
        "id_b": pa.array([b for _, b in pairs], pa.int64()),
    })


def _brute(pairs) -> pd.DataFrame:
    u = np.asarray([a for a, _ in pairs], dtype=np.int64)
    v = np.asarray([b for _, b in pairs], dtype=np.int64)
    return _local_union_find(u, v).to_pandas().sort_values("node").reset_index(drop=True)


def test_two_components_with_chain():
    # {1,2,3,9} chained (1-2, 2-3, 3-9) and {50, 51}; self-loop + dup ignored
    pairs = [(2, 1), (2, 3), (9, 3), (50, 51), (50, 51), (7, 7)]
    want = pd.DataFrame({
        "node": [1, 2, 3, 9, 50, 51],
        "component": [1, 1, 1, 1, 50, 50],
    })
    for mode in ("local", "distributed"):
        got = _as_df(connected_components(_edges_table(pairs), mode=mode))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_long_path_distributed():
    # a 64-node path: worst case for min-label flooding; star contraction
    # must still converge (O(log^2 n) rounds) and label everything node 0
    pairs = [(i, i + 1) for i in range(63)]
    got = _as_df(connected_components(_edges_table(pairs), mode="distributed"))
    assert list(got["node"]) == list(range(64))
    assert set(got["component"]) == {0}


@pytest.mark.parametrize("seed", [3, 11])
def test_random_graph_matches_union_find(seed):
    rng = np.random.default_rng(seed)
    ids = rng.choice(10_000, size=80, replace=False).astype(np.int64)
    pairs = [(int(ids[rng.integers(len(ids))]), int(ids[rng.integers(len(ids))]))
             for _ in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _brute(pairs)
    got = _as_df(connected_components(
        ray.data.from_arrow(_edges_table(pairs)), mode="distributed"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_auto_mode_threshold_routes():
    pairs = [(1, 2), (3, 4)]
    want = _brute(pairs)
    # below threshold -> local; forced tiny threshold -> distributed
    got_local = _as_df(connected_components(_edges_table(pairs), mode="auto"))
    got_dist = _as_df(connected_components(
        _edges_table(pairs), mode="auto", local_threshold=0))
    pd.testing.assert_frame_equal(got_local, want, check_dtype=False)
    pd.testing.assert_frame_equal(got_dist, want, check_dtype=False)


def test_empty_edges():
    for mode in ("local", "distributed"):
        out = connected_components(_edges_table([]), mode=mode)
        assert out.count() == 0
        # empty Dataset.to_pandas drops names; assert the typed Arrow schema
        assert out.schema().names == ["node", "component"]


def test_self_loops_only():
    out = connected_components(_edges_table([(5, 5), (6, 6)]), mode="local")
    assert out.count() == 0


def test_string_ids_both_paths():
    # lexicographic order: "a" < "b" < "z"; chain a-z, b-z
    pairs = [("z", "a"), ("b", "z"), ("m", "q")]
    t = pa.table({"id_a": pa.array([p[0] for p in pairs]),
                  "id_b": pa.array([p[1] for p in pairs])})
    want = pd.DataFrame({
        "node": ["a", "b", "m", "q", "z"],
        "component": ["a", "a", "m", "m", "a"],
    })
    for mode in ("local", "distributed"):
        got = _as_df(connected_components(t, mode=mode))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
