"""`filter_by_keys` — the budgeted key-SET semi/anti join helper (round-5
VERDICT task #1): broadcast the sorted distinct key array only within a
count+byte budget; above it, co-partition via Dataset.join.  Both plans
must agree exactly, including NULL left keys (never members: semi drops,
anti keeps).

Reference analog: the star-schema consumption joins
(`sql/athena_gold_queries.sql:15-95`) — Athena plans these as broadcast
or distributed joins by side size; here the duality is explicit + tested.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from aws_medallion_datalake_ray.functions.joins import (
    LAST_FILTER_PLAN, filter_by_keys)


@pytest.fixture()
def left():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([0, 1, 2, 3, None, 5, 6, 7, 8, 9], pa.int64()),
        "v": pa.array(list("abcdefghij")),
    }))


KEYS = np.array([1, 3, 5, 7, 99])


def _ks(ds, col="k"):
    return sorted(r[col] for r in ds.take_all())


def test_semi_and_anti_broadcast(left):
    semi = filter_by_keys(left, "k", KEYS)
    assert _ks(semi) == [1, 3, 5, 7]
    assert LAST_FILTER_PLAN["plan"] == "broadcast"
    anti = filter_by_keys(left, "k", KEYS, anti=True)
    assert sorted(r["v"] for r in anti.take_all()) == \
        ["a", "c", "e", "g", "i", "j"]  # null k kept (NOT-EXISTS shape)


def test_joined_plan_forced_by_tiny_budget_agrees(left):
    semi = filter_by_keys(left, "k", KEYS, count_budget=1)
    assert LAST_FILTER_PLAN["plan"] == "joined"
    assert _ks(semi) == [1, 3, 5, 7]
    anti = filter_by_keys(left, "k", KEYS, anti=True, count_budget=1)
    assert LAST_FILTER_PLAN["plan"] == "joined"
    assert sorted(r["v"] for r in anti.take_all()) == \
        ["a", "c", "e", "g", "i", "j"]
    # byte budget alone also demotes
    filter_by_keys(left, "k", KEYS, bytes_budget=1).take_all()
    assert LAST_FILTER_PLAN["plan"] == "joined"


def test_dataset_keys_distincted_distributed(left):
    # non-distinct fact-key column with a DIFFERENT name, as a Dataset
    keys_ds = ray.data.from_arrow(pa.table(
        {"fk": pa.array([1, 1, 3, 3, 3, 99], pa.int64())}))
    semi = filter_by_keys(left, "k", keys_ds, right_col="fk")
    assert _ks(semi) == [1, 3]
    assert LAST_FILTER_PLAN["rows"] == 3  # distinct-ed before budgeting
    joined = filter_by_keys(left, "k", keys_ds, right_col="fk",
                            count_budget=1)
    assert LAST_FILTER_PLAN["plan"] == "joined"
    assert _ks(joined) == [1, 3]
    # schema (column set/order) identical across plans
    bc = filter_by_keys(left, "k", keys_ds, right_col="fk")
    assert bc.schema().names == joined.schema().names == ["k", "v"]


def test_string_keys_both_plans():
    ds = ray.data.from_arrow(pa.table({"s": ["x", "y", None, "z"],
                                       "n": [1, 2, 3, 4]}))
    for kw in ({}, {"count_budget": 0}):
        semi = filter_by_keys(ds, "s", ["y", "zz"], **kw)
        assert [r["n"] for r in semi.take_all()] == [2]
        anti = filter_by_keys(ds, "s", ["y", "zz"], anti=True, **kw)
        assert sorted(r["n"] for r in anti.take_all()) == [1, 3, 4]


def test_empty_key_set(left):
    assert filter_by_keys(left, "k", np.array([], np.int64)).count() == 0
    assert filter_by_keys(
        left, "k", np.array([], np.int64), anti=True).count() == 10
