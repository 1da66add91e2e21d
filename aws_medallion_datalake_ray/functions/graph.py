"""Distributed connected components over an edge Dataset — duplicate-cluster
labeling for the dedup pipeline.

``near_dup_pairs`` emits PAIRS; turning pairs into *clusters* (one canonical
doc per group of mutual near-duplicates) is a connected-components problem:
A~B and B~C must land A, B, C in one cluster even though A~C was never
scored.  The reference has no graph op at all (its dedup is per-key
``dropDuplicates``, silver_digit_clean.py:96) — this is one of the
beyond-reference LLM-curation operators.

Two execution paths behind one API:

* **distributed** — the alternating large-star / small-star algorithm of
  Kiveris et al., *Connected Components in MapReduce and Beyond* (SoCC
  2014): each round is two ``groupby(node).map_groups`` shuffles over the
  EDGE SET only (never the corpus), converging in O(log^2 n) rounds to a
  forest of depth-1 stars rooted at each component's minimum id.  Per-round
  state is the edge Dataset itself, materialized between rounds to cut
  lineage (an iterative algorithm must checkpoint its frontier — the edge
  set is bounded by the input pair count, not the corpus).
* **local** — a union-find with path halving on the driver, used when the
  edge count fits ``local_threshold``.  This is the broadcast-small-side
  discipline: a few thousand dup pairs do not need five shuffles.

``mode="auto"`` picks local below the threshold and distributed above; both
paths produce identical (node, component) assignments and are cross-checked
in ``tests/test_graph.py`` on random graphs, paths (worst-case diameter),
and multi-component inputs.

Scale notes for the distributed path: group size during a round is bounded
by a node's current degree; at convergence the root's group holds its whole
component, so a pathological giant component makes one large group — for
near-dup clusters (bounded by ``max_bucket`` upstream) this cannot happen.
Edge count never grows across rounds (Kiveris Lemma 1-2), and duplicate
edges produced by transient rounds are re-uniqued inside each group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _canon_fingerprint(t: pa.Table) -> pa.Table:
    """Per-batch commutative fingerprint of the canonicalized edge multiset:
    (count, wrap-around sum of mixed lo/hi) — order-independent, so the sum
    over batches is a stable digest of the edge set.  String ids hash via
    ``pandas.util.hash_array`` (fixed key — process-stable, like
    ``functions/hashing.py``)."""
    ua = t["u"].to_numpy(zero_copy_only=False)
    va = t["v"].to_numpy(zero_copy_only=False)
    if ua.dtype.kind in "iu":
        u, v = ua.astype(np.uint64), va.astype(np.uint64)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
    else:
        lo_o, hi_o = np.minimum(ua, va), np.maximum(ua, va)
        lo = pd.util.hash_array(lo_o.astype(object)).astype(np.uint64)
        hi = pd.util.hash_array(hi_o.astype(object)).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (lo * _MIX_A) ^ ((hi + _MIX_B) * _MIX_A)
        # additive (wraparound) digest only: addition is commutative AND
        # associative, so the cross-batch Sum is invariant to block layout
        s = np.uint64(0) if h.size == 0 else h.sum(dtype=np.uint64)
    return pa.table({"n": pa.array([len(ua)], pa.int64()),
                     "h": pa.array([int(s)], pa.uint64())})


def _fingerprint(edges) -> tuple[int, int]:
    agg = edges.map_batches(_canon_fingerprint, batch_format="pyarrow").sum(["n", "h"])
    if agg is None:  # empty dataset
        return (0, 0)
    return (int(agg["sum(n)"]), int(agg["sum(h)"]) & 0xFFFFFFFFFFFFFFFF)


def _both_directions(t: pa.Table) -> pa.Table:
    u, v = t["u"], t["v"]
    return pa.table({
        "u": pa.chunked_array(list(u.chunks) + list(v.chunks), type=u.type),
        "v": pa.chunked_array(list(v.chunks) + list(u.chunks), type=v.type),
    })


def _orient_max_first(t: pa.Table) -> pa.Table:
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    return pa.table({"u": np.maximum(u, v), "v": np.minimum(u, v)})


def _const_like(template: np.ndarray, value, n: int) -> np.ndarray:
    dt = template.dtype if template.dtype.kind in "iu" else object
    return np.full(n, value, dtype=dt)


def _large_star_group(g: pd.DataFrame) -> pd.DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    u = g["u"].iloc[0]
    nb = np.unique(g["v"].to_numpy())
    m = min(u, nb[0])
    big = nb[nb > u]
    return pd.DataFrame({"u": big, "v": _const_like(nb, m, len(big))})


def _small_star_group(g: pd.DataFrame) -> pd.DataFrame:
    """Edges oriented max→min: connect u and its smaller neighbors to the
    minimum of the neighborhood."""
    u = g["u"].iloc[0]
    nb = np.unique(g["v"].to_numpy())  # all < u after orientation
    m = nb[0]
    rest = np.concatenate([nb[1:], np.asarray([u], dtype=nb.dtype)])
    return pd.DataFrame({"u": rest, "v": _const_like(nb, m, len(rest))})


def _local_union_find(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Driver-side union-find with path halving (int64 or string ids)."""
    nodes = np.unique(np.concatenate([u, v]))
    idx = dict(zip(nodes.tolist(), range(len(nodes))))
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(u.tolist(), v.tolist()):
        ra, rb = find(idx[a]), find(idx[b])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # components labeled by the MINIMUM member id (nodes is sorted, so the
    # root with the smallest index is the smallest id)
    comp = nodes[[find(i) for i in range(len(nodes))]]
    return pa.table({"node": pa.array(nodes), "component": pa.array(comp)})


def connected_components(
    edges,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    mode: str = "auto",
    local_threshold: int = 2_000_000,
    max_rounds: int = 50,
):
    """Label every node of the undirected graph ``edges`` with its
    component's minimum node id.

    Parameters: ``edges`` is a ``ray.data.Dataset`` (or pyarrow Table) with
    id columns ``src``/``dst`` — integer (canonicalized to int64) or string
    (compared lexicographically; the dedup path's joined LakeTable keys);
    ``mode`` is ``"auto"`` (local union-find when the edge count fits
    ``local_threshold``, distributed star-contraction otherwise),
    ``"local"`` or ``"distributed"``.

    Returns a Dataset with columns ``node`` and ``component`` (= min id
    reachable from node, in the id type's order).  Nodes with no edges do
    not appear — singleton handling belongs to the caller, which knows the
    corpus.
    """
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)

    def _norm(t: pa.Table) -> pa.Table:
        id_type = (pa.int64() if pa.types.is_integer(t[src].type)
                   else pa.string())
        out = pa.table({"u": t[src].cast(id_type), "v": t[dst].cast(id_type)})
        mask = pa.compute.not_equal(out["u"], out["v"])  # drop self-loops
        return out.filter(mask)

    e = edges.select_columns([src, dst]).map_batches(_norm, batch_format="pyarrow")

    def _empty_result() -> "ray.data.Dataset":
        try:
            base = edges.schema().base_schema
            id_type = (pa.int64() if pa.types.is_integer(base.field(src).type)
                       else pa.string())
        except AttributeError:
            id_type = pa.int64()
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], id_type),
                      "component": pa.array([], id_type)}))

    if mode == "auto":
        n_edges = e.count()
        mode = "local" if n_edges <= local_threshold else "distributed"
    if mode == "local":
        parts = [pa.table({"u": b["u"], "v": b["v"]})
                 for b in e.iter_batches(batch_format="pyarrow", batch_size=None)]
        if not parts or sum(p.num_rows for p in parts) == 0:
            return _empty_result()
        t = pa.concat_tables(parts)
        return ray.data.from_arrow(_local_union_find(
            t["u"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False)))
    if mode != "distributed":
        raise ValueError(f"unknown mode {mode!r}")

    e = e.materialize()
    if e.count() == 0:
        return _empty_result()
    prev_fp = None
    for _round in range(max_rounds):
        # large-star: group on each endpoint (both directions)
        e = (
            e.map_batches(_both_directions, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_large_star_group, batch_format="pandas")
        )
        # small-star: orient max→min, group on the larger endpoint
        e = (
            e.map_batches(_orient_max_first, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_small_star_group, batch_format="pandas")
            .materialize()  # checkpoint the frontier: cut per-round lineage
        )
        fp = _fingerprint(e)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    # converged: e is a set of depth-1 stars (member → root).  Assignment =
    # members as-is plus one (root, root) row per distinct root.
    def _assign(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["u"], "component": t["v"]})

    members = e.map_batches(_assign, batch_format="pyarrow")

    def _roots(t: pa.Table) -> pa.Table:
        r = pa.compute.unique(t["component"].combine_chunks())
        return pa.table({"node": r, "component": r})

    from aws_medallion_datalake_ray.functions.dedup import exact_dedup

    roots = exact_dedup(
        members.map_batches(_roots, batch_format="pyarrow"), ("node",))
    # members may carry duplicate (node, comp) rows from the last transient
    # round; each node has exactly one root at convergence, so dedup on node
    members = exact_dedup(members, ("node",))
    return members.union(roots)
