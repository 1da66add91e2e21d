"""Distributed temporal joins Ray Data lacks natively: as-of join and
interval range join.

The reference has only equi-joins (SURVEY §2.4 — Glue/Athena `JOIN ... ON
key =`); these are the two non-equi shapes a training-data/event pipeline
needs (attribution "latest prior event", event-to-window banding) and are
named custom-operator targets in the build brief.

Scale shapes
------------
``asof_join``: one hash shuffle.  Both sides are tagged and co-partitioned
on ``hash(by) % P`` (P = O(cluster CPUs) — partition count is independent of
key cardinality, so billions of users hash into a bounded number of groups),
then each partition runs pandas ``merge_asof`` (vectorized C merge on the
sorted ``on`` column, grouped by ``by``).  Nothing reaches the driver.

``range_join_intervals``: zero shuffles for the join itself.  The interval
side of a range join is small in every real pipeline (windows, campaigns,
maintenance periods); it is broadcast once via ``ray.put`` and each batch is
matched with one vectorized mask per interval — O(batch × n_intervals) with
no per-row Python.  Documented limit: ``len(intervals)`` ≲ 10^4.

``range_join_banded``: the scale path when the interval side is itself big
data.  One hash shuffle on a BAND key (``value // band_width``): an interval
is fanned into every band it overlaps (≤ 2 bands when ``band_width`` is the
max interval length — the default, computed in one streaming pass), a row
lands in exactly ONE band, so every matching (row, interval) pair
materializes in exactly one group and no dedup pass is needed.  Neither side
ever reaches the driver.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols


def _ncpu() -> int:
    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: Sequence[str],
    direction: str = "backward",
    suffix: str = "_r",
    how: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distributed as-of join: for every left row, attach the nearest right
    row (per ``direction``) with the same ``by`` key and ``on`` value at or
    before (backward) / at or after (forward) the left row's ``on`` value.

    Right columns other than ``by``/``on`` are suffixed with ``suffix`` when
    the name collides with a left column; the right ``on`` column is always
    carried as ``on + suffix``.  ``how="inner"`` drops left rows with no
    match (the only mode with exact nullable-type round-tripping; "left"
    keeps them with nulls).

    Ties on the right ``on`` value resolve to the LAST row in ``(on, rest of
    right columns)`` sort order within the partition — callers needing a
    specific tie-break should pre-sort/dedup the right side (the query-suite
    user guarantees tie-free ``(by, on)``).

    Skew: all rows of one ``by`` key land in one partition (inherent to a
    per-key temporal join — the key's whole timeline must be co-located), so
    a key holding X% of the data bounds the stage at X% on one core.  The
    fix at that extreme is time-range sub-partitioning with boundary handoff
    (carry the last right row per key across range edges); not implemented —
    the fixture's keys are user-grained and near-uniform.
    """
    by = list(by)
    lcols = [f.name for f in left.schema().base_schema]
    rcols = [f.name for f in right.schema().base_schema]
    rvals = [c for c in rcols if c not in by and c != on]
    # suffix right names until unique vs the left side AND each other (a left
    # side that is itself an asof_join output already carries on+suffix)
    used = set(lcols)
    rmap: dict[str, str] = {}
    for c in [*rvals, on]:
        name = c + suffix if (c in lcols or c == on) else c
        while name in used:
            name += suffix
        rmap[c] = name
        used.add(name)
    on_r = rmap[on]
    P = num_partitions or max(8, 2 * _ncpu())

    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    out_fields = [lschema.field(c) for c in lcols] + [
        pa.field(rmap[c], rschema.field(c).type) for c in [*rvals, on]
    ]
    union_schema = pa.schema(
        [*out_fields, pa.field("__side", pa.int8()), pa.field("__part", pa.int64())]
    )

    def _tag(side: int, colmap: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            part = (hash_batch_cols(t, tuple(by)) % np.uint64(P)).astype(np.int64)
            arrays = []
            for f in union_schema:
                if f.name == "__side":
                    arrays.append(pa.array(np.full(len(t), side, np.int8)))
                elif f.name == "__part":
                    arrays.append(pa.array(part))
                elif f.name in colmap:
                    arrays.append(t[colmap[f.name]].cast(f.type))
                else:
                    arrays.append(pa.nulls(len(t), f.type))
            return pa.Table.from_arrays(arrays, schema=union_schema)

        return fn

    lmap = {c: c for c in lcols}
    rrev = {v: k for k, v in rmap.items()}
    rrev.update({c: c for c in by})
    tagged = left.map_batches(_tag(0, lmap), batch_format="pyarrow").union(
        right.map_batches(_tag(1, rrev), batch_format="pyarrow")
    )

    lout = [c for c in lcols]
    rout = [rmap[c] for c in [*rvals, on]]

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        l = l[lout].sort_values(on, kind="stable")
        r = r[[*by, *rout]].rename(columns={on_r: on})
        r = r.sort_values([on, *[c for c in rout if c != on_r]], kind="stable")
        # merge_asof keeps only the LEFT on column — carry the right one too
        r[on_r] = r[on]
        if len(l) == 0:
            return pd.DataFrame(columns=[*lout, *rout])
        m = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, suffixes=("", suffix)
        )
        if how == "inner":
            m = m.dropna(subset=[on_r])
        return m[[*lout, *rout]]

    out = tagged.groupby("__part").map_groups(_merge, batch_format="pandas")
    if how == "inner":
        # restore exact right-side types (pandas nullable round-trip)
        cast_schema = pa.schema(out_fields)

        def _cast(t: pa.Table) -> pa.Table:
            return t.select(cast_schema.names).cast(cast_schema)

        out = out.map_batches(_cast, batch_format="pyarrow")
    return out


def range_join_intervals(
    ds: "ray.data.Dataset",
    intervals: pa.Table,
    on: str,
    lo: str = "lo",
    hi: str = "hi",
    id_col: str = "interval_id",
    columns: Sequence[str] | None = None,
) -> "ray.data.Dataset":
    """Broadcast interval (band) join: emit one output row per (input row,
    interval) with ``lo <= row[on] < hi``.  Intervals MAY overlap — each row
    can match several — which is exactly what a single bucketing pass cannot
    express.

    ``intervals`` is a small driver-side Arrow table broadcast once with
    ``ray.put``; each batch is matched with one vectorized comparison per
    interval.  Output = selected ``columns`` (default all) + ``id_col``.
    """
    cols = list(columns) if columns is not None else None
    iv_ref = ray.put(
        {
            "id": np.asarray(intervals[id_col]),
            "lo": np.asarray(intervals[lo].cast(pa.int64())),
            "hi": np.asarray(intervals[hi].cast(pa.int64())),
        }
    )

    def _match(t: pa.Table, ref=iv_ref) -> pa.Table:
        iv = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        v = np.asarray(t[on].cast(pa.int64()))
        take_idx: list[np.ndarray] = []
        ids: list[np.ndarray] = []
        for k in range(len(iv["id"])):
            m = np.flatnonzero((v >= iv["lo"][k]) & (v < iv["hi"][k]))
            if len(m):
                take_idx.append(m)
                ids.append(np.full(len(m), iv["id"][k]))
        sel = t.select(cols) if cols is not None else t
        if not take_idx:
            return sel.slice(0, 0).append_column(
                id_col, pa.array([], type=pa.int64())
            )
        idx = np.concatenate(take_idx)
        out = sel.take(pa.array(idx))
        return out.append_column(
            id_col, pa.array(np.concatenate(ids).astype(np.int64))
        )

    return ds.map_batches(_match, batch_format="pyarrow")


def range_join_banded(
    ds: "ray.data.Dataset",
    intervals: "ray.data.Dataset | pa.Table",
    on: str,
    lo: str = "lo",
    hi: str = "hi",
    id_col: str = "interval_id",
    columns: Sequence[str] | None = None,
    band_width: int | None = None,
) -> "ray.data.Dataset":
    """Co-partitioned range join for LARGE interval sides (billions of
    intervals): emit one row per (input row, interval) with
    ``lo <= row[on] < hi``.  Same semantics as :func:`range_join_intervals`
    (null ``on`` values match nothing), different plan — both sides shuffle
    once on a band key instead of broadcasting the intervals.

    Banding: ``band = value // band_width``.  An interval is emitted into
    every band it overlaps; a row into exactly one band; a (row, interval)
    match therefore appears in exactly one group — no dedup.  With
    ``band_width=None`` the max interval length is measured in one streaming
    aggregate, capping the per-interval fan-out at 2 bands (fan-out is
    ``O(length / band_width + 1)`` for any explicit width).  Skew note: a
    band holding many intervals AND many rows does O(rows × intervals_in_band)
    vectorized comparisons per group — pick ``band_width`` near the typical
    interval length to keep bands sparse.
    """
    if isinstance(intervals, pa.Table):
        intervals = ray.data.from_arrow(intervals)
    cols = list(columns) if columns is not None else None

    def _iv_norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__iv_id": t[id_col].cast(pa.int64()),
                "__iv_lo": t[lo].cast(pa.int64()),
                "__iv_hi": t[hi].cast(pa.int64()),
            }
        )

    iv = intervals.map_batches(_iv_norm, batch_format="pyarrow")
    if band_width is None:
        # the max-length probe would otherwise re-execute the intervals
        # pipeline (it is consumed again by the union below) — pin it once
        iv = iv.materialize()
        mx = iv.map_batches(
            lambda t: pa.table(
                {
                    "mx": pa.array(
                        [
                            int(
                                np.max(
                                    np.asarray(t["__iv_hi"]) - np.asarray(t["__iv_lo"])
                                )
                            )
                            if len(t)
                            else 1
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        # an empty intervals dataset yields a column-less frame
        mx = mx["mx"].max() if "mx" in mx.columns else None
        band_width = max(1, int(mx)) if mx is not None and pd.notna(mx) else 1
    W = int(band_width)

    sel_schema = ds.schema().base_schema
    if cols is not None:
        sel_schema = pa.schema([sel_schema.field(c) for c in cols])
    out_cols = list(sel_schema.names)
    union_schema = pa.schema(
        [
            *sel_schema,
            pa.field("__iv_id", pa.int64()),
            pa.field("__iv_lo", pa.int64()),
            pa.field("__iv_hi", pa.int64()),
            pa.field("__v", pa.int64()),
            pa.field("__side", pa.int8()),
            pa.field("__band", pa.int64()),
        ]
    )

    def _tag_rows(t: pa.Table) -> pa.Table:
        on_i = t[on].cast(pa.int64())
        if on_i.null_count:  # null on-values match nothing (broadcast parity)
            t = t.filter(pc.is_valid(on_i))
            on_i = t[on].cast(pa.int64())
        v = np.asarray(on_i)
        arrays = []
        for f in union_schema:
            if f.name == "__side":
                arrays.append(pa.array(np.zeros(len(t), np.int8)))
            elif f.name == "__band":
                arrays.append(pa.array(v // W))
            elif f.name == "__v":
                arrays.append(pa.array(v))
            elif f.name in out_cols:
                arrays.append(t[f.name].cast(f.type))
            else:
                arrays.append(pa.nulls(len(t), f.type))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def _explode_intervals(t: pa.Table) -> pa.Table:
        ilo = np.asarray(t["__iv_lo"])
        ihi = np.asarray(t["__iv_hi"])
        iid = np.asarray(t["__iv_id"])
        live = ihi > ilo
        ilo, ihi, iid = ilo[live], ihi[live], iid[live]
        if len(iid) == 0:  # empty batch / all-degenerate (hi <= lo) intervals
            return pa.Table.from_arrays(
                [pa.array([], f.type) for f in union_schema], schema=union_schema
            )
        b0 = ilo // W
        b1 = (ihi - 1) // W  # hi is exclusive
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(iid)), reps)
        # band for each emitted copy: b0[i] + offset within the run
        off = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        bands = b0[idx] + off
        n = len(idx)
        arrays = []
        for f in union_schema:
            if f.name == "__side":
                arrays.append(pa.array(np.ones(n, np.int8)))
            elif f.name == "__band":
                arrays.append(pa.array(bands))
            elif f.name == "__iv_id":
                arrays.append(pa.array(iid[idx]))
            elif f.name == "__iv_lo":
                arrays.append(pa.array(ilo[idx]))
            elif f.name == "__iv_hi":
                arrays.append(pa.array(ihi[idx]))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    src = ds if cols is None else ds.select_columns([*dict.fromkeys([*cols, on])])
    tagged = src.map_batches(_tag_rows, batch_format="pyarrow").union(
        iv.map_batches(_explode_intervals, batch_format="pyarrow")
    )

    out_schema = pa.schema([*sel_schema, pa.field(id_col, pa.int64())])

    def _match_group(t: pa.Table) -> pa.Table:
        side = np.asarray(t["__side"])
        rows = t.filter(pa.array(side == 0))
        ivs = t.filter(pa.array(side == 1))
        empty = pa.Table.from_arrays(
            [pa.array([], f.type) for f in out_schema], schema=out_schema
        )
        if len(rows) == 0 or len(ivs) == 0:
            return empty
        v = np.asarray(rows["__v"])
        ilo = np.asarray(ivs["__iv_lo"])
        ihi = np.asarray(ivs["__iv_hi"])
        iid = np.asarray(ivs["__iv_id"])
        take_idx: list[np.ndarray] = []
        ids: list[np.ndarray] = []
        for k in range(len(iid)):
            m = np.flatnonzero((v >= ilo[k]) & (v < ihi[k]))
            if len(m):
                take_idx.append(m)
                ids.append(np.full(len(m), iid[k]))
        if not take_idx:
            return empty
        idx = np.concatenate(take_idx)
        out = rows.select(out_cols).take(pa.array(idx))
        out = out.append_column(
            id_col, pa.array(np.concatenate(ids).astype(np.int64))
        )
        return out.cast(out_schema)

    return tagged.groupby("__band").map_groups(
        _match_group, batch_format="pyarrow"
    )


# --------------------------------------------------------------- attach_lookup

# Default budgets for shipping a dim through the driver + object store.  The
# near-dup verifier established the discipline (dedup.py `near_dup_pairs`:
# threshold on COUNT and BYTES, never on faith); this is the query-side twin.
# 5M keys / 256 MiB ≈ a TPC-H customer dim up to ~SF3 — past that the lookup
# becomes a co-partitioned `Dataset.join` and nothing dim-sized ever crosses
# the driver heap.
BROADCAST_COUNT_BUDGET = 5_000_000
BROADCAST_BYTES_BUDGET = 256 * 1024 * 1024

#: introspection for tests/VERDICT: plan chosen by the most recent
#: :func:`attach_lookup` call (same convention as dedup.LAST_VERIFY_PLAN).
LAST_LOOKUP_PLAN: dict = {}

# per-worker cache of built lookup indexes, keyed by ObjectRef hex: the hash
# index builds ONCE per worker process, not once per batch (stateless-task
# analog of actor __init__ state; same pattern as text.py's per-worker
# pattern cache).  Tiny LRU — a worker touches O(1) dims per query.
_LOOKUP_CACHE: "dict[str, tuple[pd.Index, dict]]" = {}


def _lookup_state(ref, right_key: str, val_cols: tuple) -> tuple:
    key = ref.hex() if hasattr(ref, "hex") else str(id(ref))
    st = _LOOKUP_CACHE.get(key)
    if st is None:
        small: pa.Table = ray.get(ref)
        idx = pd.Index(small[right_key].to_pandas())
        vals = {c: small[c].combine_chunks() for c in val_cols}
        if len(_LOOKUP_CACHE) >= 4:
            _LOOKUP_CACHE.pop(next(iter(_LOOKUP_CACHE)))
        st = (idx, vals)
        _LOOKUP_CACHE[key] = st
    return st


def _attach_broadcast(
    t: pa.Table, *, ref, left_key: str, right_key: str, val_cols: tuple
) -> pa.Table:
    idx, vals = _lookup_state(ref, right_key, val_cols)
    pos = idx.get_indexer(t[left_key].to_pandas())
    take = pa.array(pos, pa.int64(), mask=pos < 0)  # miss -> null (left join)
    for c in val_cols:
        t = t.append_column(c, pc.take(vals[c], take))
    return t


def attach_lookup(
    ds: "ray.data.Dataset",
    small: "pa.Table | ray.data.Dataset",
    left_key: str,
    right_key: str | None = None,
    *,
    count_budget: int | None = None,
    bytes_budget: int | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Attach the value columns of a small keyed table to ``ds`` (LEFT-join
    semantics: unmatched rows keep nulls) — the budgeted broadcast join every
    star query shares.

    Plan selection mirrors the near-dup verifier's discipline: broadcast via
    ``ray.put`` only while the small side fits BOTH a row-count and a byte
    budget; otherwise fall back to a co-partitioned ``Dataset.join`` so a
    dim that grows with SF (TPC-H customer: 150k rows/SF) never rides
    through the driver heap.  The chosen plan is recorded in
    :data:`LAST_LOOKUP_PLAN`.

    The broadcast arm ships ONE Arrow table to the object store; each worker
    builds its hash index once per process (not per batch) and every batch
    lookup is a vectorized ``pd.Index.get_indexer`` + Arrow ``take`` — no
    Python-per-row, no whole-batch pandas conversion.
    """
    count_budget = BROADCAST_COUNT_BUDGET if count_budget is None else count_budget
    bytes_budget = BROADCAST_BYTES_BUDGET if bytes_budget is None else bytes_budget
    right_key = left_key if right_key is None else right_key

    if isinstance(small, pa.Table):
        n, nbytes = len(small), small.nbytes
        small_tab, small_ds = small, None
    else:
        small_ds = small.materialize()
        n, nbytes = small_ds.count(), (small_ds.size_bytes() or 0)
        small_tab = None

    use_broadcast = n <= count_budget and nbytes <= bytes_budget
    LAST_LOOKUP_PLAN.clear()
    LAST_LOOKUP_PLAN.update(
        plan="broadcast" if use_broadcast else "joined",
        rows=int(n), bytes=int(nbytes),
    )

    if use_broadcast:
        if small_tab is None:
            small_tab = pa.concat_tables(
                small_ds.iter_batches(batch_format="pyarrow", batch_size=None)
            ) if n else small_ds.schema().empty_table()
        val_cols = tuple(c for c in small_tab.column_names if c != right_key)
        ref = ray.put(small_tab.combine_chunks())
        return ds.map_batches(
            _attach_broadcast,
            fn_kwargs={"ref": ref, "left_key": left_key,
                       "right_key": right_key, "val_cols": val_cols},
            batch_format="pyarrow",
        )

    if small_ds is None:
        small_ds = ray.data.from_arrow(small_tab)
    # aggregator actors each need a core: more partitions than CPUs
    # deadlocks a small cluster (same sizing note as dedup's joined arm)
    nparts = num_partitions or max(2, _ncpu() // 2)
    kw = {} if right_key == left_key else {"right_on": (right_key,)}
    return ds.join(
        small_ds, join_type="left_outer", num_partitions=nparts,
        on=(left_key,), **kw,
    )


LAST_FILTER_PLAN: dict = {}


def _keyset_member_mask(t: pa.Table, *, ref, col: str) -> np.ndarray:
    """Vectorized membership of ``t[col]`` in the broadcast sorted key array
    (zero-copy plasma fetch, searchsorted — no Python per row).  NULL keys
    are never members."""
    ks = ray.get(ref)
    arr = t[col]
    nn = ~pc.is_null(arr).to_numpy(zero_copy_only=False)
    hit = np.zeros(len(t), bool)
    if nn.any() and len(ks):
        v = arr.to_numpy(zero_copy_only=False)[nn]
        idx = np.clip(np.searchsorted(ks, v), 0, len(ks) - 1)
        hit[nn] = ks[idx] == v
    return hit


def _semi_filter_batch(t: pa.Table, *, ref, col: str, anti: bool) -> pa.Table:
    hit = _keyset_member_mask(t, ref=ref, col=col)
    return t.filter(pa.array(~hit if anti else hit))


def filter_by_keys(
    ds: "ray.data.Dataset",
    col: str,
    keys: "np.ndarray | list | pa.Array | pa.Table | ray.data.Dataset",
    *,
    right_col: str | None = None,
    anti: bool = False,
    count_budget: int | None = None,
    bytes_budget: int | None = None,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Budgeted SEMI (``anti=False``) / ANTI (``anti=True``) join of ``ds``
    against a key SET — the key-set dual of :func:`attach_lookup` and the
    query-side twin of ``LakeTable.delete_keys``'s broadcast/partitioned
    duality.

    ``keys`` may be a driver array/list (already-small sets), an Arrow
    array/table, or a (possibly non-distinct) single-column ``Dataset``
    (e.g. a fact table's foreign-key column — it is distinct-ed
    DISTRIBUTED, so the raw column never reaches the driver).

    Plan selection: broadcast the sorted distinct key array via ``ray.put``
    only while it fits BOTH a row-count and a byte budget (each batch then
    filters with one vectorized searchsorted — no shuffle); otherwise
    co-partition via ``Dataset.join`` (left-outer against a marked distinct
    key set; semi keeps marker hits, anti keeps misses) so a key set that
    grows with SF never materializes on the driver.  The chosen plan is
    recorded in :data:`LAST_FILTER_PLAN`.

    NULL ``ds[col]`` values are never members: semi drops them, anti keeps
    them (NOT-EXISTS shape) — identically in both arms.
    """
    count_budget = BROADCAST_COUNT_BUDGET if count_budget is None else count_budget
    bytes_budget = BROADCAST_BYTES_BUDGET if bytes_budget is None else bytes_budget

    KEY, HIT = "__kf_key", "__kf_hit"
    keys_ds = None
    arr = None
    if isinstance(keys, ray.data.Dataset):
        right_col = right_col or keys.schema().names[0]
        from aws_medallion_datalake_ray.functions.dedup import exact_dedup

        keys_ds = exact_dedup(
            keys.select_columns([right_col]), (right_col,),
            num_partitions=max(2, _ncpu()), rebundle_narrow=True,
        ).materialize()
        n, nbytes = keys_ds.count(), int(keys_ds.size_bytes() or 0)
    else:
        if isinstance(keys, pa.Table):
            keys = keys[right_col or keys.column_names[0]]
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            keys = keys.to_numpy(zero_copy_only=False)
        arr = np.unique(np.asarray(keys))
        n = len(arr)
        nbytes = (int(arr.nbytes) if arr.dtype != object
                  else int(pd.Series(arr).memory_usage(deep=True)))

    use_broadcast = n <= count_budget and nbytes <= bytes_budget
    LAST_FILTER_PLAN.clear()
    LAST_FILTER_PLAN.update(
        plan="broadcast" if use_broadcast else "joined",
        rows=int(n), bytes=int(nbytes), anti=bool(anti),
    )

    if use_broadcast:
        if arr is None:
            got = (pa.concat_tables(
                keys_ds.iter_batches(batch_format="pyarrow", batch_size=None))
                if n else keys_ds.schema().empty_table())
            arr = np.unique(got[right_col].to_numpy(zero_copy_only=False))
        ref = ray.put(np.ascontiguousarray(arr))
        return ds.map_batches(
            _semi_filter_batch,
            fn_kwargs={"ref": ref, "col": col, "anti": anti},
            batch_format="pyarrow",
        )

    if keys_ds is None:
        keys_ds = ray.data.from_arrow(pa.table({right_col or col: pa.array(arr)}))
        right_col = right_col or col
    marked = keys_ds.map_batches(
        lambda t, rc=right_col: pa.table({
            KEY: t[rc],
            HIT: pa.array(np.ones(len(t), np.int8)),
        }),
        batch_format="pyarrow",
    )
    nparts = num_partitions or max(2, _ncpu() // 2)
    joined = ds.join(
        marked, join_type="left_outer", num_partitions=nparts,
        on=(col,), right_on=(KEY,),
    )
    keep_cols = ds.schema().names

    def _finish(t: pa.Table, keep=tuple(keep_cols), anti=anti) -> pa.Table:
        miss = pc.is_null(t[HIT]).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(miss if anti else ~miss))
        return t.select([c for c in keep if c in t.column_names])

    return joined.map_batches(_finish, batch_format="pyarrow")
