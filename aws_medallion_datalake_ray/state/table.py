"""LakeTable — the engine's table abstraction over Parquet + manifest tree.

One ``LakeTable`` = one directory::

    <root>/table.json          # static config (stats columns)
    <root>/data/<commit>/...   # immutable parquet data files
    <root>/_manifest/          # snapshots + manifests + HEAD (manifest.py)
    <root>/_ledger/            # per-job checkpoint ledgers (ledger.py)

All reads are **snapshot-consistent**: ``scan()`` resolves HEAD once and reads
exactly that snapshot's file list (cf. the reference's race-prone
read-directory-while-overwriting pattern, ``silver_digit_clean.py:27,127``).

Maintenance ops (the BASELINE.json north_rule suite):

- :meth:`compact`   — bin-packing small files into target-size Parquet
- :meth:`zorder`    — Z-order/Hilbert clustering via bit-interleaved sort keys
- :meth:`rewrite_stats` — manifest rewrite with per-file min/max column stats
- :meth:`expire_snapshots` + :meth:`gc_orphans` — snapshot expiry and
  reachability-based orphan-file GC
- :meth:`merge`     — MERGE INTO (upsert on key), broadcast anti-join with
  stats-pruned copy-on-write of affected files
"""

from __future__ import annotations

import base64
import functools as _functools
import json
import os
import time
import uuid
from typing import Any, Iterable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data

from aws_medallion_datalake_ray.functions.bloom import bloom_may_contain_any
from aws_medallion_datalake_ray.functions.dedup import exact_dedup
from aws_medallion_datalake_ray.functions.zorder import hilbert_key, zorder_key
from aws_medallion_datalake_ray.schema import DEFAULT_STATS_COLS, SOURCE_FILES_KEY
from aws_medallion_datalake_ray.stages.stats import (
    collect_blooms, collect_stats, parquet_footer_stats)
from aws_medallion_datalake_ray.state.ledger import Ledger
from aws_medallion_datalake_ray.state.manifest import DataFile, ManifestStore, Snapshot

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024

# A conjunction of simple comparisons: [(col, op, value), ...] with op in
# {"==","<","<=",">",">=","in"}. Evaluated twice: against manifest min/max for
# file pruning, and pushed down to pyarrow row-group/row filtering.
Predicate = Sequence[tuple[str, str, Any]]


def _schema_to_json(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def _schema_from_json(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


@_functools.lru_cache(maxsize=64)
def _cached_schema(schema_json: str) -> pa.Schema:
    return _schema_from_json(schema_json)


@_functools.lru_cache(maxsize=65536)
def _footer_schema(abs_path: str) -> pa.Schema:
    """Physical schema of one parquet file (footer-only, memoized — data
    files are immutable so the cache never goes stale)."""
    return pq.read_schema(abs_path)


def _footer_names(abs_path: str) -> tuple[str, ...]:
    return tuple(_footer_schema(abs_path).names)


def _needs_reconcile(
    abs_path: str, logical: pa.Schema, pcols: set, old_names: set
) -> bool:
    """Does this physical file still require the evolution reconcile?
    True when it carries a rename-source name, or lacks a logical
    non-partition column, or holds one at a pre-widen (different) type.
    Footer-only via the memoized :func:`_footer_schema`."""
    phys = _footer_schema(abs_path)
    if set(phys.names) & old_names:
        return True
    for fld in logical:
        if fld.name in pcols:
            continue
        i = phys.get_field_index(fld.name)
        if i < 0 or phys.field(i).type != fld.type:
            return True
    return False


def _reconcile_batch(
    t: pa.Table,
    *,
    schema_json: str,
    renames: dict[str, str],
    defaults: dict[str, Any],
    want: tuple[str, ...],
    attach: tuple = (),
) -> pa.Table:
    """Reconcile a (possibly pre-evolution) batch to the ``want`` subset of
    the evolved schema: rename old->new, default/null-fill added columns,
    cast widened types.  ``attach`` prepends constant (Hive partition)
    columns absent from the physical files.  Arrow-kernel only — no row
    loops."""
    for name, val in attach:
        t = t.append_column(name, pa.repeat(pa.scalar(val, pa.string()), len(t)))
    target = _cached_schema(schema_json)
    if renames:
        new_names = [renames.get(n, n) for n in t.column_names]
        if new_names != t.column_names:
            t = t.rename_columns(new_names)
    arrays: list[Any] = []
    fields: list[pa.Field] = []
    for name in want:
        fld = target.field(name)
        idx = t.schema.get_field_index(name)
        if idx >= 0:
            col = t.column(idx)
            if col.type != fld.type:
                col = pc.cast(col, fld.type)
        elif defaults.get(name) is not None:
            col = pa.repeat(pa.scalar(defaults[name], fld.type), len(t))
        else:
            col = pa.nulls(len(t), fld.type)
        arrays.append(col)
        fields.append(fld)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a nonlinear second checksum so two
    different multisets cannot match both the raw-hash sum and this one."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


_PRED_OPS = {
    "==": pc.equal, "<": pc.less, "<=": pc.less_equal,
    ">": pc.greater, ">=": pc.greater_equal,
}


def _predicate_mask(t: pa.Table, predicate: list):
    mask = None
    for col, op, val in predicate:
        c = t[col]
        e = (pc.is_in(c, value_set=pa.array(list(val))) if op == "in"
             else _PRED_OPS[op](c, val))
        mask = e if mask is None else pc.and_kleene(mask, e)
    return mask


def _apply_predicate_batch(t: pa.Table, *, predicate: list) -> pa.Table:
    """Batch-side predicate evaluation for terms that could not be pushed
    into the parquet read (e.g. columns synthesized by schema evolution)."""
    mask = _predicate_mask(t, predicate)
    return t.filter(mask) if mask is not None else t


def _apply_inverted_predicate_batch(t: pa.Table, *, predicate: list) -> pa.Table:
    """Keep rows NOT matching the predicate (DELETE survivors); null
    comparisons keep the row (a null can't be proven to match)."""
    mask = _predicate_mask(t, predicate)
    if mask is None:
        return t
    inv = pc.invert(pc.fill_null(mask, False))
    return t.filter(inv)


def prune_files(files: list[DataFile], predicate: Predicate | None) -> list[DataFile]:
    """Manifest-level pruning: partition values first (exact for ==/in — a
    partitioned file holds exactly one value per partition column), then
    min/max stats, then per-file Bloom filters (point probes on
    high-cardinality columns whose min/max ranges all overlap; see
    ``functions/bloom.py`` / :meth:`LakeTable.build_blooms`); a file is kept
    unless pruning *proves* no row can match.  Missing
    partition/stats/bounds/bloom -> keep (conservative)."""
    if not predicate:
        return files
    out = []
    for f in files:
        keep = True
        for col, op, val in predicate:
            pv = f.partition.get(col) if f.partition else None
            if pv is not None:
                if op == "==":
                    keep = str(val) == pv
                elif op == "in":
                    keep = pv in {str(v) for v in val}
                if not keep:
                    break
                if op in ("==", "in"):
                    continue
            st = f.stats.get(col)
            if st is None:
                continue
            if op in ("==", "in") and st.get("bloom") is not None:
                # hint = the column's native-typed min stat, so a probe
                # constant in a different numeric type (5.0 vs int64 col)
                # is cast into the build hash domain instead of silently
                # missing; unmappable probes keep the file (conservative)
                if not bloom_may_contain_any(st["bloom"], val,
                                             hint=st.get("min")):
                    keep = False
                    break
            lo, hi = st.get("min"), st.get("max")
            try:
                if op == "==" and (
                    (lo is not None and val < lo) or (hi is not None and val > hi)
                ):
                    keep = False
                elif op == "in":
                    # NULL list elements match nothing under IN — drop them;
                    # an all-NULL list can match no row at all
                    vals = sorted(v for v in val if v is not None)
                    if not vals:
                        keep = False
                    elif (lo is not None and vals[-1] < lo) or \
                            (hi is not None and vals[0] > hi):
                        keep = False
                elif op == "<" and lo is not None and lo >= val:
                    keep = False
                elif op == "<=" and lo is not None and lo > val:
                    keep = False
                elif op == ">" and hi is not None and hi <= val:
                    keep = False
                elif op == ">=" and hi is not None and hi < val:
                    keep = False
            except TypeError:
                pass  # cross-type constant (str vs int col): never prune on it
            if not keep:
                break
        if keep:
            out.append(f)
    return out


def predicate_covers_file(f: DataFile, predicate: Predicate) -> bool:
    """True when partition values / min-max stats PROVE that every row of
    ``f`` satisfies the (conjunctive) predicate — the metadata-only DELETE
    fast path.  Conservative: any missing bound -> False."""
    if not predicate:
        return False
    for col, op, val in predicate:
        pv = f.partition.get(col) if f.partition else None
        if pv is not None and op == "==" and str(val) == pv:
            continue
        if pv is not None and op == "in" and pv in {str(v) for v in val}:
            continue
        st = f.stats.get(col) or {}
        lo, hi = st.get("min"), st.get("max")
        # nulls may be None = UNKNOWN (footer lacked null_count): treat as
        # "file may hold NULL rows that survive the predicate" -> not covered
        if lo is None or hi is None or st.get("nulls", 0) != 0:
            return False
        # lazy thunks: the "in" arm iterates val, which is a scalar for the
        # other ops — eager dict evaluation would TypeError whenever lo == hi
        ok = {
            "==": lambda: lo == hi == val,
            "in": lambda: lo == hi and lo in set(val),
            "<": lambda: hi < val,
            "<=": lambda: hi <= val,
            ">": lambda: lo > val,
            ">=": lambda: lo >= val,
        }.get(op, lambda: False)()
        if not ok:
            return False
    return True


def _files_for_first_keys(
    files: list[DataFile], col: str, firsts: np.ndarray,
    probe_cap: int = 100_000,
) -> list[DataFile]:
    """Files that may hold a row whose ``col`` value is in the sorted
    ``firsts`` array (the distinct first key components of a DELETE/MERGE
    key set) — min/max range intersection first, then, when the manifest
    carries a Bloom filter for ``col`` (:meth:`LakeTable.build_blooms`),
    a vectorized probe of the in-range candidates: a file whose filter
    proves every candidate absent cannot contain a matching key and is
    skipped with zero IO.  Missing stats/bloom -> keep (conservative);
    ranges holding more than ``probe_cap`` candidates skip the probe (the
    k x n position matrix would outweigh the read it saves)."""
    from aws_medallion_datalake_ray.functions.bloom import bloom_may_contain_any

    out = []
    probe = firsts  # may be re-typed ONCE into the stats' numeric domain
    coerce_failed = False
    for f in files:
        st = f.stats.get(col)
        if st is None or st.get("min") is None or st.get("max") is None:
            out.append(f)
            continue
        try:
            i = np.searchsorted(probe, st["min"])
            j = np.searchsorted(probe, st["max"], side="right")
        except TypeError:
            # delete_keys key sets arrive STRINGIFIED (joined-key contract)
            # while a numeric key column's stats are native ints/floats —
            # re-type the key set into the column domain once so range AND
            # bloom pruning stay exact; un-coercible -> keep every file
            # (conservative: pruning may only ever prove absence)
            if not coerce_failed:
                try:
                    probe = np.sort(np.array(
                        [type(st["min"])(x) for x in firsts]))
                    i = np.searchsorted(probe, st["min"])
                    j = np.searchsorted(probe, st["max"], side="right")
                except (TypeError, ValueError):
                    coerce_failed = True
                    out.append(f)
                    continue
            else:
                out.append(f)
                continue
        if i >= j:
            continue
        bl = st.get("bloom")
        if bl is not None and (j - i) <= probe_cap and \
                not bloom_may_contain_any(bl, probe[i:j], hint=st["min"]):
            continue
        out.append(f)
    return out


def _multi_node() -> bool:
    """True on a real multi-node cluster — the regime where an all-to-all
    shuffle costs network and a bloom runtime filter pays for its extra
    local passes.  Single-node shuffles move through local plasma at
    memory bandwidth, which the filter's own routing passes also consume
    (measured: 1.7x slower locally at 600k rows / 3% deletes), so 'auto'
    keeps it off there."""
    try:
        return len([n for n in ray.nodes() if n.get("Alive")]) > 1
    except Exception:
        return False


def predicate_to_expr(predicate: Predicate | None):
    if not predicate:
        return None
    expr = None
    for col, op, val in predicate:
        f = pads.field(col)
        e = {
            "==": lambda: f == val,
            "<": lambda: f < val,
            "<=": lambda: f <= val,
            ">": lambda: f > val,
            ">=": lambda: f >= val,
            "in": lambda: f.isin(list(val)),
        }[op]()
        expr = e if expr is None else (expr & e)
    return expr


@ray.remote
def _compact_bin(
    abs_in: list[str],
    abs_out: str,
    stats_cols: tuple[str, ...],
    reconcile: dict | None = None,
) -> tuple[int, int, dict]:
    """One compaction bin: read N small files, write 1 target-size file.

    Row-group size follows the file (one file ~= one block downstream);
    zstd keeps the rewrite IO-bound rather than storage-bound.  With a
    schema-evolution ``reconcile`` spec, each input is upgraded to the
    evolved schema before the merge — compaction physically materializes
    the evolution, so the table converges back to uniform files.
    """
    tables = [pq.read_table(p) for p in abs_in]
    if reconcile is not None:
        tables = [_reconcile_batch(t, **reconcile) for t in tables]
    merged = pa.concat_tables(tables, promote_options="permissive")
    # 128k-row groups: a compacted file must stay splittable into parallel
    # read blocks for downstream sorts/scans (1 row group = 1 block floor)
    pq.write_table(merged, abs_out, compression="zstd", row_group_size=1 << 17)
    return parquet_footer_stats(abs_out, stats_cols)


def plan_bins(
    files: list[DataFile],
    target_bytes: int,
    min_files_per_bin: int = 2,
    force: set | None = None,
) -> list[list[DataFile]]:
    """First-fit-decreasing bin packing of undersized files into ~target bins.

    ``force``: file paths that must be rewritten regardless of size or bin
    occupancy (pre-evolution files needing a physical schema upgrade) — they
    enter the packing even at target size and keep their bin alive below
    ``min_files_per_bin``."""
    force = force or set()
    small = sorted(
        (f for f in files
         if f.bytes < int(target_bytes * 0.8) or f.path in force),
        key=lambda f: f.bytes,
        reverse=True,
    )
    bins: list[tuple[int, list[DataFile]]] = []
    for f in small:
        for i, (used, members) in enumerate(bins):
            if used + f.bytes <= target_bytes:
                bins[i] = (used + f.bytes, members + [f])
                break
        else:
            bins.append((f.bytes, [f]))
    return [
        members for _, members in bins
        if len(members) >= min_files_per_bin
        or any(m.path in force for m in members)
    ]


_KEY_SEP = "\x1f"

# change_feed: changed-key sets up to this size broadcast back to pass 2 as
# sorted hash triples (24 B/key); beyond it the full-row co-partition plan
# runs instead.  Module-level so tests can force the fallback.
CHANGE_FEED_BROADCAST_KEYS = 2_000_000


def _join_keys(batch: pa.Table, key_cols: tuple[str, ...]) -> np.ndarray:
    parts = [batch[c].to_pandas().astype(str) for c in key_cols]
    out = parts[0]
    for p in parts[1:]:
        out = out + _KEY_SEP + p
    return out.to_numpy(dtype=object)


def _to_fixed_bytes(arr: np.ndarray, dtype) -> np.ndarray:
    """object-str array -> fixed-width bytes; utf-8 fallback for non-ascii."""
    try:
        return arr.astype(dtype)
    except UnicodeEncodeError:
        w = np.dtype(dtype).itemsize
        return np.array([x.encode("utf-8")[:w] for x in arr], dtype=dtype)


def _key_membership(
    batch: pa.Table, keys_ref, lens_ref, key_cols: tuple[str, ...]
) -> np.ndarray:
    """Row mask: key tuple present in the broadcast sorted key set.

    The key set is a SORTED fixed-width bytes ndarray (dtype 'S<w>') put once
    on the driver: fixed-dtype numpy is a ZERO-COPY plasma read, so each task
    maps the array rather than deserializing it — no actor pool, no per-batch
    re-ship.  ``lens_ref`` carries true byte lengths so a key longer than the
    fixed width can never false-positive on a prefix."""
    keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
    lens = ray.get(lens_ref) if isinstance(lens_ref, ray.ObjectRef) else lens_ref
    if len(keys) == 0:
        return np.zeros(len(batch), dtype=bool)
    raw = _join_keys(batch, key_cols)
    blen = np.array([len(x.encode("utf-8")) for x in raw], dtype=np.int32)
    k = _to_fixed_bytes(raw, keys.dtype)
    idx = np.searchsorted(keys, k)
    idx = np.clip(idx, 0, len(keys) - 1)
    return (keys[idx] == k) & (lens[idx] == blen)


def _anti_join_batch(
    batch: pa.Table, keys_ref, lens_ref, key_cols: tuple[str, ...]
) -> pa.Table:
    """Drop rows whose key tuple is in the broadcast update key set."""
    hit = _key_membership(batch, keys_ref, lens_ref, key_cols)
    return batch.filter(pa.array(~hit))


def _semi_join_batch(
    batch: pa.Table, keys_ref, lens_ref, key_cols: tuple[str, ...]
) -> pa.Table:
    """Keep only rows whose key tuple is in the broadcast key set."""
    hit = _key_membership(batch, keys_ref, lens_ref, key_cols)
    return batch.filter(pa.array(hit))


class ConstraintViolation(RuntimeError):
    """A write batch failed a table CHECK constraint."""


def _check_constraint_batch(t: pa.Table, terms: list) -> None:
    """Vectorized CHECK validation of one Arrow batch; raises
    :class:`ConstraintViolation` with the failing term and row count.
    Runs INSIDE each write task (streaming, fail-fast, zero extra pass)."""
    for term in terms:
        col, op, val = term[0], term[1], term[2] if len(term) > 2 else None
        if col not in t.column_names:
            raise ConstraintViolation(
                f"constraint column {col!r} absent from write batch")
        arr = t[col]
        if op == "not-null":
            bad = pc.is_null(arr)
        else:
            if op == "==":
                ok = pc.equal(arr, val)
            elif op == "!=":
                ok = pc.not_equal(arr, val)
            elif op == "<":
                ok = pc.less(arr, val)
            elif op == "<=":
                ok = pc.less_equal(arr, val)
            elif op == ">":
                ok = pc.greater(arr, val)
            elif op == ">=":
                ok = pc.greater_equal(arr, val)
            elif op == "in":
                ok = pc.is_in(arr, pa.array(list(val)))
            else:
                raise ValueError(f"unknown constraint op {op!r}")
            # NULL comparisons are not satisfied: a constraint asserts the
            # predicate HOLDS, so null -> violation (add an explicit
            # not-null term semantics, DuckDB-CHECK-unlike but write-safe)
            bad = pc.or_kleene(pc.invert(ok), pc.is_null(arr))
        n_bad = int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
        if n_bad:
            raise ConstraintViolation(
                f"constraint {col} {op} {val!r} violated by {n_bad} row(s)")


class LakeTable:
    def __init__(self, root: str):
        self.root = root
        self.store = ManifestStore(root)
        self.data_dir = os.path.join(root, "data")
        self.last_op_timings: dict[str, float] = {}  # merge phase profile
        cfg_path = os.path.join(root, "table.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                self.config = json.load(f)
        else:
            self.config = {"stats_cols": list(DEFAULT_STATS_COLS)}

    # ------------------------------------------------------------ lifecycle

    @classmethod
    def create(
        cls,
        root: str,
        stats_cols: Iterable[str] = DEFAULT_STATS_COLS,
        partition_cols: Iterable[str] = (),
    ) -> "LakeTable":
        """``partition_cols``: Hive-style write partitioning (the reference's
        ``year=/month=/day=`` layout, ``bronze_digit.py:148``).  Partition
        columns must be string-typed and their values must not contain ``/``
        or ``=``; values are recorded per file in the manifest
        (``DataFile.partition``) and drive exact ==/in pruning."""
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "_manifest"), exist_ok=True)
        t = cls(root)
        t.config = {
            "stats_cols": list(stats_cols),
            "partition_cols": list(partition_cols),
        }
        with open(os.path.join(root, "table.json"), "w") as f:
            json.dump(t.config, f)
        return t

    @property
    def stats_cols(self) -> tuple[str, ...]:
        return tuple(self.config["stats_cols"])

    @property
    def partition_cols(self) -> tuple[str, ...]:
        return tuple(self.config.get("partition_cols", ()))

    @property
    def bloom_cols(self) -> tuple[str, ...]:
        return tuple(self.config.get("bloom_cols", ()))

    @property
    def constraints(self) -> list:
        return list(self.config.get("constraints", []))

    def set_constraints(self, terms: list) -> None:
        """CHECK constraints (Delta-style expectations): ``(col, op[, val])``
        terms with op in ``== != < <= > >= in not-null``.  Enforced
        vectorized INSIDE every ingress write task (append / overwrite /
        stage_append / merge update side) — fail-fast while streaming, no
        extra validation pass; a failed write aborts before its snapshot
        commits, so readers never see a violating row.  Maintenance rewrites
        (compact/zorder/delete) are exempt: they move rows that already
        passed.  NULL fails every comparison term (a CHECK asserts the
        predicate HOLDS — use ``not-null`` explicitly where nulls matter)."""
        for term in terms:  # validate ops eagerly, not at first write
            if term[1] not in ("==", "!=", "<", "<=", ">", ">=", "in",
                               "not-null"):
                raise ValueError(f"unknown constraint op {term[1]!r}")
        self.config["constraints"] = [list(t) for t in terms]
        with open(os.path.join(self.root, "table.json"), "w") as f:
            json.dump(self.config, f)

    def _constrained(self, data):
        """Wrap ingress data with the in-stream CHECK validator."""
        terms = self.constraints
        if not terms:
            return data
        if isinstance(data, pd.DataFrame):
            data = pa.Table.from_pandas(data, preserve_index=False)
        if isinstance(data, pa.Table):
            _check_constraint_batch(data, terms)
            return data
        return data.map_batches(
            lambda t, _terms=terms: (_check_constraint_batch(t, _terms), t)[1],
            batch_format="pyarrow",
        )

    def abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def schema(self, snapshot_id: int | None = None) -> pa.Schema | None:
        """Table schema as of HEAD, or of an explicit snapshot (time travel
        must see the schema that was current THEN, not HEAD's evolved one —
        ``schema_json`` is inherited by every descendant commit so any
        snapshot resolves)."""
        snap = (self.store.head() if snapshot_id is None
                else self.store.snapshot(snapshot_id))
        if snap is None or snap.schema_json is None:
            return None
        return _schema_from_json(snap.schema_json)

    # ------------------------------------------------------------ write

    def _new_commit_dir(self) -> tuple[str, str]:
        rel = os.path.join("data", uuid.uuid4().hex[:12])
        os.makedirs(self.abs(rel), exist_ok=True)
        return rel, self.abs(rel)

    def _register_dir(self, rel_dir: str) -> list[DataFile]:
        """Footer-stat every parquet file under a freshly written dir
        (recursively — Hive ``k=v`` path segments become the file's manifest
        partition values)."""
        abs_dir = self.abs(rel_dir)
        rels: list[str] = []
        for dp, _dn, fn in os.walk(abs_dir):
            for n in fn:
                if n.endswith(".parquet"):
                    rels.append(os.path.relpath(os.path.join(dp, n), abs_dir))
        rels.sort()
        abs_paths = [os.path.join(abs_dir, r) for r in rels]
        stats = collect_stats(abs_paths, self.stats_cols)
        pcols = set(self.partition_cols)
        out = []
        for rel, (r, b, s) in zip(rels, stats):
            part: dict[str, str] = {}
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    if k in pcols:
                        part[k] = v
            out.append(
                DataFile(
                    path=os.path.join(rel_dir, rel), rows=r, bytes=b,
                    partition=part, stats=s,
                )
            )
        return out

    def _write_dataset(
        self,
        data: "ray.data.Dataset | pa.Table | pd.DataFrame",
        max_rows_per_file: int | None = None,
        min_rows_per_file: int | None = None,
        partitioned: bool | None = None,
    ) -> list[DataFile]:
        """``partitioned`` (default: table has partition_cols): Hive-layout
        write — one ``col=value`` directory level per partition column; the
        partition columns are dropped from the files (standard Hive) and
        re-attached at scan from the manifest partition values."""
        rel_dir, abs_dir = self._new_commit_dir()
        if partitioned is None:
            partitioned = bool(self.partition_cols)
        if isinstance(data, pd.DataFrame):
            data = pa.Table.from_pandas(data, preserve_index=False)
        if partitioned and self.partition_cols:
            pcols = list(self.partition_cols)
            if isinstance(data, pa.Table):
                pq.write_to_dataset(
                    data, abs_dir, partition_cols=pcols, compression="zstd"
                )
            else:
                kw = {}
                if max_rows_per_file:
                    kw["max_rows_per_file"] = max_rows_per_file
                # without a floor, hive writes one file per (block x partition)
                # — a fragmentation explosion at many-block scale
                kw["min_rows_per_file"] = min_rows_per_file or 65536
                data.write_parquet(
                    abs_dir, partition_cols=pcols, compression="zstd", **kw
                )
        elif isinstance(data, pa.Table):
            pq.write_table(
                data, os.path.join(abs_dir, "part-0.parquet"), compression="zstd"
            )
        else:
            kw: dict[str, Any] = {}
            if max_rows_per_file:
                kw["max_rows_per_file"] = max_rows_per_file
            if min_rows_per_file:
                kw["min_rows_per_file"] = min_rows_per_file
            data.write_parquet(abs_dir, compression="zstd", **kw)
        return self._register_dir(rel_dir)

    def _data_schema(self, data) -> pa.Schema | None:
        """Schema of the pre-write data (includes partition columns, which
        Hive-layout files drop)."""
        if isinstance(data, pa.Table):
            return data.schema
        if isinstance(data, pd.DataFrame):
            return pa.Schema.from_pandas(data)
        try:
            s = data.schema()
            return getattr(s, "base_schema", None)
        except Exception:
            return None

    def _coalesce_rows_target(
        self, files: list[DataFile], target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES
    ) -> int:
        """min_rows_per_file for a copy-on-write rewrite: aim at target-size
        files but keep >= 2 x CPUs output files so the write stays parallel
        (one tiny file per block is task-overhead-bound; one giant file is
        serial)."""
        total_rows = sum(f.rows for f in files) or 1
        total_bytes = sum(f.bytes for f in files) or 1
        rows_target = max(1, int(target_file_bytes / max(1, total_bytes / total_rows)))
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        return int(max(4096, min(rows_target, max(1, total_rows // (2 * ncpu)))))

    def _commit_file_schema(self, files: list[DataFile]) -> str | None:
        """schema_json for a maintenance commit: partitioned tables inherit
        the parent snapshot's schema (files lack the partition columns), flat
        tables use the first written file's schema.  Evolved tables always
        inherit — a rewrite of pre-evolution files must not reset the table
        schema to the old physical shape."""
        if self.partition_cols or self._evolution() is not None:
            return None  # commit() inherits head.schema_json
        return self._file_schema(files)

    def _file_schema(self, files: list[DataFile]) -> str | None:
        if not files:
            return None
        return _schema_to_json(pq.read_schema(self.abs(files[0].path)))

    def append(
        self,
        data,
        run_ts: str = "1970-01-01T00:00:00",
        operation: str = "append",
        max_rows_per_file: int | None = None,
    ) -> Snapshot:
        data = self._constrained(data)
        schema = self._data_schema(data) if self.partition_cols else None
        added = self._write_dataset(data, max_rows_per_file=max_rows_per_file)
        if self._evolution() is not None:
            schema_json = None  # inherit the evolved schema (scan reconciles)
        elif schema is not None:
            schema_json = _schema_to_json(schema)
        else:
            schema_json = self._file_schema(added)
        return self.store.commit(added, [], operation, run_ts, schema_json=schema_json)

    def add_files(
        self, paths: Iterable[str], run_ts: str = "1970-01-01T00:00:00"
    ) -> Snapshot:
        """Register EXISTING parquet files into the table without copying
        (Iceberg add_files semantics) — at 100 TB, ingest means adopting
        files in place, not rewriting them.  Footer stats are collected in
        parallel; the files stay where they are (absolute paths in the
        manifest) and are never touched by orphan GC, which only walks the
        table's own data dir."""
        abs_paths = [os.path.abspath(p) for p in paths]
        stats = collect_stats(abs_paths, self.stats_cols)
        added = [
            DataFile(path=p, rows=r, bytes=b, stats=s)
            for p, (r, b, s) in zip(abs_paths, stats)
        ]
        return self.store.commit(
            added, [], "add-files", run_ts, schema_json=self._file_schema(added)
        )

    def clone_to(
        self,
        dest_root: str,
        run_ts: str = "1970-01-01T00:00:00",
        snapshot_id: int | None = None,
        pin_source: bool = True,
    ) -> "LakeTable":
        """SHALLOW CLONE (Delta ``CLONE`` semantics): a NEW independent table
        whose first snapshot references this table's current (or pinned)
        data files in place — zero bytes copied, manifest entries carried by
        value so stats, partition values, per-file Bloom filters, the
        evolution spec, and pending merge-on-read delete specs all survive.
        The clone then diverges freely: its own commits write into its own
        data dir; its GC never touches foreign absolute paths.

        ``pin_source=True`` tags the source snapshot
        (``clone-<dest basename>-<snapshot id>`` — the snapshot id keeps
        pins for same-named dest paths from overwriting each other) so
        source retention cannot expire the files the clone references — the
        vacuum-breaks-shallow-clones hazard Delta documents is closed by
        construction here; drop the tag when the clone is deleted or
        deep-copied.  Complements branches: a branch
        shares one commit tree and lock; a clone is a separate table (own
        lock, own retention) sharing only immutable data files."""
        snap = (self.store.head() if snapshot_id is None
                else self.store.snapshot(snapshot_id))
        if snap is None:
            raise ValueError("cannot clone an empty table")
        files = self.store.files(snap)
        dest = LakeTable.create(dest_root)
        dest.config = dict(self.config)
        with open(os.path.join(dest_root, "table.json"), "w") as f:
            json.dump(dest.config, f)
        added = [
            DataFile(
                path=(df.path if os.path.isabs(df.path) else self.abs(df.path)),
                rows=df.rows, bytes=df.bytes,
                partition=dict(df.partition),
                stats={c: dict(st) for c, st in df.stats.items()},
            )
            for df in files
        ]
        summary: dict[str, Any] = {"cloned_from": self.root,
                                   "source_snapshot": snap.snapshot_id}
        if "evolution" in (snap.summary or {}):  # spec must ride the clone
            summary["evolution"] = snap.summary["evolution"]
        if (snap.summary or {}).get("deletes"):
            # pending MoR delete specs pin FILE PATHS — rewrite them through
            # the same absolutization as the entries or the masks go dead
            def _abs(p: str) -> str:
                return p if os.path.isabs(p) else self.abs(p)

            summary["deletes"] = [
                dict(sp, files=[_abs(p) for p in sp.get("files", [])])
                for sp in snap.summary["deletes"]
            ]
        dest.store.commit(added, [], "clone", run_ts,
                          schema_json=snap.schema_json, summary=summary)
        if pin_source:
            pin = (f"clone-{os.path.basename(dest_root.rstrip('/'))}"
                   f"-{snap.snapshot_id}")
            prior = self.tags().get(pin)
            if prior is not None and prior != snap.snapshot_id:
                raise ValueError(
                    f"clone pin {pin!r} already tags snapshot {prior}; "
                    "refusing to re-point it (would un-pin a live clone)")
            self.tag_snapshot(pin, snap.snapshot_id)
        return dest

    def overwrite(
        self,
        data,
        run_ts: str = "1970-01-01T00:00:00",
        max_rows_per_file: int | None = None,
        min_rows_per_file: int | None = None,
    ) -> Snapshot:
        data = self._constrained(data)
        schema = self._data_schema(data) if self.partition_cols else None
        added = self._write_dataset(
            data, max_rows_per_file=max_rows_per_file,
            min_rows_per_file=min_rows_per_file,
        )
        removed = [f.path for f in self.store.files()]
        return self.store.commit(
            added, removed, "overwrite", run_ts,
            schema_json=_schema_to_json(schema) if schema else self._file_schema(added),
            # a full replace leaves no pre-evolution files: clear the spec
            # (empty dict beats inheritance; _evolution treats it as none)
            summary={"evolution": {}},
        )

    # ------------------------------------------------------------ evolution

    def evolve_schema(
        self,
        add: dict[str, Any] | None = None,
        rename: dict[str, str] | None = None,
        widen: dict[str, pa.DataType] | None = None,
        run_ts: str = "1970-01-01T00:00:00",
    ) -> Snapshot:
        """Metadata-only schema evolution (Iceberg-style, generalizing the
        reference's side-channel DDL edits, ``silver_digit_clean.py:131-235``,
        which rewrote the Glue Catalog but could never reconcile old files):
        add columns (``{name: dtype}`` or ``{name: (dtype, default)}``),
        rename (``{old: new}``), and widen types — WITHOUT rewriting a single
        data file.  The cumulative spec (renames + defaults) rides on the
        snapshot chain; scans reconcile pre-evolution files on the fly
        (rename / default-fill / cast per batch) and :meth:`compact`
        physically upgrades them.  Time travel to a pre-evolution snapshot
        sees the old schema, spec-free.  Defaults must be JSON-serializable
        scalars.  On Hive-partitioned tables add/widen/rename work for DATA
        columns; PARTITION columns are immutable (their names/values ARE the
        directory layout and the manifest pruning key)."""
        # pending lazy-delete specs reference CURRENT column names/types;
        # fold them into files before the schema moves under them
        self._materialize_if_pending(run_ts)
        blocked = (set(rename or {}) | set(widen or {})) & set(self.partition_cols)
        if blocked:
            raise NotImplementedError(
                f"cannot evolve partition column(s) {sorted(blocked)}: the "
                "Hive layout and partition pruning key on them"
            )
        head = self.store.head()
        if head is None or head.schema_json is None:
            raise ValueError("cannot evolve an empty table (no schema yet)")
        schema = _schema_from_json(head.schema_json)
        prev = (head.summary or {}).get("evolution") or {}
        renames = dict(prev.get("renames") or {})
        defaults = dict(prev.get("defaults") or {})
        fields = list(schema)
        names = [f.name for f in fields]
        for old, new in (rename or {}).items():
            if old not in names:
                raise KeyError(f"rename source {old!r} not in schema")
            if new in names:
                raise ValueError(f"rename target {new!r} already exists")
            if new in renames:
                raise ValueError(
                    f"rename target {new!r} collides with a historical "
                    "rename source (old files still carry that physical "
                    "name); compact the table first to retire it"
                )
            i = names.index(old)
            fields[i] = pa.field(new, fields[i].type)
            names[i] = new
            for k, v in list(renames.items()):  # chain a->b, b->c into a->c
                if v == old:
                    renames[k] = new
            renames[old] = new
            if old in defaults:
                defaults[new] = defaults.pop(old)
        for col, new_type in (widen or {}).items():
            if col not in names:
                raise KeyError(f"widen target {col!r} not in schema")
            i = names.index(col)
            fields[i] = pa.field(col, new_type)
        for col, spec in (add or {}).items():
            if col in names:
                raise ValueError(f"added column {col!r} already exists")
            if col in renames:
                raise ValueError(
                    f"added column {col!r} collides with a historical rename "
                    f"source (old files still carry that physical name); "
                    "compact the table first to retire the old name"
                )
            dtype, default = spec if isinstance(spec, tuple) else (spec, None)
            if default is not None:
                pa.scalar(default, dtype)  # validate early
                json.dumps(default)
                defaults[col] = default
            fields.append(pa.field(col, dtype))
            names.append(col)
        return self.store.commit(
            [], [], "evolve-schema", run_ts,
            summary={
                "evolution": {"renames": renames, "defaults": defaults},
                "added_cols": sorted(add or {}),
                "renamed_cols": dict(rename or {}),
                "widened_cols": {k: str(v) for k, v in (widen or {}).items()},
            },
            schema_json=_schema_to_json(pa.schema(fields)),
        )

    def retire_evolution(self, run_ts: str = "1970-01-01T00:00:00") -> bool:
        """Drop the schema-evolution spec (renames + defaults) once NO
        pre-evolution file remains — this is what unblocks reusing a
        historical rename source in :meth:`evolve_schema` (whose error
        message says "compact the table first to retire it"; without this,
        only a full overwrite ever cleared the spec).

        The check is footer-only and memoized: one cached schema read per
        commit directory (table-written dirs are schema-homogeneous) plus
        one per externally adopted file.  A file group is physically evolved
        iff it carries no rename-source name AND every logical non-partition
        column is present with exactly its logical type (so widened columns
        no longer need the reconcile cast either).  Returns True when the
        spec was cleared."""
        evo = self._evolution()
        if evo is None:
            return False
        spec, schema_json = evo
        logical = _cached_schema(schema_json)
        pcols = set(self.partition_cols)
        old_names = set(spec.get("renames") or {})
        seen_dirs: set[str] = set()
        for f in self.store.files():
            if not os.path.isabs(f.path):
                d = os.path.dirname(f.path)
                if d in seen_dirs:
                    continue
                seen_dirs.add(d)
            if _needs_reconcile(self.abs(f.path), logical, pcols, old_names):
                return False
        self.store.commit(
            [], [], "retire-evolution", run_ts, summary={"evolution": {}}
        )
        return True

    def _evolution(
        self, snapshot_id: int | None = None
    ) -> tuple[dict, str] | None:
        """(spec, schema_json) of the given/head snapshot, or None if the
        table has never evolved as of that snapshot."""
        snap = (self.store.head() if snapshot_id is None
                else self.store.snapshot(snapshot_id))
        if snap is not None and (snap.summary or {}).get("evolution"):
            return snap.summary["evolution"], snap.schema_json
        return None

    def _read_files_evolved(
        self,
        files: list[DataFile],
        columns: list[str] | None,
        predicate: "Predicate | None",
        spec: dict,
        schema_json: str,
        attach: tuple = (),
        defer_residue: bool = False,
        **read_kwargs,
    ) -> "ray.data.Dataset | tuple":
        """Evolution-aware read: files are grouped by commit directory (all
        files of one commit share a physical schema — one footer read per
        DIR on the driver, not per file), each group reads only the physical
        columns backing the requested logical ones with the pushable subset
        of the predicate, and a reconcile map_batches renames / default-fills
        / casts to the evolved schema.  Predicate terms over columns a group
        lacks (added columns) are applied post-reconcile.

        ``attach``: constant Hive-partition columns for this file group.
        ``defer_residue=True`` returns ``(dataset, dropped_pred)`` and skips
        the residue filter so a partitioned caller unions groups first."""
        renames = dict(spec.get("renames") or {})
        defaults = dict(spec.get("defaults") or {})
        # inverse rename is one-to-MANY: chained renames (a->c recorded as
        # both a->c and b->c) mean several physical names can back one
        # logical column; per file group, whichever old name exists wins
        inv: dict[str, list[str]] = {}
        for old, new in renames.items():
            inv.setdefault(new, []).append(old)

        def _phys_name(logical: str, phys: set) -> str | None:
            if logical in phys:
                return logical
            for old in inv.get(logical, ()):
                if old in phys:
                    return old
            return None

        target = _cached_schema(schema_json)
        want = list(columns) if columns is not None else list(target.names)
        attach = tuple((c, v) for c, v in attach if c in want)
        attached_names = {c for c, _ in attach}
        # group by commit dir (one footer read per dir: every file a table
        # WRITE produces in a commit dir shares one physical schema).
        # Externally ADOPTED files (add_files -> absolute paths) carry no
        # such guarantee — one external directory can hold heterogeneous
        # schemas across add_files calls — so they group by their actual
        # footer column set instead (one cached footer read per external
        # file; adopted sets are registration-scale, not data-scale).
        dirs: dict[tuple, list[DataFile]] = {}
        for f in files:
            if os.path.isabs(f.path):
                key = ("schema", _footer_names(self.abs(f.path)))
            else:
                key = ("dir", os.path.dirname(f.path))
            dirs.setdefault(key, []).append(f)
        parts: list[ray.data.Dataset] = []
        dropped_pred = False
        for _d, fs in sorted(dirs.items()):
            phys = set(pq.read_schema(self.abs(fs[0].path)).names)
            read_cols = []
            for c in want:
                if c in attached_names:
                    continue
                p = _phys_name(c, phys)
                if p is not None:
                    read_cols.append(p)
            sub_pred = []
            for col, op, val in predicate or []:
                p = _phys_name(col, phys)
                if p is not None:
                    sub_pred.append((p, op, val))
                else:
                    dropped_pred = True
            ds = ray.data.read_parquet(
                [self.abs(f.path) for f in fs],
                # a group backing none of the requested columns still needs
                # row counts for default-fill: read its narrowest column
                columns=read_cols or sorted(phys)[:1],
                filter=predicate_to_expr(sub_pred or None),
                **read_kwargs,
            ).map_batches(
                _reconcile_batch,
                fn_kwargs={"schema_json": schema_json, "renames": renames,
                           "defaults": defaults, "want": tuple(want),
                           "attach": attach},
                batch_format="pyarrow",
            )
            parts.append(ds)
        out = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
        if defer_residue:
            return out, dropped_pred
        if dropped_pred and predicate:
            out = out.map_batches(
                _apply_predicate_batch,
                fn_kwargs={"predicate": list(predicate)},
                batch_format="pyarrow",
            )
        return out

    # ------------------------------------------------------------ read

    def files(self, snapshot_id: int | None = None) -> list[DataFile]:
        snap = self.store.head() if snapshot_id is None else self.store.snapshot(snapshot_id)
        return self.store.files(snap) if snap else []

    def _read_files(
        self,
        files: list[DataFile],
        columns: list[str] | None = None,
        predicate: Predicate | None = None,
        evolution: "tuple[dict, str] | None | str" = "auto",
        snapshot_id: int | None = None,
        **read_kwargs,
    ) -> "ray.data.Dataset":
        """Dataset over an explicit file list, partition-aware: Hive-written
        files lack the partition columns, so each partition group is read
        separately and its manifest values re-attached as constant columns
        (union of groups; pruning usually leaves few groups).

        ``evolution="auto"`` resolves the HEAD snapshot's schema-evolution
        spec (maintenance ops operate on HEAD); ``scan`` passes the spec of
        the snapshot actually being read so time travel stays exact.
        ``snapshot_id`` likewise pins the schema used for the implicit
        column list on the NON-evolved partitioned branch — time travel to a
        pre-evolution snapshot must project that snapshot's columns, not
        HEAD's evolved/renamed ones (which old files don't have)."""
        if evolution == "auto":
            evolution = self._evolution()
        if evolution is not None:
            spec, schema_json = evolution
            if not any(f.partition for f in files):
                return self._read_files_evolved(
                    files, columns, predicate, spec, schema_json, **read_kwargs
                )
            # partitioned + evolved: per-partition-value groups, each read
            # through the evolved path with its manifest values attached;
            # the residue predicate applies once over the union
            pcols = list(self.partition_cols)
            row_pred = [p for p in (predicate or []) if p[0] not in pcols] or None
            groups: dict[tuple, list[DataFile]] = {}
            for f in files:
                groups.setdefault(
                    tuple(f.partition.get(c) for c in pcols), []).append(f)
            # non-==/in terms on partition columns can't prune exactly at the
            # manifest; they evaluate in the residue AFTER values attach (the
            # non-evolved path raises instead — this path is strictly abler)
            parts, residue = [], any(
                p[0] in pcols and p[1] not in ("==", "in")
                for p in predicate or []
            )
            for vals, fs in sorted(groups.items(), key=lambda kv: str(kv[0])):
                flat = all(v is None for v in vals)
                attach = () if flat else tuple(
                    (c, v) for c, v in zip(pcols, vals))
                ds, dropped = self._read_files_evolved(
                    fs, columns,
                    predicate if flat else row_pred,
                    spec, schema_json, attach=attach, defer_residue=True,
                    **read_kwargs,
                )
                parts.append(ds)
                residue = residue or dropped
            out = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
            if residue and predicate:
                # partition values are attached by now, so the FULL predicate
                # evaluates correctly over both hive and flat groups
                out = out.map_batches(
                    _apply_predicate_batch,
                    fn_kwargs={"predicate": list(predicate)},
                    batch_format="pyarrow",
                )
            return out
        if not any(f.partition for f in files):
            return ray.data.read_parquet(
                [self.abs(f.path) for f in files],
                columns=columns,
                filter=predicate_to_expr(predicate),
                **read_kwargs,
            )
        pcols = list(self.partition_cols)
        # non-==/in terms on partition columns can't push into Hive files
        # (the column isn't physical there) and can't prune exactly at the
        # manifest; they evaluate in a residue AFTER partition values attach
        # — same discipline as the evolved branch above (parity matters:
        # retiring an evolution spec must never shrink predicate support)
        residue_terms = [
            t for t in (predicate or [])
            if t[0] in pcols and t[1] not in ("==", "in")
        ]
        row_pred = [t for t in (predicate or []) if t[0] not in pcols] or None
        sch = self.schema(snapshot_id)
        want = list(columns) if columns is not None else (
            list(sch.names) if sch is not None else None
        )
        # residue columns must survive the read/attach to be filterable;
        # re-project to the caller's columns at the end
        read_want = want
        if want is not None and residue_terms:
            extra = [t[0] for t in residue_terms if t[0] not in want]
            if extra:
                read_want = want + extra
        groups: dict[tuple, list[DataFile]] = {}
        for f in files:
            groups.setdefault(tuple(f.partition.get(c) for c in pcols), []).append(f)
        parts: list[ray.data.Dataset] = []
        for vals, fs in sorted(groups.items(), key=lambda kv: str(kv[0])):
            flat = all(v is None for v in vals)  # pre-partitioning files
            data_cols = read_want if flat else (
                [c for c in read_want if c not in pcols]
                if read_want is not None else None
            )
            if data_cols is not None and not data_cols and not flat:
                # partition-column-ONLY projection: Hive files carry no
                # physical column to read, and a zero-column read has zero
                # rows — read one physical column as a row-count carrier
                # (dropped by the final select)
                phys = _footer_names(self.abs(fs[0].path))
                if phys:
                    data_cols = [phys[0]]
            # flat files (no Hive layout — e.g. adopted via add_files) still
            # carry the partition columns as DATA columns, so they must see
            # the FULL predicate; Hive-layout files lack those columns and get
            # only the row-level remainder (partition filtering happened at
            # prune_files via manifest partition values)
            d = ray.data.read_parquet(
                [self.abs(f.path) for f in fs],
                columns=data_cols,
                filter=predicate_to_expr(predicate if flat else row_pred),
                **read_kwargs,
            )
            attach = [] if flat else [
                (c, v) for c, v in zip(pcols, vals)
                if read_want is None or c in read_want
            ]
            if attach or read_want is not None:
                def fix(t: pa.Table, _attach=tuple(attach),
                        _want=tuple(read_want or ())) -> pa.Table:
                    for c, v in _attach:
                        t = t.append_column(c, pa.array([v] * len(t), pa.string()))
                    return t.select(list(_want)) if _want else t
                d = d.map_batches(fix, batch_format="pyarrow")
            parts.append(d)
        ds = parts[0]
        if len(parts) > 1:
            ds = ds.union(*parts[1:])
        if residue_terms:
            ds = ds.map_batches(
                _apply_predicate_batch,
                fn_kwargs={"predicate": list(residue_terms)},
                batch_format="pyarrow",
            )
            if read_want is not want and want is not None:
                ds = ds.map_batches(
                    lambda t, _w=tuple(want): t.select(list(_w)),
                    batch_format="pyarrow",
                )
        return ds

    # ---------------------------------------------------- merge-on-read deletes

    def _pending_deletes(self, snapshot_id: int | None = None) -> list[dict]:
        """Unapplied merge-on-read delete specs as of a snapshot (see
        :meth:`delete_where` mode="lazy").  Each spec is
        ``{"predicate": [[col, op, val], ...], "files": [paths]}``; the file
        lists are intersected with the snapshot's live files (paths dropped
        by later metadata-only deletes vanish from the spec)."""
        snap = (self.store.head() if snapshot_id is None
                else self.store.snapshot(snapshot_id))
        if snap is None:
            return []
        specs = (snap.summary or {}).get("deletes") or []
        if not specs:
            return []
        live = {f.path for f in self.files(snapshot_id)}
        out = []
        for s in specs:
            fs = [p for p in s["files"] if p in live]
            if fs:
                out.append({"predicate": s["predicate"], "files": fs})
        return out

    def _read_files_with_deletes(
        self,
        files: list[DataFile],
        specs: list[dict],
        columns: list[str] | None,
        predicate: Predicate | None,
        snapshot_id: int | None,
        **read_kwargs,
    ) -> "ray.data.Dataset":
        """Delete-aware read: files are grouped by WHICH pending delete specs
        cover them (usually one or two groups), each group reads through the
        normal path and gets its specs' inverted masks applied batch-side —
        rows matching a pending DELETE never leave the read stage.  Spec
        predicate columns missing from the caller's projection are read,
        masked on, and re-projected away."""
        spec_sets = [set(s["files"]) for s in specs]
        groups: dict[tuple, list[DataFile]] = {}
        for f in files:
            kk = tuple(i for i, ss in enumerate(spec_sets) if f.path in ss)
            groups.setdefault(kk, []).append(f)
        evo = self._evolution(snapshot_id)
        parts = []
        for kk, fs in sorted(groups.items()):
            read_cols = columns
            if kk and columns is not None:
                del_cols = sorted({
                    c for i in kk for (c, _o, _v) in specs[i]["predicate"]})
                extra = [c for c in del_cols if c not in columns]
                if extra:
                    read_cols = list(columns) + extra
            d = self._read_files(
                fs, columns=read_cols, predicate=predicate, evolution=evo,
                snapshot_id=snapshot_id, **read_kwargs,
            )
            for i in kk:
                d = d.map_batches(
                    _apply_inverted_predicate_batch,
                    fn_kwargs={"predicate": [tuple(t) for t
                                             in specs[i]["predicate"]]},
                    batch_format="pyarrow",
                )
            if kk and read_cols is not columns and columns is not None:
                d = d.map_batches(
                    lambda t, _w=tuple(columns): t.select(list(_w)),
                    batch_format="pyarrow",
                )
            parts.append(d)
        return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def scan(
        self,
        snapshot_id: int | None = None,
        columns: list[str] | None = None,
        predicate: Predicate | None = None,
        **read_kwargs,
    ) -> "ray.data.Dataset":
        """Snapshot-consistent scan: manifest prune (partition values + stats)
        -> pyarrow pushdown -> Dataset.  Pending merge-on-read delete specs
        (if any) mask their rows batch-side — logical content everywhere."""
        files = prune_files(self.files(snapshot_id), predicate)
        if not files:
            schema = self.schema(snapshot_id) or pa.schema([])
            if columns:
                # columns absent from the (possibly empty) schema come back
                # null-typed rather than raising
                schema = pa.schema(
                    [
                        schema.field(c)
                        if schema.get_field_index(c) >= 0
                        else pa.field(c, pa.null())
                        for c in columns
                    ]
                )
            return ray.data.from_arrow(schema.empty_table())
        specs = self._pending_deletes(snapshot_id)
        if specs:
            return self._read_files_with_deletes(
                files, specs, columns, predicate, snapshot_id, **read_kwargs
            )
        return self._read_files(
            files, columns=columns, predicate=predicate,
            evolution=self._evolution(snapshot_id), snapshot_id=snapshot_id,
            **read_kwargs,
        )

    def to_arrow(self, **kw) -> pa.Table:
        """Whole table as one Arrow table — small tables / tests only."""
        snap_id = kw.pop("snapshot_id", None)
        pred = kw.pop("predicate", None)
        files = prune_files(self.files(snap_id), pred)
        cols = kw.pop("columns", None)
        if not files:
            return (self.schema() or pa.schema([])).empty_table()
        evo = self._evolution(snap_id)
        specs = self._pending_deletes(snap_id)
        if any(f.partition for f in files) or evo is not None or specs:
            src = (
                self._read_files_with_deletes(files, specs, cols, pred, snap_id)
                if specs else
                self._read_files(files, columns=cols, predicate=pred,
                                 evolution=evo, snapshot_id=snap_id)
            )
            batches = list(
                src.iter_batches(batch_format="pyarrow", batch_size=None)
            )
            if not batches:  # every row filtered out
                sch = self.schema(snap_id) or pa.schema([])
                if cols:
                    sch = pa.schema([sch.field(c) for c in cols])
                return sch.empty_table()
            return pa.concat_tables(batches, promote_options="permissive")
        return pq.read_table(
            [self.abs(f.path) for f in files], columns=cols,
            filters=predicate_to_expr(pred),
        )

    # ------------------------------------------------------------ compaction

    def compact(
        self,
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
        min_files_per_bin: int = 2,
        predicate: Predicate | None = None,
    ) -> dict[str, Any]:
        """Bin-packing compaction: every bin is an independent Ray task
        (no shuffle — SURVEY.md §7.4), resumable per-bin via the ledger.
        ``predicate`` scopes the rewrite to matching files (per-partition
        compaction at large scale)."""
        self._materialize_if_pending(run_ts)
        files = prune_files(self.files(), predicate)
        evo = self._evolution()
        reconcile = None
        if evo is not None:
            spec, sjson = evo
            reconcile = {
                "schema_json": sjson,
                "renames": dict(spec.get("renames") or {}),
                "defaults": dict(spec.get("defaults") or {}),
                # partition columns stay OUT of the physical files (Hive
                # layout; manifest values re-attach them at scan) — writing
                # them null-filled would shadow the real values
                "want": tuple(c for c in _cached_schema(sjson).names
                              if c not in self.partition_cols),
            }
        # under an active evolution, every file still carrying a
        # pre-evolution physical schema is FORCED into the rewrite even if
        # it's already target-size — compact is the advertised remedy that
        # retires old rename-source names, so it must actually upgrade them.
        # Footer check is memoized per commit dir (one read per dir).
        force: set[str] = set()
        if reconcile is not None:
            logical = _cached_schema(reconcile["schema_json"])
            pcols_set = set(self.partition_cols)
            old_names = set(reconcile["renames"])
            dir_needs: dict[str, bool] = {}
            for f in files:
                key = f.path if os.path.isabs(f.path) else os.path.dirname(f.path)
                if key not in dir_needs:
                    dir_needs[key] = _needs_reconcile(
                        self.abs(f.path), logical, pcols_set, old_names
                    )
                if dir_needs[key]:
                    force.add(f.path)
        # bins never cross partition boundaries, so each output file keeps a
        # single (exact) partition value set in the manifest
        part_groups: dict[tuple, list[DataFile]] = {}
        for f in files:
            part_groups.setdefault(tuple(sorted(f.partition.items())), []).append(f)
        bins: list[list[DataFile]] = []
        for _k, fs in sorted(part_groups.items()):
            bins.extend(plan_bins(fs, target_file_bytes, min_files_per_bin, force=force))
        if not bins:
            out = {"bins": 0, "files_in": 0, "files_out": 0}
            if predicate is None and evo is not None:
                out["evolution_retired"] = self.retire_evolution(run_ts)
            return out
        job_id = job_id or f"compact-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op="compact", run_ts=run_ts)
        rel_dir, abs_dir = os.path.join("data", f"compacted-{job_id}"), None
        os.makedirs(self.abs(rel_dir), exist_ok=True)

        added: list[DataFile] = []
        removed: list[str] = []
        pending = []
        for i, members in enumerate(bins):
            key = f"bin-{i:06d}"
            out_rel = os.path.join(rel_dir, f"{key}.parquet")
            in_paths = [m.path for m in members]
            part = dict(members[0].partition)
            if ledger.is_completed(key) and os.path.exists(self.abs(out_rel)):
                r, b, s = parquet_footer_stats(self.abs(out_rel), self.stats_cols)
                added.append(DataFile(out_rel, r, b, partition=part, stats=s))
                removed.extend(in_paths)
                continue
            ledger.mark_running(key, in_paths)
            ref = _compact_bin.remote(
                [self.abs(p) for p in in_paths], self.abs(out_rel),
                self.stats_cols, reconcile,
            )
            pending.append((key, out_rel, in_paths, part, ref))

        for key, out_rel, in_paths, part, ref in pending:
            r, b, s = ray.get(ref)
            added.append(DataFile(out_rel, r, b, partition=part, stats=s))
            removed.extend(in_paths)
            ledger.mark_completed(
                key, in_paths, [out_rel], {"rows": r, "bytes": b, "files_in": len(in_paths)}
            )

        self.store.commit(
            added,
            removed,
            "compact",
            run_ts,
            summary={"bins": len(bins), "files_in": len(removed), "files_out": len(added)},
        )
        ledger.finish()
        out = {"bins": len(bins), "files_in": len(removed), "files_out": len(added)}
        if predicate is None and evo is not None:
            # an UNSCOPED compact may have rewritten the last pre-evolution
            # file; if so, clear the rename/default spec so the old names
            # become reusable (evolve_schema's advertised remedy)
            out["evolution_retired"] = self.retire_evolution(run_ts)
        return out

    # ------------------------------------------------------------ clustering

    def _column_vocab(
        self, col: str, files: list[DataFile], cap: int = 65536
    ) -> "np.ndarray | None":
        """Sorted distinct values of a string column IF low-cardinality.

        Probe the smallest file first (one column of one file); only when the
        probe looks dictionary-like run the distributed distinct over the
        scoped files.  High-cardinality columns (paths, ids) return None and
        fall back to prefix-stripped byte encoding."""
        return self._column_vocabs([col], files, cap=cap).get(col)

    def _column_vocabs(
        self, cols: list[str], files: list[DataFile], cap: int = 65536,
        n_probe_files: int = 4,
    ) -> dict[str, "np.ndarray"]:
        """Multi-column variant of :meth:`_column_vocab`, built WITHOUT a full
        data pass: the union of distinct values from up to ``n_probe_files``
        smallest files plus every file's manifest min/max.  A value missing
        from the vocab rank-encodes to its neighbor's rank — the encoding
        stays order-preserving (two adjacent values merely share a cluster
        cell), and pruning correctness is untouched because it reads the
        REAL post-write min/max stats, not the vocab.  This keeps zorder's
        key-prep cost at O(one small file per dim) at any table size."""
        probes = sorted(files, key=lambda f: f.bytes)[: max(1, n_probe_files)]
        out: dict[str, np.ndarray] = {}
        for col in cols:
            vals: set = set()
            accepted = True
            for i, pf in enumerate(probes):
                try:
                    probe = pq.read_table(self.abs(pf.path), columns=[col])
                except Exception:
                    accepted = False
                    break
                u = pc.unique(probe[col]).drop_null()
                if i == 0 and len(u) > min(
                    cap, max(1000, int(0.05 * max(1, probe.num_rows)))
                ):
                    accepted = False  # dictionary-unlike (paths, ids)
                    break
                vals.update(u.to_pylist())
            if not accepted or not vals:
                continue
            for f in files:
                st = f.stats.get(col) or {}
                for b in (st.get("min"), st.get("max")):
                    if isinstance(b, str):
                        vals.add(b)
            if len(vals) <= cap:
                out[col] = np.array(sorted(vals), dtype=object)
        return out

    def zorder(
        self,
        cols: Sequence[str],
        curve: str = "zorder",
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
        predicate: Predicate | None = None,
        method: str = "sort",
    ) -> dict[str, Any]:
        """Rewrite (part of) the table clustered by a bit-interleaved
        (Z/Hilbert) key.

        ``method="sort"`` (default): Ray Data's built-in range-shuffle
        ``Dataset.sort``.  ``method="range"``: explicit sample-sort — one
        histogram pass over the materialized keys picks skew-aware range
        boundaries, rows are range-partitioned into ~output-file-count
        groups and each group is sorted independently (Arrow
        ``sort_indices`` + ``take``); bounded driver state (<= 65536
        histogram cells) and no sampling re-execution, the robust plan for
        very large scoped partitions.  Measured A/B at 1.2M rows (see
        BASELINE.md round 3): the stage is FIXED-COST-bound at test scale
        (~2.5 s in the shuffle regardless of 4 vs 16 CPUs), "sort" wins by
        ~1.8x wall there, and both yield the same pruning fraction — so
        "sort" is the default and "range" the documented scale path.  Either
        way each output file covers a narrow key range in *all* clustered
        dimensions, so manifest min/max stats prune multi-column predicates.

        ``predicate`` scopes the rewrite: only matching files (manifest
        pruning) participate and everything else is untouched — at 10^12-file
        scale clustering runs per partition/key-range, never as one global
        table sort.
        """
        self._materialize_if_pending(run_ts)
        files = prune_files(self.files(), predicate)
        if not files:
            return {"files_in": 0, "files_out": 0}
        total_rows = sum(f.rows for f in files)
        total_bytes = sum(f.bytes for f in files)
        rows_per_file = max(1, int(target_file_bytes / max(1, total_bytes / max(1, total_rows))))
        keyfn = hilbert_key if curve == "hilbert" else zorder_key
        cols = list(cols)

        # per-dim encodings: sorted VOCAB (rank encode — equality distinctions
        # live in the top bits) for low-cardinality string dims; (min, max)
        # from manifest stats otherwise (numeric scaling / prefix strip)
        sch = self.schema()
        vocab_candidates = [
            c for c in cols
            if c not in self.partition_cols
            and sch is not None and sch.get_field_index(c) >= 0
            and (pa.types.is_string(sch.field(c).type)
                 or pa.types.is_large_string(sch.field(c).type))
        ]
        vocabs = self._column_vocabs(vocab_candidates, files) if vocab_candidates else {}
        bounds: list[Any] = []
        for c in cols:
            vocab = None
            if c in self.partition_cols:
                vals = sorted({f.partition[c] for f in files if c in f.partition})
                vocab = np.array(vals, dtype=object) if vals else None
            else:
                vocab = vocabs.get(c)
            if vocab is not None:
                bounds.append(vocab)
                continue
            mins = [f.stats[c]["min"] for f in files if f.stats.get(c, {}).get("min") is not None]
            maxs = [f.stats[c]["max"] for f in files if f.stats.get(c, {}).get("max") is not None]
            if mins and maxs:
                bounds.append((min(mins), max(maxs)))
            else:
                bounds.append(None)

        # leading-column-major bit allocation when the lead dim has a vocab:
        # ALL its rank bits first (single contiguous key range per value ->
        # real file pruning on equality scans), remaining dims interleaved —
        # z-curve via weights, hilbert via lead-major composition (lead_bits)
        key_kwargs: dict[str, Any] = {"bounds": bounds}
        if isinstance(bounds[0], np.ndarray) and len(cols) > 1:
            lead_bits = max(4, int(np.ceil(np.log2(len(bounds[0]) + 1))))
            if curve == "hilbert":
                key_kwargs["lead_bits"] = lead_bits
            else:
                rest = (63 - lead_bits) // (len(cols) - 1)
                key_kwargs["bits_per_dim"] = [lead_bits] + [rest] * (len(cols) - 1)
                key_kwargs["weights"] = [lead_bits] + [1] * (len(cols) - 1)

        def add_key(batch: pa.Table) -> pa.Table:
            k = keyfn([batch[c] for c in cols], **key_kwargs)
            return batch.append_column("__cluster_key", pa.array(k))

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        keyed = self._read_files(
            files, override_num_blocks=max(2 * ncpu, len(files))
        ).map_batches(add_key, batch_format="pyarrow")
        if method == "sort":
            ds = keyed.sort("__cluster_key").drop_columns(["__cluster_key"])
        else:
            ds = self._range_partition_sorted(
                keyed, ncpu=ncpu, total_rows=total_rows, rows_per_file=rows_per_file
            )
        job_id = job_id or f"{curve}-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op=curve, run_ts=run_ts)
        added = self._write_dataset(
            ds, max_rows_per_file=rows_per_file, min_rows_per_file=max(1, rows_per_file // 2)
        )
        removed = [f.path for f in files]
        ledger.mark_completed(
            "rewrite", removed, [f.path for f in added], {"rows": total_rows}
        )
        self.store.commit(
            added,
            removed,
            curve,
            run_ts,
            summary={"cluster_cols": cols, "files_out": len(added)},
        )
        ledger.finish()
        return {"files_in": len(removed), "files_out": len(added)}

    def _range_partition_sorted(
        self,
        keyed: "ray.data.Dataset",
        ncpu: int,
        total_rows: int,
        rows_per_file: int,
    ) -> "ray.data.Dataset":
        """Globally sorted dataset from a keyed one WITHOUT a global merge:

        1. materialize the keyed rows once (the shuffle re-reads them anyway);
        2. histogram the top 16 key bits (<= 65536 cells — bounded regardless
           of row count; zorder at 10^12-file scale is predicate-scoped per
           partition, so the per-run histogram stays small) with per-block
           vectorized partials;
        3. cut skew-aware range boundaries at ~output-file-size row targets;
        4. range-partition by boundary search, sort each partition
           independently (Arrow sort_indices+take — types preserved, no
           pandas round-trip).

        Partition ranges are disjoint and each partition is sorted, so block
        order == global key order; per-group sorts scale linearly with CPUs
        (the classic sample-sort, with the manifest-fed histogram replacing
        the sampling pass)."""
        keyed = keyed.materialize()

        # histogram resolution must track the ACTUAL key width: z-keys use
        # ~62 bits but hilbert / lead-major keys may use only 14-20, and a
        # fixed high shift would fold every key into one cell (degenerate
        # single partition).  One cheap vectorized max pass picks the shift
        # so the top <= 16 significant bits are histogrammed.
        def key_max(t: pa.Table) -> pa.Table:
            k = np.asarray(t["__cluster_key"].to_pandas(), np.uint64)
            mx = int(k.max()) if len(k) else 0
            return pa.table({"mx": pa.array([mx], pa.uint64())})

        mx = (
            keyed.select_columns(["__cluster_key"])
            .map_batches(key_max, batch_format="pyarrow")
            .to_pandas()["mx"].max()
        )
        shift = np.uint64(max(0, int(mx).bit_length() - 16))

        def coarse_hist(t: pa.Table) -> pa.Table:
            k = np.asarray(t["__cluster_key"].to_pandas(), np.uint64) >> shift
            uk, c = np.unique(k, return_counts=True)
            return pa.table(
                {
                    "coarse": pa.array(uk.astype(np.int64)),
                    "n": pa.array(c.astype(np.int64)),
                }
            )

        hist = (
            keyed.select_columns(["__cluster_key"])
            .map_batches(coarse_hist, batch_format="pyarrow")
            .to_pandas()
            .groupby("coarse")["n"].sum().sort_index()
        )
        n_parts = max(2 * ncpu, int(np.ceil(total_rows / max(1, rows_per_file))))
        target = max(1, total_rows // n_parts)
        cum = hist.cumsum()
        # boundary AFTER each coarse cell that crosses a multiple of target
        cuts = cum[(cum // target).diff().fillna(0) > 0].index.to_numpy()
        boundaries = cuts.astype(np.uint64)

        def assign_part(t: pa.Table) -> pa.Table:
            k = np.asarray(t["__cluster_key"].to_pandas(), np.uint64) >> shift
            part = np.searchsorted(boundaries, k, side="left").astype(np.int32)
            return t.append_column("__zpart", pa.array(part))

        def sort_group(t: pa.Table) -> pa.Table:
            idx = pc.sort_indices(t["__cluster_key"])
            return t.take(idx).drop_columns(["__cluster_key", "__zpart"])

        return (
            keyed.map_batches(assign_part, batch_format="pyarrow")
            .groupby("__zpart")
            .map_groups(sort_group, batch_format="pyarrow")
        )

    # ------------------------------------------------------------ stats rewrite

    def rewrite_stats(
        self, stats_cols: Iterable[str] | None = None, run_ts: str = "1970-01-01T00:00:00"
    ) -> Snapshot:
        """Manifest rewrite: recompute per-file min/max/null stats (footer-only
        metadata scan, fanned out as Ray tasks) and commit a new snapshot whose
        manifests carry them.  Data files are untouched."""
        if stats_cols is not None:
            self.config["stats_cols"] = list(stats_cols)
            with open(os.path.join(self.root, "table.json"), "w") as f:
                json.dump(self.config, f)
        files = self.files()
        abs_paths = [self.abs(f.path) for f in files]
        stats = collect_stats(abs_paths, self.stats_cols)
        refreshed = [
            DataFile(f.path, r, b, partition=f.partition, stats=s)
            for f, (r, b, s) in zip(files, stats)
        ]
        if self.bloom_cols:  # re-index so a stats rewrite never loses filters
            blooms = collect_blooms(
                abs_paths, self.bloom_cols, float(self.config.get("bloom_fpp", 0.02))
            )
            for f, bl in zip(refreshed, blooms):
                for c, b in bl.items():
                    f.stats.setdefault(c, {})["bloom"] = b
        return self.store.commit(
            refreshed,
            [f.path for f in files],
            "rewrite-stats",
            run_ts,
            summary={"stats_cols": list(self.stats_cols)},
        )

    def build_blooms(
        self,
        cols: Iterable[str],
        fpp: float = 0.02,
        run_ts: str = "1970-01-01T00:00:00",
    ) -> Snapshot:
        """Manifest rewrite adding a per-file Bloom filter on each of ``cols``
        (point-lookup file skipping on high-cardinality columns — the same
        capability Delta/Iceberg expose as bloom indexes; min/max stats are
        useless for ``==`` probes when every file's range spans the domain).

        Metadata-only: one Ray task per file chunk reads ONLY the indexed
        columns and ships back an O(rows_per_file)-bit bitset; data files are
        untouched.  Filters live in the manifest under ``stats[col]["bloom"]``
        and are probed by :func:`prune_files` on ``==`` / ``in`` predicates
        (no false negatives — a skip is a proof of absence).  The column list
        persists in table config so :meth:`rewrite_stats` re-indexes after
        maintenance; files rewritten by compact/zorder drop their filters
        until the next rebuild (conservative: no bloom -> no skip).

        Reference analog: the crawler's column-level metadata catalog
        (``terraform/main.tf:17-45``) — extended here to value-level skipping.
        """
        cols = list(cols)
        self.config["bloom_cols"] = cols
        self.config["bloom_fpp"] = float(fpp)
        with open(os.path.join(self.root, "table.json"), "w") as f:
            json.dump(self.config, f)
        files = self.files()
        blooms = collect_blooms([self.abs(f.path) for f in files], tuple(cols), fpp)
        refreshed = []
        for f, bl in zip(files, blooms):
            stats = {c: dict(v) for c, v in f.stats.items()}
            for c, b in bl.items():
                stats.setdefault(c, {})["bloom"] = b
            refreshed.append(
                DataFile(f.path, f.rows, f.bytes, partition=f.partition, stats=stats)
            )
        return self.store.commit(
            refreshed,
            [f.path for f in files],
            "build-blooms",
            run_ts,
            summary={"bloom_cols": cols, "fpp": float(fpp)},
        )

    # ------------------------------------------------------------ time travel

    def history(self) -> list[dict[str, Any]]:
        """Snapshot log (id, parent, ts, operation, summary), ascending."""
        return [
            {
                "snapshot_id": s.snapshot_id,
                "parent_id": s.parent_id,
                "ts": s.ts,
                "operation": s.operation,
                "summary": s.summary,
            }
            for s in self.store.snapshots()
        ]

    def rollback(self, snapshot_id: int, run_ts: str = "1970-01-01T00:00:00") -> Snapshot:
        """Restore the table to an older snapshot's state as a NEW commit
        (nothing is deleted — the rollback itself is time-travel-able; orphan
        GC only collects files once every referencing snapshot expires)."""
        target = self.store.snapshot(snapshot_id)
        current = self.store.files()
        restored = self.store.files(target)
        cur_paths = {f.path for f in current}
        res_paths = {f.path for f in restored}
        added = [f for f in restored if f.path not in cur_paths]
        removed = [p for p in cur_paths if p not in res_paths]
        return self.store.commit(
            added, removed, "rollback", run_ts,
            schema_json=target.schema_json,
            # restore the TARGET's spec state explicitly — commit() would
            # otherwise inherit the CURRENT head's evolution/pending-delete
            # specs, masking (or renaming) rows the restored snapshot had
            summary={
                "rolled_back_to": snapshot_id,
                "deletes": (target.summary or {}).get("deletes", []),
                "evolution": (target.summary or {}).get("evolution", {}),
            },
        )

    # ------------------------------------------------------------ expiry / GC

    def expire_snapshots(
        self, keep_last: int = 2, older_than: str | None = None
    ) -> list[int]:
        """Retention: keep the last ``keep_last`` published snapshots, plus
        (with ``older_than``, ISO-8601) everything newer than the bound, plus
        every staged-unpublished snapshot."""
        return self.store.expire(keep_last, older_than=older_than)

    # ------------------------------------------------------------ tags

    def tag_snapshot(self, name: str, snapshot_id: int | None = None) -> None:
        """Named ref -> snapshot id (Iceberg tag semantics): pin releases /
        eval sets ("train-v3") without holding a number.  Tagged snapshots
        never expire; retention walks the tag file."""
        sid = snapshot_id if snapshot_id is not None else self.store.head_id()
        self.store.snapshot(sid)  # validate it exists
        from aws_medallion_datalake_ray.state.manifest import atomic_write_json

        # RMW under the commit lock: an unlocked concurrent tagger could
        # silently drop the other's tag — and with it that snapshot's
        # retention pin against expire_snapshots
        with self.store.locked():
            tags = self.tags()
            tags[name] = sid
            atomic_write_json(os.path.join(self.store.dir, "tags.json"), tags)

    def drop_tag(self, name: str) -> None:
        from aws_medallion_datalake_ray.state.manifest import atomic_write_json

        with self.store.locked():
            tags = self.tags()
            tags.pop(name, None)
            atomic_write_json(os.path.join(self.store.dir, "tags.json"), tags)

    def tags(self) -> dict[str, int]:
        try:
            with open(os.path.join(self.store.dir, "tags.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def scan_tag(self, name: str, **kw) -> "ray.data.Dataset":
        return self.scan(snapshot_id=self.tags()[name], **kw)

    # ------------------------------------------------------------ branches

    def create_branch(self, name: str, at: int | None = None) -> int:
        """Create a named writable branch ref at ``at`` (default HEAD).
        Unlike a tag (read-only pin), a branch ADVANCES: every table op run
        through :meth:`branch` commits snapshots that move the branch
        pointer while main's HEAD — and every main reader — is untouched.
        This is the multi-commit generalization of WAP (stage_append covers
        one audited commit; a branch carries an audited SERIES: backfill →
        dedup → compact, then one :meth:`fast_forward`)."""
        return self.store.create_branch(name, at)

    def branch(self, name: str) -> "LakeTable":
        """A handle on the same table whose ref is branch ``name``: all ops
        (append / merge / delete / compact / zorder / scan / time travel)
        work unchanged, sharing data files, the snapshot tree, and the ONE
        table-wide commit lock with main."""
        from aws_medallion_datalake_ray.state.manifest import BranchStore

        t = LakeTable(self.root)
        t.store = BranchStore(self.root, name)
        return t

    def branches(self) -> dict[str, int]:
        return self.store.refs()

    def drop_branch(self, name: str) -> None:
        self.store.drop_branch(name)

    def fast_forward(self, name: str) -> Snapshot:
        """Adopt branch ``name`` on main (HEAD must be an ancestor of the
        branch head — i.e. main did not advance since the fork; otherwise
        :class:`CommitConflict` and the branch must be rebased by replaying
        its ops on current HEAD)."""
        return self.store.fast_forward(name)

    # ------------------------------------------------------ write-audit-publish

    def stage_append(self, data, run_ts: str = "1970-01-01T00:00:00") -> Snapshot:
        """WAP step 1: write + commit a snapshot WITHOUT moving HEAD.
        Readers keep the current table; auditors validate via
        ``scan(snapshot_id=staged.snapshot_id)`` /
        ``content_checksum(..., snapshot_id=...)``; then :meth:`publish` or
        :meth:`drop_staged`.  Generalizes the reference's audit-free direct
        overwrite (``silver_digit_clean.py:127``) where bad loads hit
        consumers instantly."""
        data = self._constrained(data)
        schema = self._data_schema(data) if self.partition_cols else None
        added = self._write_dataset(data)
        if self._evolution() is not None:
            schema_json = None
        elif schema is not None:
            schema_json = _schema_to_json(schema)
        else:
            schema_json = self._file_schema(added)
        return self.store.commit(
            added, [], "stage-append", run_ts, schema_json=schema_json, stage=True
        )

    def publish(self, snapshot_id: int) -> Snapshot:
        """WAP step 3: atomically point HEAD at an audited staged snapshot."""
        return self.store.publish(snapshot_id)

    def drop_staged(self, snapshot_id: int) -> None:
        """Abandon a staged snapshot; its files become GC-able orphans."""
        self.store.drop_staged(snapshot_id)

    def gc_orphans(self, dry_run: bool = False) -> list[str]:
        """Delete data files unreachable from any live snapshot AND not
        referenced by a running job's ledger (in-flight outputs stay).
        ``dry_run=True`` returns the would-be-deleted list without touching
        anything — the audit step before a large vacuum."""
        reachable: set[str] = set()
        for snap in self.store.snapshots():
            reachable.update(f.path for f in self.store.files(snap))
        reachable |= Ledger.active_output_files(self.root)
        deleted: list[str] = []
        for dirpath, _dirnames, filenames in os.walk(self.data_dir):
            for name in filenames:
                abs_p = os.path.join(dirpath, name)
                rel = os.path.relpath(abs_p, self.root)
                if rel not in reachable:
                    if not dry_run:
                        os.unlink(abs_p)
                    deleted.append(rel)
        if dry_run:
            return deleted
        # prune empty commit dirs
        for dirpath, dirnames, filenames in list(os.walk(self.data_dir, topdown=False)):
            if not dirnames and not filenames and dirpath != self.data_dir:
                os.rmdir(dirpath)
        return deleted

    def delete_where(
        self,
        predicate: Predicate,
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
        mode: str = "copy-on-write",
    ) -> dict[str, Any]:
        """DELETE FROM t WHERE <conjunctive predicate> — copy-on-write with
        two pruning tiers:

        1. files the manifest PROVES fully match (partition values / min-max
           cover every term) drop with NO data IO — the metadata-only path
           that makes partition-scoped deletes O(manifest) at 100 TB;
        2. files that may partially match rewrite through an inverted
           filter; everything else is untouched.

        ``mode="lazy"`` is MERGE-ON-READ (Iceberg-v2 delete semantics): the
        fully-covered files still drop metadata-only, but partially-matching
        files are NOT rewritten — the predicate is recorded as a pending
        delete spec on the snapshot chain and every scan masks those rows
        batch-side.  The whole DELETE is O(manifest) regardless of how many
        rows match; :meth:`apply_pending_deletes` (or any data-rewriting op,
        which auto-materializes first) later folds the masks into files.
        At 100 TB this turns scattered-row deletes from a table rewrite
        into a metadata commit + pay-as-you-scan masks."""
        if not predicate:
            raise ValueError("delete_where requires a predicate")
        if mode == "copy-on-write":
            self._materialize_if_pending(run_ts)
        files = self.files()
        candidates = prune_files(files, predicate)
        full = [f for f in candidates if predicate_covers_file(f, predicate)]
        partial = [f for f in candidates if not predicate_covers_file(f, predicate)]
        if not candidates:
            return {"rows_deleted": 0, "files_dropped": 0, "files_rewritten": 0}
        if mode == "lazy":
            from aws_medallion_datalake_ray.state.manifest import CommitConflict

            # the "deletes" list is a read-modify-write of snapshot summary
            # state: committing blind would let two racing lazy deletes drop
            # each other's spec (and RESURRECT rows) — serialize through the
            # optimistic parent check and recompute on conflict
            for _ in range(16):
                head = self.store.head()
                candidates = prune_files(self.files(), predicate)
                full = [f for f in candidates
                        if predicate_covers_file(f, predicate)]
                partial = [f for f in candidates
                           if not predicate_covers_file(f, predicate)]
                spec = {
                    "predicate": [list(t) for t in predicate],
                    "files": [f.path for f in partial],
                }
                pending = self._pending_deletes()
                if partial:
                    pending = pending + [spec]
                try:
                    self.store.commit(
                        [], [f.path for f in full], "delete-lazy", run_ts,
                        expected_parent=head.snapshot_id if head else None,
                        summary={
                            "deletes": pending,
                            "files_dropped_metadata_only": len(full),
                            "files_masked": len(partial),
                        },
                    )
                    break
                except CommitConflict:
                    continue
            else:
                raise CommitConflict("delete-lazy: too many concurrent commits")
            return {
                "rows_deleted_metadata_only": sum(f.rows for f in full),
                "files_dropped": len(full),
                "files_masked": len(partial),
                "files_rewritten": 0,
                "pending_specs": len(pending),
            }
        job_id = job_id or f"delete-where-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op="delete-where", run_ts=run_ts)
        added: list[DataFile] = []
        rows_partial_in = sum(f.rows for f in partial)
        rows_out = 0
        if partial:
            survivors = self._read_files(partial).map_batches(
                _apply_inverted_predicate_batch,
                fn_kwargs={"predicate": list(predicate)},
                batch_format="pyarrow",
            )
            added = self._write_dataset(
                survivors, min_rows_per_file=self._coalesce_rows_target(partial)
            )
            rows_out = sum(f.rows for f in added)
        removed = [f.path for f in full] + [f.path for f in partial]
        rows_deleted = sum(f.rows for f in full) + (rows_partial_in - rows_out)
        ledger.mark_completed(
            "delete-where", removed, [f.path for f in added],
            {"rows_deleted": rows_deleted},
        )
        self.store.commit(
            added, removed, "delete-where", run_ts,
            schema_json=self._commit_file_schema(added),
            summary={"rows_deleted": rows_deleted,
                     "files_dropped_metadata_only": len(full)},
        )
        ledger.finish()
        return {"rows_deleted": rows_deleted, "files_dropped": len(full),
                "files_rewritten": len(partial), "files_out": len(added)}

    def apply_pending_deletes(
        self, run_ts: str = "1970-01-01T00:00:00", job_id: str | None = None
    ) -> dict[str, Any]:
        """Materialize every pending merge-on-read delete spec: files are
        grouped by WHICH specs cover them, each group rewrites once through
        the composed inverted masks, and the committing snapshot retires the
        specs (explicit ``deletes: []``).  The delete-compaction half of the
        lazy-DELETE contract — scans before this see identical logical
        content via batch-side masks."""
        specs = self._pending_deletes()
        if not specs:
            return {"specs_applied": 0, "files_rewritten": 0}
        head = self.store.head()
        live = {f.path: f for f in self.files()}
        spec_sets = [set(s["files"]) for s in specs]
        groups: dict[tuple, list[DataFile]] = {}
        for p, f in live.items():
            kk = tuple(i for i, ss in enumerate(spec_sets) if p in ss)
            if kk:
                groups.setdefault(kk, []).append(f)
        job_id = job_id or f"apply-deletes-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op="apply-deletes", run_ts=run_ts)
        added_all: list[DataFile] = []
        removed_all: list[str] = []
        for kk, fs in sorted(groups.items()):
            ds = self._read_files(fs)
            for i in kk:
                ds = ds.map_batches(
                    _apply_inverted_predicate_batch,
                    fn_kwargs={"predicate": [tuple(t) for t
                                             in specs[i]["predicate"]]},
                    batch_format="pyarrow",
                )
            added = self._write_dataset(
                ds, min_rows_per_file=self._coalesce_rows_target(fs))
            added_all.extend(added)
            removed_all.extend(f.path for f in fs)
        rows_deleted = (sum(live[p].rows for p in removed_all)
                        - sum(f.rows for f in added_all))
        ledger.mark_completed("apply-deletes", removed_all,
                              [f.path for f in added_all],
                              {"rows_deleted": rows_deleted})
        # retiring specs with an explicit deletes=[] must not wipe a spec a
        # CONCURRENT lazy delete added after ours were read: the optimistic
        # parent check turns that race into a CommitConflict (outputs are
        # unreferenced and GC as orphans; caller retries the whole op)
        self.store.commit(
            added_all, removed_all, "apply-deletes", run_ts,
            expected_parent=head.snapshot_id if head else None,
            schema_json=self._commit_file_schema(added_all) or (
                _schema_to_json(self.schema()) if self.schema() else None
            ),
            summary={"deletes": [], "rows_deleted": rows_deleted,
                     "specs_applied": len(specs)},
        )
        ledger.finish()
        return {"specs_applied": len(specs),
                "files_rewritten": len(removed_all),
                "rows_deleted": rows_deleted,
                "files_out": len(added_all)}

    def _materialize_if_pending(self, run_ts: str) -> None:
        """Data-rewriting ops call this first: rewriting a file that a
        pending delete spec covers would RESURRECT its masked rows (the new
        path is not in the spec's file list), so pending specs must fold
        into files before any rewrite.  No-op when none are pending."""
        if self._pending_deletes():
            self.apply_pending_deletes(run_ts=run_ts)

    def update_where(
        self,
        predicate: Predicate,
        set_values: dict[str, Any],
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
    ) -> dict[str, Any]:
        """UPDATE t SET col=const, ... WHERE <predicate> — the last DML verb
        (INSERT=append, UPSERT=merge, DELETE=delete_where/delete_keys):
        stats-pruned copy-on-write, matching rows get the constants via one
        vectorized ``if_else`` per column, non-matching rows pass through
        byte-identical.  Partition columns cannot be SET (that is a MOVE
        between partitions — express it as delete_where + append)."""
        if not predicate:
            raise ValueError("update_where requires a predicate")
        bad = set(set_values) & set(self.partition_cols)
        if bad:
            raise ValueError(f"cannot SET partition column(s) {sorted(bad)}")
        sch = self.schema()
        missing = [c for c in set_values
                   if sch is None or sch.get_field_index(c) < 0]
        if missing:
            raise KeyError(f"SET column(s) not in schema: {sorted(missing)}")
        touched = [t for t in self.constraints if t[0] in set_values]
        if touched:  # SET constants are checkable before any IO
            _check_constraint_batch(
                pa.table({c: pa.array([v]) for c, v in set_values.items()
                          if any(t[0] == c for t in touched)}), touched)
        self._materialize_if_pending(run_ts)
        affected = prune_files(self.files(), predicate)
        if not affected:
            return {"rows_updated": 0, "files_rewritten": 0}
        job_id = job_id or f"update-where-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op="update-where", run_ts=run_ts)

        # exact match count first: a column-pruned, predicate-pushed read
        # over the affected files only (touches the predicate columns)
        pred_cols = sorted({c for c, _o, _v in predicate})
        rows_updated = self._read_files(
            affected, columns=pred_cols, predicate=predicate
        ).count()
        if rows_updated == 0:  # stats kept the files but no row matches
            ledger.finish()
            return {"rows_updated": 0, "files_rewritten": 0}

        def apply(t: pa.Table, _pred=list(predicate), _set=dict(set_values)) -> pa.Table:
            mask = pc.fill_null(_predicate_mask(t, _pred), False)
            for col, val in _set.items():
                idx = t.schema.get_field_index(col)
                typ = t.schema.field(col).type
                t = t.set_column(
                    idx, col, pc.if_else(mask, pa.scalar(val, typ), t.column(idx))
                )
            return t

        added = self._write_dataset(
            self._read_files(affected).map_batches(apply, batch_format="pyarrow"),
            min_rows_per_file=self._coalesce_rows_target(affected),
        )
        removed = [f.path for f in affected]
        ledger.mark_completed("update-where", removed, [f.path for f in added], {})
        self.store.commit(
            added, removed, "update-where", run_ts,
            schema_json=self._commit_file_schema(added),
            summary={"set_cols": sorted(set_values)},
        )
        ledger.finish()
        return {"rows_updated": rows_updated, "files_rewritten": len(affected),
                "files_out": len(added)}

    def maintain(
        self,
        run_ts: str = "1970-01-01T00:00:00",
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        small_file_threshold: int = 8,
        stats_coverage: float = 0.5,
        keep_last: int = 3,
        predicate: Predicate | None = None,
    ) -> dict[str, Any]:
        """Policy-driven maintenance autopilot — the one-call version of the
        north-rule suite, deciding per policy what actually needs to run
        (the reference has no equivalent; every Glue run rewrote everything,
        ``silver_digit_clean.py:127``):

        - compact when more than ``small_file_threshold`` files sit below
          80% of the target size (bin-packing is a no-op otherwise);
        - rewrite stats when fewer than ``stats_coverage`` of files carry
          min/max bounds for the configured stats columns;
        - always expire beyond ``keep_last`` and GC orphans (cheap,
          metadata-only + unreferenced files).

        Returns the actions taken with their per-op results.  ``predicate``
        scopes the file-level checks and rewrites (per-partition autopilot
        at many-partition scale).  Zorder is intentionally NOT automatic —
        clustering choice is a modeling decision (columns + curve), invoked
        explicitly."""
        actions: dict[str, Any] = {}
        files = prune_files(self.files(), predicate)
        if not files:
            return {"skipped": "empty table"}
        small = [f for f in files if f.bytes < int(target_file_bytes * 0.8)]
        if len(small) > small_file_threshold:
            actions["compact"] = self.compact(
                target_file_bytes=target_file_bytes, run_ts=run_ts,
                predicate=predicate,
            )
        files = prune_files(self.files(), predicate)
        sch = self.schema()
        # only stats columns that exist in the table schema count toward
        # coverage (config may list columns some tables don't carry)
        scols = tuple(
            c for c in self.stats_cols
            if sch is None or sch.get_field_index(c) >= 0
        )
        covered = sum(
            1 for f in files
            if all(f.stats.get(c, {}).get("min") is not None for c in scols)
            # bloom coverage counts too: compact/merge rewrite files WITHOUT
            # filters (conservative), so a maintained bloom-indexed table
            # re-indexes here (rewrite_stats rebuilds configured blooms)
            and all(f.stats.get(c, {}).get("bloom") is not None
                    for c in self.bloom_cols
                    if sch is None or sch.get_field_index(c) >= 0)
        )
        if scols and files and covered / len(files) < stats_coverage:
            snap = self.rewrite_stats(run_ts=run_ts)
            actions["rewrite_stats"] = {"snapshot_id": snap.snapshot_id,
                                        "coverage_before": round(covered / len(files), 3)}
        expired = self.expire_snapshots(keep_last=keep_last)
        deleted = self.gc_orphans()
        actions["expire"] = {"snapshots_expired": len(expired),
                             "orphans_deleted": len(deleted)}
        return actions

    # ------------------------------------------------------------ MERGE INTO

    def merge(
        self,
        updates: "ray.data.Dataset | pa.Table",
        key: Sequence[str] = SOURCE_FILES_KEY,
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
        dedup_partitions: int = 64,
        strategy: str = "auto",
        broadcast_threshold: int = 2_000_000,
        broadcast_key_bytes: int = 256 << 20,
    ) -> dict[str, Any]:
        """MERGE INTO (upsert on ``key``): updates win on key collisions,
        new keys insert, exact re-sends are idempotent no-ops.

        Two physical plans:

        - **broadcast** (default when the update key set fits the object
          store): stream ONLY the key columns to the driver, build one sorted
          fixed-width key array, ``ray.put`` it, anti-join the stats-pruned
          affected base files against it — no shuffle at all.  Hashing the
          full (repo,path,commit) triple is what de-skews Zipf-hot repos.
        - **partitioned** (``merge_partitioned``; huge update sides): a true
          salted hash join — both sides co-partitioned on
          ``hash(key) % P``, per-partition vectorized resolution, update
          wins.

        ``strategy``: "auto" — broadcast only while the update key set fits
        BOTH a row-count budget (``broadcast_threshold``) and a key-byte
        budget (``broadcast_key_bytes``, estimated from one sampled batch's
        joined-key width: 2M narrow keys broadcast fine, 2M kilobyte-wide
        keys must not squeeze through the driver heap) — or "broadcast" /
        "partitioned" to force.
        """
        key = tuple(key)
        self._materialize_if_pending(run_ts)
        # cleared on EVERY merge entry (incl. partitioned/empty paths) so a
        # stale broadcast profile never misattributes; broadcast plan fills it
        phases: dict[str, float] = {}
        self.last_op_timings = phases
        updates = self._constrained(updates)  # CHECK terms gate the update side
        if isinstance(updates, pa.Table):
            n_raw = updates.num_rows  # known — skip a full count() pass
            updates = ray.data.from_arrow(updates)
        else:
            n_raw = updates.count()
        too_big = n_raw > broadcast_threshold
        if strategy == "auto" and not too_big and n_raw:
            # byte-budget the key broadcast: estimate total joined-key bytes
            # from ONE batch's average key width (keys are homogeneous-width
            # in practice; the count budget alone is blind to kilobyte keys)
            try:
                probe = next(iter(
                    (updates if isinstance(updates, ray.data.Dataset)
                     else ray.data.from_arrow(updates))
                    .select_columns(list(key))
                    .iter_batches(batch_size=1024, batch_format="pyarrow")
                ))
                avg_w = (sum(len(s.encode("utf-8"))
                             for s in _join_keys(probe, key)) / max(1, len(probe)))
                too_big = n_raw * avg_w > broadcast_key_bytes
            except StopIteration:
                pass
        if strategy == "partitioned" or (strategy == "auto" and too_big):
            return self.merge_partitioned(
                updates, key=key, run_ts=run_ts, job_id=job_id,
                num_partitions=dedup_partitions,
            )
        # the broadcast path re-reads the update stream up to 3x (keys, dup
        # split, final union); pin it in the object store once
        _pt = time.perf_counter()
        updates = updates.materialize()

        # --- collect update keys (key columns only; content never moves).
        # The join + utf-8 encode runs DISTRIBUTED (it was the serial Amdahl
        # slice of the broadcast plan: ~6.5 s of a 17 s merge at 16 CPUs as a
        # driver loop); the driver only receives (bytes, len, first-col) rows
        # and uniques a fixed-width C array.
        def _prep_keys(t: pa.Table) -> pa.Table:
            kb = pa.array(_join_keys(t, key), type=pa.large_string()).cast(
                pa.large_binary()  # zero-copy: utf-8 bytes of the joined key
            )
            return pa.table(
                {
                    "kb": kb,
                    "klen": pc.binary_length(kb).cast(pa.int32()),
                    # NATIVE type: file pruning compares these against parquet
                    # footer stats (int vs int, str vs str) — a string cast
                    # here would break pruning for non-string first keys
                    "first": t[key[0]],
                }
            )

        kdf = (
            updates.select_columns(list(key))
            # batch_size bundles the (often ~200) small input blocks into a
            # few tasks — per-task overhead beat the parallelism win without it
            .map_batches(_prep_keys, batch_format="pyarrow", batch_size=65536)
            .to_pandas()
        )
        if len(kdf) == 0:
            return {"updates": 0, "affected_files": 0}
        lens_all = kdf["klen"].to_numpy(np.int32)
        fixed_all = np.array(
            kdf["kb"].to_numpy(dtype=object), dtype=f"S{max(1, int(lens_all.max()))}"
        )
        uniq, first_idx, counts = np.unique(
            fixed_all, return_index=True, return_counts=True
        )
        uniq_lens = lens_all[first_idx]
        n_updates = int(len(uniq))
        keys_ref = ray.put(np.ascontiguousarray(uniq))
        lens_ref = ray.put(np.ascontiguousarray(uniq_lens))

        # --- dedup the update stream WITHOUT a shuffle: exact-dup keys are
        # rare in practice (and a duplicate (repo,path,commit) implies
        # identical content, so keep-any is correct); drop dup-key rows on
        # the workers and re-insert one driver-deduped copy of each.  A
        # pathologically dup-heavy huge stream falls back to the
        # hash-partitioned shuffle dedup.
        dup_mask = counts > 1
        if dup_mask.any():
            if int(dup_mask.sum()) > max(1_000_000, 0.5 * n_updates):
                updates = exact_dedup(updates, key, num_partitions=dedup_partitions)
            else:
                dup_ref = ray.put(np.ascontiguousarray(uniq[dup_mask]))
                dup_lens_ref = ray.put(np.ascontiguousarray(uniq_lens[dup_mask]))
                clean = updates.map_batches(
                    _anti_join_batch,
                    fn_kwargs={"keys_ref": dup_ref, "lens_ref": dup_lens_ref,
                               "key_cols": key},
                    batch_format="pyarrow",
                )
                dup_rows = updates.map_batches(
                    _semi_join_batch,
                    fn_kwargs={"keys_ref": dup_ref, "lens_ref": dup_lens_ref,
                               "key_cols": key},
                    batch_format="pyarrow",
                ).to_pandas()
                dup_rows = dup_rows.drop_duplicates(list(key))
                updates = clean.union(
                    ray.data.from_arrow(pa.Table.from_pandas(dup_rows, preserve_index=False))
                )
        upd_first = np.unique(kdf["first"].to_numpy(dtype=object))
        phases["keys"] = round(time.perf_counter() - _pt, 3)
        _pt = time.perf_counter()

        # --- prune base files via first-key-column stats (+ manifest bloom
        # probe when build_blooms indexed the key column)
        affected = _files_for_first_keys(self.files(), key[0], upd_first)

        job_id = job_id or f"merge-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op="merge", run_ts=run_ts)
        ledger.mark_running("merge", [f.path for f in affected])

        schema = self.schema()
        if schema is not None:
            # the dedup stage round-trips through pandas, which downgrades
            # large_string -> string; restore the table schema before the
            # union (large_string guards 2 GiB Arrow offsets on wide content)
            def cast_to_table_schema(batch: pa.Table) -> pa.Table:
                return batch.select(schema.names).cast(schema)

            updates = updates.map_batches(cast_to_table_schema, batch_format="pyarrow")
        if affected:
            survivors = self._read_files(affected).map_batches(
                _anti_join_batch,
                fn_kwargs={"keys_ref": keys_ref, "lens_ref": lens_ref, "key_cols": key},
                batch_format="pyarrow",
            )
            if schema is not None:
                survivors = survivors.select_columns(schema.names)
            result = survivors.union(updates)
        else:
            result = updates

        added = self._write_dataset(
            result, min_rows_per_file=self._coalesce_rows_target(affected)
        )
        phases["antijoin_write"] = round(time.perf_counter() - _pt, 3)
        _pt = time.perf_counter()
        removed = [f.path for f in affected]
        ledger.mark_completed(
            "merge",
            removed,
            [f.path for f in added],
            {"updates": n_updates, "affected_files": len(affected)},
        )
        self.store.commit(
            added,
            removed,
            "merge",
            run_ts,
            schema_json=self._commit_file_schema(added),
            summary={"updates": n_updates, "affected_files": len(affected)},
        )
        ledger.finish()
        phases["commit"] = round(time.perf_counter() - _pt, 3)
        return {
            "updates": n_updates,
            "affected_files": len(affected),
            "files_out": len(added),
        }

    def merge_partitioned(
        self,
        updates: "ray.data.Dataset",
        key: Sequence[str] = SOURCE_FILES_KEY,
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
        num_partitions: int = 64,
        skew_guard: "bool | str" = "auto",
        runtime_filter: "bool | str" = "auto",
    ) -> dict[str, Any]:
        """MERGE INTO for huge update sides: salted hash join.

        Both sides are co-partitioned on ``hash(key triple) % P`` (the full
        triple hash scatters a hot repo's rows uniformly — built-in salting),
        then each partition resolves update-wins with one vectorized
        ``drop_duplicates``.  Base files are pruned to those whose first-key
        min/max range intersects the distinct update key prefix set (computed
        distributed via ``Dataset.unique`` — never the full key list on the
        driver).

        ``skew_guard``: the one skew the triple hash CANNOT scatter is many
        update rows sharing one IDENTICAL key triple (a re-sent hot entity)
        — they all land in one partition (hot first-keys with distinct
        suffixes are already scattered).  Duplicate update keys resolve
        keep-any, so collapsing them inside each batch BEFORE the shuffle is
        semantics-free and removes the skew at the source.  ``"auto"`` runs
        a Misra-Gries ``hot_keys`` pre-pass over the JOINED key triple (one
        streaming aggregate, O(k) driver state) and enables the in-batch
        combiner only when one triple holds >=5% of the stream; True/False
        force it on/off.

        ``runtime_filter``: bloom-prefilter the base side so rows whose key
        triple provably has no update bypass the resolve shuffle ("auto" =
        only on multi-node clusters where the shuffle costs network;
        True/False force)."""
        key = tuple(key)
        self._materialize_if_pending(run_ts)
        n_updates = updates.count()
        if n_updates == 0:
            return {"updates": 0, "affected_files": 0}

        hot: list = []
        if skew_guard == "auto":
            from aws_medallion_datalake_ray.functions.sketches import hot_keys

            probe = updates.map_batches(
                lambda t, _k=key: pa.table(
                    {"__k": pa.array(_join_keys(t, _k))}),
                batch_format="pyarrow",
            )
            hot = hot_keys(probe, "__k", k=16, min_share=0.05)
        pre_dedup = bool(hot) if skew_guard == "auto" else bool(skew_guard)
        if pre_dedup:
            key_list_pd = list(key)
            updates = updates.map_batches(
                lambda df, _k=key_list_pd: df.drop_duplicates(_k, keep="last"),
                batch_format="pandas",
            )

        # distributed distinct of the first key column for file pruning
        # (+ manifest bloom probe when build_blooms indexed the key column)
        upd_first = np.array(sorted(updates.unique(key[0])), dtype=object)
        affected = _files_for_first_keys(self.files(), key[0], upd_first)

        job_id = job_id or f"merge-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op="merge-partitioned", run_ts=run_ts)
        ledger.mark_running("merge", [f.path for f in affected])

        schema = self.schema()

        def tag_and_part(src: int):
            def fn(batch: pa.Table) -> pa.Table:
                from aws_medallion_datalake_ray.functions.hashing import (
                    hash_batch_cols,
                    salted_partition,
                )

                h = hash_batch_cols(batch, key)
                part = salted_partition(h, num_partitions)
                batch = batch.append_column("__src", pa.array(np.full(len(batch), src, np.int8)))
                return batch.append_column("__part", pa.array(part))

            return fn

        upd_tagged = updates.map_batches(tag_and_part(1), batch_format="pyarrow")
        neg_base = None
        if affected:
            base_raw = self._read_files(affected)
            # Bloom runtime filter: base rows whose key triple bloom-misses
            # the update key set are PROVEN un-updated — they bypass the
            # resolve shuffle and stream straight to the writer.  Shuffle
            # volume drops from |affected rows| + |updates| to
            # |updated rows| + fpp x |affected| + |updates| (sparse updates
            # against big files are the common merge at scale).  Same
            # discipline as _delete_keys_partitioned; no false negatives.
            from aws_medallion_datalake_ray.functions.bloom import (
                bloom_contains, dataset_key_bloom, value_hashes)

            use_rf = (runtime_filter is True
                      or (runtime_filter == "auto" and _multi_node()))
            upd_keys = updates.map_batches(
                lambda t, _k=key: pa.table(
                    {"__k": pa.array(_join_keys(t, _k), pa.string())}),
                batch_format="pyarrow",
            )
            bloom = dataset_key_bloom(upd_keys, "__k", n_updates) \
                if use_rf else None
            if bloom is not None:
                bits, m_bits, k_hashes = bloom
                bits_ref = ray.put(bits)

                def bloom_tag(t: pa.Table) -> pa.Table:
                    b = ray.get(bits_ref)  # zero-copy plasma view
                    hit = bloom_contains(
                        b, value_hashes(_join_keys(t, key)), m_bits, k_hashes)
                    return t.append_column("__bh", pa.array(hit.astype(np.int8)))

                def take_route(t: pa.Table, positive: bool) -> pa.Table:
                    mask = pc.equal(t["__bh"], 1 if positive else 0)
                    return t.filter(mask).drop_columns(["__bh"])

                # read + hash once; routing passes read plasma, not parquet
                tagged = base_raw.map_batches(
                    bloom_tag, batch_format="pyarrow").materialize()
                neg_base = tagged.map_batches(
                    take_route, fn_kwargs={"positive": False},
                    batch_format="pyarrow")
                base_raw = tagged.map_batches(
                    take_route, fn_kwargs={"positive": True},
                    batch_format="pyarrow")
            base_tagged = base_raw.map_batches(
                tag_and_part(0), batch_format="pyarrow"
            )
            if schema is not None:
                order = schema.names + ["__src", "__part"]
                upd_tagged = upd_tagged.select_columns(order)
                base_tagged = base_tagged.select_columns(order)
            both = base_tagged.union(upd_tagged)
        else:
            both = upd_tagged

        key_list = list(key)

        def resolve(df):
            # stable sort puts base (0) before updates (1); keep='last' makes
            # the update win; duplicate update keys resolve to keep-any
            df = df.sort_values("__src", kind="stable")
            return df.drop_duplicates(key_list, keep="last").drop(
                columns=["__src", "__part"]
            )

        result = both.groupby("__part").map_groups(resolve, batch_format="pandas")
        if schema is not None:
            def cast_back(batch: pa.Table) -> pa.Table:
                return batch.select(schema.names).cast(schema)

            result = result.map_batches(cast_back, batch_format="pyarrow")
            if neg_base is not None:
                neg_base = neg_base.map_batches(cast_back, batch_format="pyarrow")
        if neg_base is not None:  # proven-unchanged rows skip the shuffle
            result = result.union(neg_base)
            # re-bundle (split/merge, no all-to-all) so the two-branch union
            # cannot fragment the output files
            est_rows = sum(f.rows for f in affected) + int(n_updates)
            result = result.repartition(
                max(1, est_rows // self._coalesce_rows_target(affected) + 1)
            )

        added = self._write_dataset(
            result, min_rows_per_file=self._coalesce_rows_target(affected)
        )
        removed = [f.path for f in affected]
        ledger.mark_completed(
            "merge", removed, [f.path for f in added],
            {"updates": n_updates, "affected_files": len(affected)},
        )
        self.store.commit(
            added, removed, "merge", run_ts,
            schema_json=self._commit_file_schema(added),
            summary={"updates": n_updates, "affected_files": len(affected),
                     "strategy": "partitioned+bloom" if neg_base is not None
                     else "partitioned"},
        )
        ledger.finish()
        return {
            "updates": n_updates,
            "affected_files": len(affected),
            "files_out": len(added),
            "skew_pre_dedup": pre_dedup,
            "hot_keys": [v for v, _c in hot[:4]],
            "strategy": "partitioned+bloom" if neg_base is not None
            else "partitioned",
        }

    # ------------------------------------------------------------ near-dup removal

    def delete_keys(
        self,
        removal_keys: "np.ndarray | list[str] | ray.data.Dataset",
        key: Sequence[str] = SOURCE_FILES_KEY,
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
        operation: str = "delete",
        broadcast_threshold: int = 2_000_000,
        strategy: str = "auto",
        runtime_filter: "bool | str" = "auto",
    ) -> dict[str, Any]:
        """Copy-on-write DELETE of the rows whose joined key string is in
        ``removal_keys``.  Two physical plans (mirror of :meth:`merge`):

        - **broadcast** (key set fits the object store): sorted fixed-width
          key array ``ray.put`` once, stats-pruned anti-join on the workers;
        - **partitioned** (huge removal sets — e.g. a 100-TB ``dedup_near``
          with billions of dup keys): the removal keys stay a Dataset
          end-to-end; base and removal are co-partitioned by ``Dataset.join``
          on the joined key (left-outer + hit marker, anti-join semantics) so
          no key array ever materializes on the driver.

        ``removal_keys`` may be a driver array/list of joined key strings or
        a single-column Dataset of them; ``strategy``: "auto" (count-based),
        "broadcast", or "partitioned".  ``runtime_filter``: bloom-prefilter
        the partitioned anti-join so proven-surviving rows skip the shuffle
        ("auto" = only on multi-node clusters, where the shuffle is network;
        True/False force)."""
        key = tuple(key)
        self._materialize_if_pending(run_ts)
        if isinstance(removal_keys, ray.data.Dataset):
            from aws_medallion_datalake_ray.functions.dedup import exact_dedup

            # cast to string + distinct FIRST: the broadcast threshold is
            # documented in DISTINCT keys, but dedup_near feeds one row per
            # verified pair (dense dup clusters multiply rows), and the
            # fixed-width broadcast path needs string keys
            sch = removal_keys.schema()
            if sch is None:  # empty dataset (e.g. zero near-dup pairs)
                return {"removed_keys": 0, "affected_files": 0, "files_out": 0}
            kcol = sch.base_schema.names[0]
            rmd = removal_keys.map_batches(
                lambda t, c=kcol: pa.table({"__rm_key": pc.cast(t[c], pa.string())}),
                batch_format="pyarrow",
            )
            rmd = exact_dedup(rmd, ("__rm_key",)).materialize()
            n_rm = rmd.count()
            if n_rm == 0:
                return {"removed_keys": 0, "affected_files": 0, "files_out": 0}
            if strategy == "partitioned" or (
                strategy == "auto" and (
                    n_rm > broadcast_threshold
                    # byte guard (free: rmd is materialized): kilobyte-wide
                    # keys must not ride the count budget into the driver
                    or (rmd.size_bytes() or 0) > (256 << 20)
                )
            ):
                return self._delete_keys_partitioned(
                    rmd, key=key, run_ts=run_ts, job_id=job_id,
                    operation=operation, prepared=True,
                    runtime_filter=runtime_filter,
                )
            removal_keys = rmd.unique("__rm_key")
        # joined keys are string-typed (`_join_keys` str-casts each column);
        # stringify non-str inputs (e.g. an int64 key array) to match
        raw = np.array([x if isinstance(x, str) else str(x)
                        for x in removal_keys], dtype=object)
        if len(raw) == 0:
            return {"removed_keys": 0, "affected_files": 0, "files_out": 0}
        if strategy == "partitioned" or (
            strategy == "auto" and len(raw) > broadcast_threshold
        ):
            return self._delete_keys_partitioned(
                ray.data.from_arrow(pa.table({"__rm_key": pa.array(raw, pa.string())})),
                key=key, run_ts=run_ts, job_id=job_id, operation=operation,
                runtime_filter=runtime_filter,
            )
        lens_all = np.array([len(x.encode("utf-8")) for x in raw], dtype=np.int32)
        fixed = _to_fixed_bytes(raw, f"S{max(1, int(lens_all.max()))}")
        uniq, first_idx = np.unique(fixed, return_index=True)
        keys_ref = ray.put(np.ascontiguousarray(uniq))
        lens_ref = ray.put(np.ascontiguousarray(lens_all[first_idx]))

        rm_first = np.unique(
            np.array([s.split(_KEY_SEP)[0] for s in raw], dtype=object)
        )
        affected = _files_for_first_keys(self.files(), key[0], rm_first)
        if not affected:
            return {"removed_keys": int(len(uniq)), "affected_files": 0, "files_out": 0}

        job_id = job_id or f"{operation}-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op=operation, run_ts=run_ts)
        ledger.mark_running(operation, [f.path for f in affected])
        survivors = self._read_files(affected).map_batches(
            _anti_join_batch,
            fn_kwargs={"keys_ref": keys_ref, "lens_ref": lens_ref, "key_cols": key},
            batch_format="pyarrow",
        )
        added = self._write_dataset(
            survivors, min_rows_per_file=self._coalesce_rows_target(affected)
        )
        removed = [f.path for f in affected]
        summary = {
            "removed_keys": int(len(uniq)),
            "affected_files": len(affected),
            "rows_deleted": sum(f.rows for f in affected) - sum(f.rows for f in added),
        }
        ledger.mark_completed(operation, removed, [f.path for f in added], summary)
        self.store.commit(
            added, removed, operation, run_ts,
            schema_json=self._commit_file_schema(added) or (
                _schema_to_json(self.schema()) if self.schema() else None
            ),
            summary=summary,
        )
        ledger.finish()
        return {**summary, "files_out": len(added)}

    def _delete_keys_partitioned(
        self,
        removal: "ray.data.Dataset",
        key: tuple[str, ...],
        run_ts: str,
        job_id: str | None,
        operation: str,
        prepared: bool = False,
        runtime_filter: "bool | str" = "auto",
    ) -> dict[str, Any]:
        """DELETE for huge removal key sets: distributed anti-join.

        The removal keys (a single-column Dataset of joined key strings) are
        deduplicated with the hash-partitioned dedup, then ``Dataset.join``ed
        left-outer against the stats-pruned base files on the joined key; rows
        with a hit marker are dropped per partition.  Nothing larger than the
        distinct FIRST key component (repo-cardinality, for file pruning)
        ever reaches the driver."""
        from aws_medallion_datalake_ray.functions.dedup import exact_dedup

        kcol = removal.schema().base_schema.names[0]
        rmd = removal.map_batches(
            lambda t, c=kcol: pa.table(
                {"__rm_key": pc.cast(t[c], pa.string()),
                 "__rm_hit": pa.array(np.ones(len(t), np.int8))}
            ),
            batch_format="pyarrow",
        )
        if not prepared:  # caller may have deduped already (delete_keys does)
            rmd = exact_dedup(rmd, ("__rm_key",))
        rmd = rmd.materialize()
        n_rm = rmd.count()
        if n_rm == 0:
            return {"removed_keys": 0, "affected_files": 0, "files_out": 0}

        # file pruning on the distinct first key component (dim cardinality)
        def first_comp(t: pa.Table) -> pa.Table:
            v = np.array(
                [s.split(_KEY_SEP)[0] for s in t["__rm_key"].to_pylist()],
                dtype=object,
            )
            return pa.table({"f": pa.array(v, pa.string())})

        rm_first = np.array(
            sorted(rmd.map_batches(first_comp, batch_format="pyarrow").unique("f")),
            dtype=object,
        )
        affected = _files_for_first_keys(self.files(), key[0], rm_first)
        if not affected:
            return {"removed_keys": int(n_rm), "affected_files": 0, "files_out": 0}

        job_id = job_id or f"{operation}-{uuid.uuid4().hex[:8]}"
        ledger = Ledger(self.root, job_id, op=f"{operation}-partitioned", run_ts=run_ts)
        ledger.mark_running(operation, [f.path for f in affected])

        def add_k(t: pa.Table) -> pa.Table:
            return t.append_column("__k", pa.array(_join_keys(t, key), pa.string()))

        # join aggregators are actors — more partitions than CPUs deadlocks a
        # small cluster; ~half the CPUs still means hundreds of partitions on
        # a multi-node cluster
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        nparts = max(2, ncpu // 2)
        schema = self.schema()

        def keep_misses(t: pa.Table) -> pa.Table:
            if "__rm_hit" in t.column_names:  # joined arm; bloom-negative
                t = t.filter(pc.is_null(t["__rm_hit"]))  # rows skip the join
            out = t.drop_columns(
                [c for c in ("__k", "__rm_key", "__rm_hit") if c in t.column_names]
            )
            if schema is not None:
                out = out.select(schema.names).cast(schema)
            return out

        # Bloom runtime filter (sideways information passing): broadcast a
        # bitset of the removal keys (~1.2 B/key at 1% fpp) and route only
        # bloom-POSITIVE base rows (true deletes + fpp of survivors) into
        # the anti-join shuffle — bloom-negative rows are PROVEN survivors
        # and stream straight to the writer.  Shuffle volume drops from
        # |base| to |deletes| + fpp x |base|; at sparse-delete 100-TB scale
        # that is the difference between reshuffling the table over the
        # network and not.  The base is read and key-hashed ONCE (the hit
        # bit rides as a column); the tagged scan is materialized so the
        # pos/neg routing reads plasma, not parquet twice — no worse than
        # the unfiltered plan, whose join holds the same rows in shuffle
        # partitions.  Survivors are re-bundled (split/merge repartition,
        # no all-to-all) before the write so the two-branch union cannot
        # fragment the output files.  ``runtime_filter="auto"`` enables it
        # only on multi-node clusters (see :func:`_multi_node` — locally
        # the avoided shuffle is plasma-speed and the filter's routing
        # passes cost more than they save); None (filter over the byte
        # cap) falls back to the full join.
        from aws_medallion_datalake_ray.functions.bloom import (
            bloom_contains, dataset_key_bloom, value_hashes)

        use_rf = (runtime_filter is True
                  or (runtime_filter == "auto" and _multi_node()))
        bloom = dataset_key_bloom(rmd, "__rm_key", n_rm) if use_rf else None
        if bloom is not None:
            bits, m_bits, k_hashes = bloom
            bits_ref = ray.put(bits)

            def add_k_tag(t: pa.Table) -> pa.Table:
                ks = _join_keys(t, key)
                b = ray.get(bits_ref)  # zero-copy plasma view per batch
                hit = bloom_contains(b, value_hashes(ks), m_bits, k_hashes)
                t = t.append_column("__k", pa.array(ks, pa.string()))
                return t.append_column("__bh", pa.array(hit.astype(np.int8)))

            tagged = self._read_files(affected).map_batches(
                add_k_tag, batch_format="pyarrow").materialize()

            def take_route(t: pa.Table, positive: bool) -> pa.Table:
                mask = pc.equal(t["__bh"], 1 if positive else 0)
                return t.filter(mask).drop_columns(["__bh"])

            pos = tagged.map_batches(take_route, fn_kwargs={"positive": True},
                                     batch_format="pyarrow")
            neg = tagged.map_batches(take_route, fn_kwargs={"positive": False},
                                     batch_format="pyarrow")
            joined = pos.join(
                rmd, join_type="left_outer", num_partitions=nparts,
                on=("__k",), right_on=("__rm_key",),
            )
            survivors = joined.map_batches(
                keep_misses, batch_format="pyarrow"
            ).union(neg.map_batches(keep_misses, batch_format="pyarrow"))
            est_rows = max(1, sum(f.rows for f in affected) - int(n_rm))
            survivors = survivors.repartition(
                max(1, est_rows // self._coalesce_rows_target(affected) + 1)
            )
        else:
            base = self._read_files(affected).map_batches(
                add_k, batch_format="pyarrow")
            joined = base.join(
                rmd, join_type="left_outer", num_partitions=nparts,
                on=("__k",), right_on=("__rm_key",),
            )
            survivors = joined.map_batches(keep_misses, batch_format="pyarrow")
        added = self._write_dataset(
            survivors, min_rows_per_file=self._coalesce_rows_target(affected)
        )
        removed = [f.path for f in affected]
        summary = {
            "removed_keys": int(n_rm),
            "affected_files": len(affected),
            "rows_deleted": sum(f.rows for f in affected) - sum(f.rows for f in added),
            "strategy": "partitioned+bloom" if bloom is not None else "partitioned",
        }
        ledger.mark_completed(operation, removed, [f.path for f in added], summary)
        self.store.commit(
            added, removed, operation, run_ts,
            schema_json=self._commit_file_schema(added) or (
                _schema_to_json(self.schema()) if self.schema() else None
            ),
            summary=summary,
        )
        ledger.finish()
        return {**summary, "files_out": len(added)}

    def dedup_near(
        self,
        text_col: str = "content",
        key: Sequence[str] = SOURCE_FILES_KEY,
        threshold: float = 0.7,
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        max_bucket: int = 512,
        run_ts: str = "1970-01-01T00:00:00",
        job_id: str | None = None,
        broadcast_threshold: int = 2_000_000,
        policy: str = "pairs",
        id_mode: str = "key",
        verify_chunk_bytes: int = 256 << 20,
        verify: str = "join",
    ) -> dict[str, Any]:
        """Distributed near-duplicate REMOVAL, end-to-end on workers: MinHash+
        LSH candidates over ``text_col`` -> exact shingle-Jaccard verify ->
        copy-on-write delete under one of two keep policies:

        - ``policy="pairs"`` (default): drop every row that is a verified
          near-dup of a smaller-keyed row — keeps every LOCAL minimum (a
          row smaller than all its verified neighbors), so two docs that
          are each near-dups of a removed third but not of each other BOTH
          survive.  Conservative: never removes a doc without a surviving
          direct witness.
        - ``policy="cluster"``: transitive closure via distributed
          connected components (``functions/graph.py``) — each dup CLUSTER
          keeps exactly its minimum key (the RefinedWeb/SlimPajama-style
          semantics: A~B and B~C retire B AND C even though A~C was never
          scored).  More aggressive; one survivor per component.

        The reference has no near-dedup at all (SURVEY §2.7); this is the
        marquee 100-TB training-data op.

        Scale shape: texts never reach the driver — candidates, verification
        and the survivor rewrite all run as Dataset stages, and the removal
        key set stays a Dataset into :meth:`delete_keys`, which broadcasts it
        only when it fits (``broadcast_threshold``) and otherwise runs the
        fully partitioned anti-join — nothing grows with the dup count on the
        driver.

        ``id_mode``: what flows through the pair pipeline as the row id.
        ``"key"`` (default) uses the ``\\x1f``-joined key string — the
        SURVIVOR of each dup pair/cluster is the minimum-key row (stable,
        human-meaningful).  ``"digest"`` uses a 128-bit hex digest of the
        key (two independent SipHash-64 lanes): ids are fixed 32 bytes no
        matter how wide the key, which shrinks the banding + pair shuffles
        several-fold (a (repo, path, commit) key is ~90 B; a collision-rich
        corpus shuffles O(colliding-rows x bands) id copies — measured
        ~55 GB of spill at 9.7M docs with string ids vs in-budget with
        digests).  The survivor becomes the minimum-DIGEST row: still
        deterministic, but an arbitrary cluster member — the 100-TB mode,
        where "which copy survives" is immaterial.  Verified dup digests
        translate back to real keys with one column-pruned scan +
        budgeted semi-join before :meth:`delete_keys`.

        ``verify``: ``"join"`` (default) semi-joins candidate texts and
        verifies via broadcast or chunked pairs x texts joins — texts move
        once, the sparse-corpus plan; ``"local"`` carries texts on the
        banding shuffle and verifies inside each bucket-hash partition
        (``near_dup_pairs_local``) — memory O(partition) at ANY pair
        density, the dense-corpus (template-clone / version-chain) plan.
        """
        from aws_medallion_datalake_ray.functions.dedup import (
            near_dup_pairs, near_dup_pairs_local,
        )

        if id_mode not in ("key", "digest"):
            raise ValueError(f"unknown id_mode {id_mode!r}")
        if verify not in ("join", "local"):
            raise ValueError(f"unknown verify {verify!r}")
        key = tuple(key)
        ds = self.scan(columns=[*key, text_col])

        def _digests(t: pa.Table) -> list:
            import binascii

            from aws_medallion_datalake_ray.functions.hashing import (
                hash_batch_cols, hash_batch_cols_alt,
            )

            b = np.empty((len(t), 2), dtype=">u8")
            b[:, 0] = hash_batch_cols(t, list(key))
            b[:, 1] = hash_batch_cols_alt(t, list(key))
            blob = binascii.hexlify(b.tobytes()).decode()
            return [blob[i * 32:(i + 1) * 32] for i in range(len(t))]

        def add_id(t: pa.Table) -> pa.Table:
            if id_mode == "digest":
                return t.append_column("__nd_id", pa.array(_digests(t), pa.string()))
            return t.append_column("__nd_id", pa.array(_join_keys(t, key), pa.string()))

        if verify == "local":
            pairs = near_dup_pairs_local(
                ds.map_batches(add_id, batch_format="pyarrow"),
                text_col=text_col,
                id_col="__nd_id",
                num_perm=num_perm,
                bands=bands,
                shingle_k=shingle_k,
                threshold=threshold,
                max_bucket=max_bucket,
            )
        else:
            pairs = near_dup_pairs(
                ds.map_batches(add_id, batch_format="pyarrow"),
                text_col=text_col,
                id_col="__nd_id",
                num_perm=num_perm,
                bands=bands,
                shingle_k=shingle_k,
                threshold=threshold,
                max_bucket=max_bucket,
                verify_chunk_bytes=verify_chunk_bytes,
            )
        if policy == "cluster":
            # transitive: components over verified pairs; remove every node
            # that is not its component's minimum.  The edge set (not the
            # corpus) is the iteration state; ids stay a Dataset throughout.
            from aws_medallion_datalake_ray.functions.graph import (
                connected_components,
            )

            comp = connected_components(pairs, "id_a", "id_b")

            def _non_min(t: pa.Table) -> pa.Table:
                keep = pc.not_equal(t["node"], t["component"])
                return pa.table({"rid": t.filter(keep)["node"]})

            from aws_medallion_datalake_ray.functions.blocks import rebundle

            rm = rebundle(
                comp.map_batches(_non_min, batch_format="pyarrow")
            ).materialize()
        elif policy == "pairs":
            # drop every id that is a verified near-dup of a lexically
            # smaller id (id_a < id_b by construction): the removal ids stay
            # a DATASET — delete_keys dedups them and picks the broadcast or
            # partitioned plan
            from aws_medallion_datalake_ray.functions.blocks import rebundle

            # rebundle before materialize: millions of narrow rid rows in
            # tiny blocks would otherwise persist IN-BAND in the driver heap
            # (the round-4 ownership leak; measured +3.2 GB driver RSS at
            # 8.4M removal keys without it)
            rm = rebundle(pairs.map_batches(
                lambda t: pa.table({"rid": t["id_b"]}), batch_format="pyarrow"
            )).materialize()
        else:
            raise ValueError(f"unknown dedup_near policy {policy!r}")
        if id_mode == "digest":
            # translate dup digests -> real joined keys: one column-pruned
            # scan (key cols only, no content) semi-joined against the digest
            # set under the same broadcast/partitioned budget duality
            from aws_medallion_datalake_ray.functions.joins import filter_by_keys

            def _digest_and_key(t: pa.Table) -> pa.Table:
                return pa.table({
                    "__nd_id": pa.array(_digests(t), pa.string()),
                    "rid": pa.array(_join_keys(t, key), pa.string()),
                })

            keyed = self.scan(columns=list(key)).map_batches(
                _digest_and_key, batch_format="pyarrow"
            )
            rm = rebundle(filter_by_keys(
                keyed, "__nd_id", rm, count_budget=broadcast_threshold,
            ).map_batches(
                lambda t: pa.table({"rid": t["rid"]}), batch_format="pyarrow"
            )).materialize()
        res = self.delete_keys(
            rm, key=key, run_ts=run_ts, job_id=job_id, operation="dedup-near",
            broadcast_threshold=broadcast_threshold,
        )
        res["near_dup_rows"] = res["removed_keys"]
        return res

    # ------------------------------------------------------------ verification

    def change_feed(
        self,
        from_snapshot: int,
        to_snapshot: int | None = None,
        key_cols: Sequence[str] | None = None,
        include_preimages: bool = False,
        columns: Sequence[str] | None = None,
    ) -> "ray.data.Dataset":
        """Change data feed (CDC) between two snapshots: a Dataset of changed
        rows tagged with a ``_change`` column in {insert, delete, update}.

        The diff is computed from the FILE-level delta (manifests make it
        O(changed files), never a full-table compare): rows are read only
        from files added/removed between the snapshots, co-grouped by
        ``key_cols`` (one hash shuffle over changed rows only), and rewrites
        that merely move rows between files (compaction, zorder) cancel out
        — a pure-maintenance delta yields an EMPTY feed.  Per key group:
        key only in the new side -> insert rows; only in the old side ->
        delete rows; both sides but differing contents -> the post-image
        rows tagged update (with ``include_preimages=True``, BOTH sides are
        emitted as update_preimage / update_postimage — what a downstream
        aggregate needs to retract the old contribution and apply the new,
        i.e. incremental view maintenance).  Generalizes the reference's
        full-refresh-overwrite consumers (``silver_digit_clean.py:127``)
        which re-read entire tables to find what changed.

        ``columns`` prunes the FEED OUTPUT to the named columns (+
        ``_change``).  Change DETECTION still compares every column (a feed
        must not miss an update to an unrequested column), but detection
        shuffles only 24 B/row hashes — the expensive part is the second
        pass that re-reads the changed rows, and with ``columns`` that read
        skips everything else (a CDC consumer rolling up deltas by key needs
        2 columns, not the wide ``content``)."""
        to_id = to_snapshot if to_snapshot is not None else self.store.head_id()
        try:
            snap_a = self.store.snapshot(from_snapshot)
            snap_b = self.store.snapshot(to_id)
        except FileNotFoundError as e:
            raise ValueError(f"unknown snapshot in ({from_snapshot}, {to_id})") from e
        if snap_a is None or snap_b is None:
            raise ValueError(f"unknown snapshot in ({from_snapshot}, {to_id})")
        files_a = {f.path: f for f in self.files(from_snapshot)}
        files_b = {f.path: f for f in self.files(to_id)}
        removed = [f for p, f in sorted(files_a.items()) if p not in files_b]
        added = [f for p, f in sorted(files_b.items()) if p not in files_a]
        # merge-on-read delete specs: each side reads with ITS snapshot's
        # masks (a masked row is not data of that snapshot), and specs added
        # between the snapshots emit their masked rows as DELETE rows even
        # though no file changed (lazy deletes are metadata-only)
        specs_a = self._pending_deletes(from_snapshot)
        specs_b = self._pending_deletes(to_id)
        new_specs = [sp for sp in specs_b if sp not in specs_a]
        schema = (_schema_from_json(snap_b.schema_json)
                  if snap_b.schema_json else None)
        key = list(key_cols) if key_cols else (
            list(schema.names) if schema is not None else None
        )
        if key is None:
            raise ValueError("key_cols required for a table with no schema")
        evo_b = self._evolution(to_id)
        out_cols = None
        if columns is not None:
            if not columns:
                raise ValueError(
                    "columns must be non-empty (pass a key column for "
                    "count-only consumption)")
            if schema is not None:
                bad = [c for c in columns if schema.get_field_index(c) < 0]
                if bad:
                    raise KeyError(f"columns not in schema: {bad}")
            out_cols = list(columns)

        def empty() -> "ray.data.Dataset":
            sch = schema or pa.schema([])
            if out_cols is not None and schema is not None:
                sch = pa.schema([schema.field(c) for c in out_cols])
            sch = sch.append(pa.field("_change", pa.string()))
            return ray.data.from_arrow(sch.empty_table())

        def tag(ds: "ray.data.Dataset", change: str) -> "ray.data.Dataset":
            def add(t: pa.Table, _c=change) -> pa.Table:
                return t.append_column("_change", pa.repeat(pa.scalar(_c), len(t)))
            return ds.map_batches(add, batch_format="pyarrow")

        def read_side(files: list[DataFile], side: int,
                      cols: list[str] | None) -> "ray.data.Dataset":
            specs = specs_a if side == 0 else specs_b
            if specs:
                return self._read_files_with_deletes(
                    files, specs, cols, None, to_id)
            return self._read_files(files, columns=cols, evolution=evo_b)

        def spec_delta_deletes() -> "ray.data.Dataset | None":
            """DELETE rows from masks added between the snapshots, read off
            files unchanged by the file delta (changed files flow through
            the masked diff).  New specs apply sequentially so a row
            matching several attributes to the first — no double emit."""
            if not new_specs:
                return None
            unchanged = [f for p, f in sorted(files_b.items())
                         if p in files_a]
            pieces = []
            cum = list(specs_a)
            for sp in new_specs:
                in_spec = set(sp["files"])
                fs = [f for f in unchanged if f.path in in_spec]
                if fs:
                    pred = [tuple(x) for x in sp["predicate"]]
                    if cum:
                        d = self._read_files_with_deletes(
                            fs, cum, out_cols, pred, to_id)
                    else:
                        d = self._read_files(fs, columns=out_cols,
                                             predicate=pred, evolution=evo_b)
                    pieces.append(d)
                cum = cum + [sp]
            if not pieces:
                return None
            ds = pieces[0]
            for d in pieces[1:]:
                ds = ds.union(d)
            return tag(ds, "delete")

        extra = spec_delta_deletes()

        def merged(feed: "ray.data.Dataset") -> "ray.data.Dataset":
            return feed.union(extra) if extra is not None else feed

        if not removed and not added:
            return merged(empty())
        if not removed:  # append-only delta: every new-file row is an insert
            return merged(tag(read_side(added, 1, out_cols), "insert"))
        if not added:
            return merged(tag(read_side(removed, 0, out_cols), "delete"))

        data_cols = [c for c in (schema.names if schema else key)]
        # Two-phase plan (default): the compare shuffles only 24 B/row of
        # hashes — (key-hash pair, content hash, side) — never the content;
        # the changed-key classification broadcasts back (128-bit identity,
        # collision odds ~2^-128 x pairs) and a second column-pruned read
        # emits exactly the changed rows.  With a huge changed set (> 2M
        # keys) the broadcast is refused and the full-row co-partition plan
        # below runs instead (same duality as merge / delete_keys).
        from aws_medallion_datalake_ray.functions.hashing import (
            hash_batch_cols,
            hash_batch_cols_alt,
        )

        P = 64

        def meta_side(files: list[DataFile], s: int) -> "ray.data.Dataset":
            def m(t: pa.Table, _s=s) -> pa.Table:
                k1 = hash_batch_cols(t, tuple(key))
                k2 = hash_batch_cols_alt(t, tuple(key))
                ch = _splitmix64(hash_batch_cols(t, tuple(data_cols)))
                return pa.table({
                    "k1": pa.array(k1), "k2": pa.array(k2), "ch": pa.array(ch),
                    "s": pa.repeat(pa.scalar(_s, pa.int8()), len(t)),
                    "p": pa.array((k1 % np.uint64(P)).astype(np.int32)),
                })
            return read_side(files, s, None).map_batches(
                m, batch_format="pyarrow")

        def classify(t: pa.Table) -> pa.Table:
            k1 = np.asarray(t["k1"])
            k2 = np.asarray(t["k2"])
            s = np.asarray(t["s"])
            ch = np.asarray(t["ch"])
            pair = np.rec.fromarrays([k1, k2], names="a,b")
            _, gid = np.unique(pair, return_inverse=True)
            G = int(gid.max()) + 1 if len(gid) else 0
            m0, m1 = s == 0, s == 1
            n0 = np.bincount(gid[m0], minlength=G)
            n1 = np.bincount(gid[m1], minlength=G)
            # multiset compare per key: wraparound sums of the row hash and
            # a nonlinear finalizer — equal counts + both sums <=> equal
            sums = []
            for m in (m0, m1):
                s1 = np.zeros(G, np.uint64)
                s2 = np.zeros(G, np.uint64)
                with np.errstate(over="ignore"):
                    np.add.at(s1, gid[m], ch[m])
                    np.add.at(s2, gid[m], _splitmix64(ch[m]))
                sums.append((s1, s2))
            same = (n0 == n1) & (sums[0][0] == sums[1][0]) & (sums[0][1] == sums[1][1])
            code = np.full(G, -1, np.int8)  # 0=insert 1=delete 2=update
            code[(n0 == 0) & (n1 > 0)] = 0
            code[(n1 == 0) & (n0 > 0)] = 1
            code[(n0 > 0) & (n1 > 0) & ~same] = 2
            first = np.full(G, len(gid), np.int64)  # first row index per key
            np.minimum.at(first, gid, np.arange(len(gid)))
            keep = code >= 0
            idx = first[keep]
            return pa.table({
                "k1": pa.array(k1[idx]), "k2": pa.array(k2[idx]),
                "code": pa.array(code[keep]),
            })

        meta = meta_side(removed, 0).union(meta_side(added, 1))
        from aws_medallion_datalake_ray.functions.blocks import rebundle

        changed = (
            # 25 B/row hash rows: rebundle so the compare shuffle's pieces
            # exceed Ray's in-band threshold (blocks.py — driver-heap guard)
            rebundle(meta)
            .groupby("p").map_groups(classify, batch_format="pyarrow")
            .to_pandas()
        )
        if len(changed) == 0:
            return merged(empty())
        if len(changed) <= CHANGE_FEED_BROADCAST_KEYS:
            order = np.argsort(changed["k1"].to_numpy(), kind="stable")
            ck1 = changed["k1"].to_numpy()[order]
            ck2 = changed["k2"].to_numpy()[order]
            ccode = changed["code"].to_numpy()[order].astype(np.int8)
            if len(np.unique(ck1)) == len(ck1):  # k1 unique -> O(log n) probe
                refs = ray.put((ck1, ck2, ccode))

                # second pass: column-pruned — only the requested columns
                # plus the key columns (needed to recompute the key hashes)
                # leave storage; keys not requested drop before emit
                read_cols = None
                if out_cols is not None:
                    read_cols = out_cols + [k for k in key if k not in out_cols]

                def emit(t: pa.Table, _s: int, _refs=refs) -> pa.Table:
                    a1, a2, ac = ray.get(_refs)
                    k1 = hash_batch_cols(t, tuple(key))
                    k2 = hash_batch_cols_alt(t, tuple(key))
                    if out_cols is not None:
                        t = t.select(out_cols)
                    i = np.searchsorted(a1, k1)
                    i = np.minimum(i, len(a1) - 1)
                    hit = (a1[i] == k1) & (a2[i] == k2)
                    code = np.where(hit, ac[i], np.int8(-1))
                    if _s == 0:
                        lab = {1: "delete"}
                        if include_preimages:
                            lab[2] = "update_preimage"
                    else:
                        lab = {0: "insert",
                               2: "update_postimage" if include_preimages
                               else "update"}
                    pieces = []
                    for c, name in lab.items():
                        rows = code == c
                        if rows.any():
                            sel = t.filter(pa.array(rows))
                            pieces.append(sel.append_column(
                                "_change", pa.repeat(pa.scalar(name), len(sel))))
                    if not pieces:
                        return t.schema.append(
                            pa.field("_change", pa.string())).empty_table()
                    return pa.concat_tables(pieces)

                out = read_side(removed, 0, read_cols).map_batches(
                    emit, fn_kwargs={"_s": 0}, batch_format="pyarrow"
                ).union(
                    read_side(added, 1, read_cols).map_batches(
                        emit, fn_kwargs={"_s": 1}, batch_format="pyarrow"
                    )
                )
                return merged(out)
        # fallback: full-row co-partition diff (huge changed set, or the
        # astronomically-unlikely k1 collision inside the changed set)
        return merged(self._change_feed_shuffle(
            removed, added, key, data_cols, evo_b, include_preimages, P,
            out_cols=out_cols, read_side=read_side,
        ))

    def _change_feed_shuffle(
        self,
        removed: list[DataFile],
        added: list[DataFile],
        key: list[str],
        data_cols: list[str],
        evo_b,
        include_preimages: bool,
        P: int,
        out_cols: list[str] | None = None,
        read_side=None,
    ) -> "ray.data.Dataset":
        """Full-row co-partitioned diff: hash(key) % P partitions, vectorized
        numpy classification per partition (never one Python call per key).
        ``read_side(files, side, cols)`` (from change_feed) applies each
        snapshot's pending-delete masks; None = raw reads."""
        if read_side is None:
            def read_side(files, side_i, cols):  # noqa: ARG001
                return self._read_files(files, columns=cols, evolution=evo_b)

        def side(ds: "ray.data.Dataset", s: int) -> "ray.data.Dataset":
            def add(t: pa.Table, _s=s) -> pa.Table:
                from aws_medallion_datalake_ray.functions.hashing import (
                    hash_batch_cols,
                )

                part = (hash_batch_cols(t, tuple(key)) % np.uint64(P)).astype(
                    np.int32
                )
                return t.append_column(
                    "__side", pa.repeat(pa.scalar(_s, pa.int8()), len(t))
                ).append_column("__cfp", pa.array(part))
            return ds.map_batches(add, batch_format="pyarrow")

        both = side(read_side(removed, 0, None), 0).union(
            side(read_side(added, 1, None), 1)
        )

        def diff_partition(
            t: pa.Table, _key=tuple(key), _cols=tuple(data_cols),
            _pre=include_preimages, _out=tuple(out_cols or ()) or None,
        ) -> pa.Table:
            from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols
            from aws_medallion_datalake_ray.state.table import _join_keys

            s = np.asarray(t["__side"])
            body = t.drop_columns(["__side", "__cfp"])
            # exact key groups via the joined key string (no hash collisions)
            _, gid = np.unique(_join_keys(body, _key), return_inverse=True)
            G = int(gid.max()) + 1 if len(gid) else 0
            m0, m1 = s == 0, s == 1
            n0 = np.bincount(gid[m0], minlength=G)
            n1 = np.bincount(gid[m1], minlength=G)
            ch = hash_batch_cols(body, _cols)
            ch2 = _splitmix64(ch)
            sums = []
            for m in (m0, m1):
                s1 = np.zeros(G, np.uint64)
                s2 = np.zeros(G, np.uint64)
                with np.errstate(over="ignore"):
                    np.add.at(s1, gid[m], ch[m])
                    np.add.at(s2, gid[m], ch2[m])
                sums.append((s1, s2))
            same = (n0 == n1) & (sums[0][0] == sums[1][0]) & (sums[0][1] == sums[1][1])
            g_ins = n1.astype(bool) & (n0 == 0)
            g_del = n0.astype(bool) & (n1 == 0)
            g_upd = (n0 > 0) & (n1 > 0) & ~same
            pieces = []
            for grp_mask, row_side, change in (
                (g_ins, m1, "insert"),
                (g_del, m0, "delete"),
                (g_upd, m0, "update_preimage") if _pre else (None, None, None),
                (g_upd, m1, "update_postimage" if _pre else "update"),
            ):
                if grp_mask is None:
                    continue
                rows = row_side & grp_mask[gid]
                if rows.any():
                    sel = body.filter(pa.array(rows))
                    if _out is not None:
                        sel = sel.select(list(_out))
                    pieces.append(sel.append_column(
                        "_change", pa.repeat(pa.scalar(change), len(sel))))
            body_schema = (
                pa.schema([body.schema.field(c) for c in _out])
                if _out is not None else body.schema
            )
            out_schema = body_schema.append(pa.field("_change", pa.string()))
            if not pieces:
                return out_schema.empty_table()
            return pa.concat_tables(pieces)

        return (
            both.groupby("__cfp")
            .map_groups(diff_partition, batch_format="pyarrow")
        )

    def content_checksum(self, cols: Sequence[str], snapshot_id: int | None = None) -> int:
        """Distributed order-insensitive checksum: per-batch row-hash sums
        (mod 2^61-1) reduced with a tiny aggregate — the whole table is hashed
        on the workers, the driver sees one integer.  Used by the benchmark's
        sha-verified post-maintenance scan (fingerprint() streams to the
        driver and is for tests only)."""
        from ray.data.aggregate import Sum

        from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols

        # two ~2^30 moduli: per-batch partial sums stay < 2^30, so the final
        # int64 Sum cannot overflow even with 2^33 batches; combined collision
        # probability for differing multisets ~ 1/(p1*p2) ~ 1e-18
        P1, P2 = (1 << 31) - 1, (1 << 29) - 3
        cols = list(cols)

        def partial(batch: pa.Table) -> pa.Table:
            h = hash_batch_cols(batch, tuple(cols))
            # mod-2^31 values summed in uint64 cannot overflow below 2^33
            # rows/batch, so the vectorized sum is exact
            s1 = int((h % np.uint64(P1)).sum(dtype=np.uint64)) % P1
            s2 = int((h % np.uint64(P2)).sum(dtype=np.uint64)) % P2
            return pa.table(
                {"h1": pa.array([s1], pa.int64()), "h2": pa.array([s2], pa.int64())}
            )

        if not self.files(snapshot_id):
            return 0
        ds = self.scan(snapshot_id=snapshot_id, columns=cols)
        out = ds.map_batches(partial, batch_format="pyarrow").aggregate(
            Sum("h1"), Sum("h2")
        )
        return (int(out["sum(h1)"]) % P1) * P2 + (int(out["sum(h2)"]) % P2)

    def sha256_checksum(
        self, col: str = "content", snapshot_id: int | None = None
    ) -> int:
        """Order-insensitive multiset checksum of per-row **sha256(col)** —
        the BASELINE.json verification invariant, literally: each row's
        content is sha256-hashed on the workers, digests are folded into two
        modular sums, the driver sees one integer.  Equal iff the multiset of
        per-row content digests is equal (collision odds ~1e-18)."""
        from ray.data.aggregate import Sum

        from aws_medallion_datalake_ray.functions.hashing import sha256_col

        P1, P2 = (1 << 31) - 1, (1 << 29) - 3

        def partial(batch: pa.Table) -> pa.Table:
            digests = sha256_col(batch[col])
            ints = np.array(
                [0 if d is None else int(d[:16], 16) for d in digests], dtype=np.uint64
            )
            s1 = int((ints % np.uint64(P1)).sum(dtype=np.uint64)) % P1
            s2 = int((ints % np.uint64(P2)).sum(dtype=np.uint64)) % P2
            return pa.table(
                {"h1": pa.array([s1], pa.int64()), "h2": pa.array([s2], pa.int64())}
            )

        if not self.files(snapshot_id):
            return 0
        out = (
            self.scan(snapshot_id=snapshot_id, columns=[col])
            .map_batches(partial, batch_format="pyarrow")
            .aggregate(Sum("h1"), Sum("h2"))
        )
        return (int(out["sum(h1)"]) % P1) * P2 + (int(out["sum(h2)"]) % P2)

    def content_fingerprint(self, cols: Sequence[str], snapshot_id: int | None = None) -> str:
        """Order-insensitive fingerprint of the table = sha256 over the sorted
        per-row hashes of ``cols``.  Maintenance ops must keep it invariant."""
        import hashlib

        from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols

        hashes: list[np.ndarray] = []
        for batch in self.scan(snapshot_id=snapshot_id, columns=list(cols)).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            hashes.append(hash_batch_cols(batch, tuple(cols)))
        if not hashes:
            return hashlib.sha256(b"").hexdigest()
        allh = np.sort(np.concatenate(hashes))
        return hashlib.sha256(allh.tobytes()).hexdigest()
