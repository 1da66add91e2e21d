"""Per-file column statistics collection (min/max/null) for manifest entries.

Generalizes the reference's two schema/stat mechanisms — Glue crawler
inference (``terraform/agilean-databases.tf:9-58``) and the per-column
completeness profile (``gold_agilean.py:113-129``) — into exact footer-derived
stats: Parquet row-group metadata already stores min/max/null per column, so
collection is a metadata-only read (no data pages touched), fanned out as Ray
tasks over file chunks.  These stats drive scan pruning and merge targeting.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

import pyarrow.parquet as pq

import ray

# string bounds longer than this are truncated: a truncated *min* is still a
# valid lower bound; a truncated *max* is NOT a valid upper bound, so it is
# dropped (None = unbounded) — pruning stays conservative and correct.
_MAX_BOUND_LEN = 120


def _json_safe(v: Any, is_upper: bool) -> Any:
    if v is None or isinstance(v, (int, float, bool)):
        return v
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, str):
        if len(v) > _MAX_BOUND_LEN:
            return None if is_upper else v[:_MAX_BOUND_LEN]
        return v
    return None


def parquet_footer_stats(
    abs_path: str, stats_cols: tuple[str, ...] | list[str]
) -> tuple[int, int, dict[str, dict[str, Any]]]:
    """(rows, file_bytes, {col: {"min","max","nulls"}}) from the footer only."""
    import os

    pf = pq.ParquetFile(abs_path)
    md = pf.metadata
    names = pf.schema_arrow.names
    want = [c for c in stats_cols if c in names]
    col_idx = {c: names.index(c) for c in want}
    agg: dict[str, dict[str, Any]] = {c: {"min": None, "max": None, "nulls": 0} for c in want}
    # A row group without statistics (or without min/max while holding non-null
    # values) makes the whole file unbounded for that column — later row groups
    # must NOT repopulate bounds, or pruning would skip files whose stats-less
    # group contains matching rows.  Reachable via add_files of external parquet.
    unbounded: set[str] = set()
    # A row group whose footer lacks null_count makes the file's null count
    # UNKNOWN (None), never zero: predicate_covers_file's metadata-only DELETE
    # fast path must not treat "we don't know" as "no nulls" and drop a file
    # whose NULL rows should survive the predicate.
    nulls_unknown: set[str] = set()
    for rg in range(md.num_row_groups):
        rg_md = md.row_group(rg)
        for c, i in col_idx.items():
            st = rg_md.column(i).statistics
            if st is None:
                unbounded.add(c)
                nulls_unknown.add(c)
                continue
            a = agg[c]
            if st.null_count is not None:
                a["nulls"] += st.null_count
            else:
                nulls_unknown.add(c)
            if st.has_min_max:
                if a["min"] is None or st.min < a["min"]:
                    a["min"] = st.min
                if a["max"] is None or st.max > a["max"]:
                    a["max"] = st.max
            elif st.null_count is None or st.null_count < rg_md.num_rows:
                # values (possibly) present but no bounds recorded
                unbounded.add(c)
    for c, a in agg.items():
        if c in nulls_unknown:
            a["nulls"] = None
        if c in unbounded:
            a["min"] = a["max"] = None
            continue
        a["min"] = _json_safe(a["min"], is_upper=False)
        a["max"] = _json_safe(a["max"], is_upper=True)
    return md.num_rows, os.path.getsize(abs_path), agg


@ray.remote
def _stats_chunk(paths: list[str], stats_cols: tuple[str, ...]) -> list[tuple[int, int, dict]]:
    return [parquet_footer_stats(p, stats_cols) for p in paths]


def collect_stats(
    abs_paths: list[str], stats_cols: tuple[str, ...], chunk: int = 64
) -> list[tuple[int, int, dict]]:
    """Footer stats for many files — parallel Ray tasks when worthwhile."""
    if len(abs_paths) <= chunk or not ray.is_initialized():
        return [parquet_footer_stats(p, stats_cols) for p in abs_paths]
    refs = [
        _stats_chunk.remote(abs_paths[i : i + chunk], tuple(stats_cols))
        for i in range(0, len(abs_paths), chunk)
    ]
    out: list[tuple[int, int, dict]] = []
    for r in refs:
        out.extend(ray.get(r))
    return out


# ---------------------------------------------------------------- blooms


def file_bloom(abs_path: str, col: str, fpp: float = 0.02) -> dict | None:
    """Bloom filter of one file's distinct values in ``col`` (reads ONLY that
    column; returns the manifest-JSON form, or None when the column is
    absent / unsupported)."""
    import pyarrow.compute as pc

    from aws_medallion_datalake_ray.functions.bloom import (
        bloom_build, bloom_encode, bloom_params, value_hashes)

    schema = pq.read_schema(abs_path)
    if schema.get_field_index(col) < 0:
        return None
    t = pq.read_table(abs_path, columns=[col])
    u = pc.unique(t[col].combine_chunks()).drop_null()
    h = value_hashes(u)
    m, k = bloom_params(len(h), fpp)
    return bloom_encode(bloom_build(h, m, k), m, k, len(h))


@ray.remote
def _bloom_chunk(paths: list[str], cols: tuple[str, ...], fpp: float) -> list[dict]:
    return [
        {c: b for c in cols if (b := file_bloom(p, c, fpp)) is not None}
        for p in paths
    ]


def collect_blooms(
    abs_paths: list[str], cols: tuple[str, ...], fpp: float = 0.02,
    chunk: int = 8,
) -> list[dict]:
    """Per-file bloom dicts for many files — Ray tasks over file chunks
    (each task reads only the indexed columns of its files; nothing but
    (path, bitset) metadata returns to the driver)."""
    if len(abs_paths) <= 2 or not ray.is_initialized():
        return [
            {c: b for c in cols if (b := file_bloom(p, c, fpp)) is not None}
            for p in abs_paths
        ]
    refs = [
        _bloom_chunk.remote(abs_paths[i: i + chunk], tuple(cols), fpp)
        for i in range(0, len(abs_paths), chunk)
    ]
    out: list[dict] = []
    for r in refs:
        out.extend(ray.get(r))
    return out
