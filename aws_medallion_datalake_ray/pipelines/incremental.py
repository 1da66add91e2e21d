"""Incremental (watermark-gated) promotion — the reference's I1-I4 semantics.

The reference tracks a high-water mark per (api, endpoint) in DynamoDB
(``scripts/watermark_helper.py:9-42``) and backfills month-by-month with a
checkpointed Step-Functions loop (``step-functions/digit-historical-load.json``).
Here the same semantics ride the engine's per-partition ledger:

- input arrives as named partitions (e.g. one directory per extraction date);
- a run processes ONLY partitions not yet ``completed`` in the ledger
  (high-water mark generalized to a partition *set* — late partitions are
  picked up even if a newer one already landed, unlike a scalar watermark);
- each partition is promoted independently and idempotently: transform →
  append to the target LakeTable → ledger ``completed`` with lineage
  (input files → output files) + metrics;
- a crash mid-run leaves ``running`` entries whose output files are GC-safe
  (Ledger.active_output_files) until the job is re-run or abandoned;
  re-running skips ``completed`` partitions (resume).
"""

from __future__ import annotations

import os
from typing import Callable

import ray.data

from aws_medallion_datalake_ray.state.ledger import Ledger
from aws_medallion_datalake_ray.state.table import LakeTable


def discover_partitions(input_root: str) -> dict[str, list[str]]:
    """Partition name -> parquet file list, one partition per subdirectory
    (the reference's ``year=/month=/day=`` prefixes, flattened)."""
    out: dict[str, list[str]] = {}
    for name in sorted(os.listdir(input_root)):
        d = os.path.join(input_root, name)
        if not os.path.isdir(d):
            continue
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        if files:
            out[name] = files
    return out


def _promote_one(
    target: LakeTable,
    ds: ray.data.Dataset,
    pname: str,
    in_refs: list[str],
    ledger: Ledger,
    run_ts: str,
    operation: str,
) -> None:
    """Append one partition's dataset and record lineage (input refs ->
    output files) + metrics in the ledger."""
    snap = target.append(ds, run_ts=run_ts, operation=f"{operation}:{pname}")
    snap_files = target.store.files(snap)
    parent_files = target.store.files(snap.parent_id) if snap.parent_id else []
    parent_paths = {x.path for x in parent_files}
    out_files = [f.path for f in snap_files if f.path not in parent_paths]
    rows = sum(f.rows for f in snap_files) - sum(f.rows for f in parent_files)
    ledger.mark_completed(
        pname, in_refs, out_files, {"rows_out": rows, "snapshot_id": snap.snapshot_id}
    )


def incremental_promote(
    input_root: str,
    target: LakeTable,
    transform: Callable[[ray.data.Dataset], ray.data.Dataset],
    job_id: str,
    run_ts: str,
) -> dict:
    """Process new input partitions only; resumable via the ledger.

    Returns {"processed": [...], "skipped": [...], "metrics": {...}}.
    """
    parts = discover_partitions(input_root)
    ledger = Ledger(target.root, job_id, op="incremental-promote", run_ts=run_ts)
    pending = ledger.pending(parts.keys())
    skipped = [p for p in parts if p not in pending]

    for pname in pending:
        files = parts[pname]
        ledger.mark_running(pname, files)
        ds = transform(ray.data.read_parquet(files))
        _promote_one(target, ds, pname, files, ledger, run_ts, "incremental")

    ledger.finish()
    return {
        "processed": pending,
        "skipped": skipped,
        "metrics": ledger.job_metrics,
    }


def incremental_rest_ingest(
    target: LakeTable,
    entity_batches: dict[str, list[str]],
    endpoints: list[str],
    transport_factory,
    job_id: str,
    run_ts: str,
    auth: dict | None = None,
    lineage: dict | None = None,
    concurrency=(1, 4),
) -> dict:
    """REST fan-out ingest gated by the ledger watermark (SURVEY S1 x I1:
    the reference's DynamoDB high-water-mark around its per-obra fetch loop,
    ``watermark_helper.py:9-42`` + ``bronze_digit.py:46-109``).

    ``entity_batches``: named batch -> entity id list (the partition axis).
    A re-run with the same ``job_id`` skips completed batches — only NEW
    batches are fetched and appended, so a scheduled ingest picks up exactly
    the entities that arrived since the last run, and a crashed run resumes.

    Returns {"processed": [...], "skipped": [...], "metrics": {...}}.
    """
    from aws_medallion_datalake_ray.sources.rest import read_rest_fanout

    ledger = Ledger(target.root, job_id, op="incremental-rest", run_ts=run_ts)
    pending = ledger.pending(entity_batches.keys())
    skipped = [p for p in entity_batches if p not in pending]

    for pname in pending:
        ids = entity_batches[pname]
        in_refs = [f"rest:{pname}:{e}" for e in endpoints]
        ledger.mark_running(pname, in_refs)
        ds = read_rest_fanout(
            ids, endpoints, transport_factory, auth=auth, lineage=lineage,
            concurrency=concurrency,
        )
        _promote_one(target, ds, pname, in_refs, ledger, run_ts, "incremental-rest")

    ledger.finish()
    return {
        "processed": pending,
        "skipped": skipped,
        "metrics": ledger.job_metrics,
    }
