"""Driver contract for the Ray-Data lakehouse engine.

``entry()`` runs the flagship medallion + maintenance pipeline on sf0.001;
``queries()`` exposes every implemented operator/pipeline (SURVEY.md §2) —
SQL-expressible ones paired with a DuckDB oracle in ``oracle_sql()``,
maintenance / near-dup / heuristic ops as rows-only demos.

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: ingest the documents table
    shape into the engine's medallion + run a maintenance cycle on the
    canonical source_files fixture, returning the post-maintenance gold
    lang_summary (stable schema, >=1 row)."""
    from aws_medallion_datalake_ray.pipelines.medallion import run_medallion
    from aws_medallion_datalake_ray.sources.fixtures import make_source_files, make_updates

    base = make_source_files(4000, seed=42)
    root = os.path.join(tempfile.gettempdir(), "amdl-entry")
    shutil.rmtree(root, ignore_errors=True)
    tables = run_medallion(base, root, run_ts="2024-01-01T00:00:00")

    silver = tables["silver"]
    silver.compact(target_file_bytes=8 * 1024 * 1024, run_ts="2024-01-01T00:00:01")
    silver.zorder(["repo", "lang", "path"], target_file_bytes=1024 * 1024,
                  run_ts="2024-01-01T00:00:02")
    upd = make_updates(base, 400, seed=7)
    from aws_medallion_datalake_ray.pipelines.medallion import silver_clean_batch

    silver.merge(silver_clean_batch(upd), run_ts="2024-01-01T00:00:03")
    silver.expire_snapshots(keep_last=2)
    silver.gc_orphans()
    return tables["lang_summary"].scan()


def queries() -> dict[str, Callable[[str], Any]]:
    from aws_medallion_datalake_ray.pipelines.demos import DEMO_QUERIES
    from aws_medallion_datalake_ray.pipelines.queries import SQL_QUERIES

    return {**SQL_QUERIES, **DEMO_QUERIES}


def oracle_sql() -> dict[str, str]:
    from aws_medallion_datalake_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
