"""Bronze → Silver → Gold medallion promotion, Ray-Data-first.

Re-expresses the reference's three Glue jobs (``bronze_digit_daily.py``,
``silver_digit_clean.py``, ``gold_digit_fixed.py`` / ``gold_agilean.py``) over
the engine's canonical source-code table:

- **bronze**: stringly-typed rows + lineage metadata columns (ref
  ``bronze_digit.py:84-90,131-139``) — here: normalize every input column to
  string and append ``data_type / api_source / extraction_date``.
- **silver**: typed projection, trim/clean, null-key filter, exact dedup (ref
  ``silver_digit_clean.py:69-116``) — here: restore types, normalize ``lang``,
  trim ``path``, drop null/empty keys, dedup on (repo, path, commit), and
  derive the verification invariants ``content_sha256`` / ``size_bytes``.
- **gold**: dims + facts + aggregate metric tables + a data-quality profile
  (ref ``gold_digit_fixed.py:34-146``, ``gold_agilean.py:22-162``).

Every stage is a ``TableTransform`` (name + apply(ds) -> ds) so pytest can
replay each transform independently (the reference's extension surface is
config-driven job templating, SURVEY.md §2.11).

All timestamps come from a job-level ``run_ts`` — never the wall clock — so
reruns are byte-identical (ref anti-pattern: ``current_timestamp()`` at
``silver_digit_clean.py:80``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from aws_medallion_datalake_ray.functions import cleaning as cl
from aws_medallion_datalake_ray.functions.dedup import exact_dedup
from aws_medallion_datalake_ray.functions.hashing import sha256_col
from aws_medallion_datalake_ray.schema import SOURCE_FILES_KEY
from aws_medallion_datalake_ray.state.table import LakeTable


@dataclass
class TableTransform:
    name: str
    apply: Callable[[Dataset], Dataset]


# ------------------------------------------------------------------ bronze


def bronze_normalize(batch: pa.Table, *, extraction_date: str, api_source: str = "fixtures",
                     data_type: str = "source_files") -> pa.Table:
    out = cl.stringify_batch(batch)
    return cl.add_constant_columns(
        out,
        {"data_type": data_type, "api_source": api_source, "extraction_date": extraction_date},
    )


def bronze_transform(extraction_date: str) -> TableTransform:
    return TableTransform(
        "bronze_normalize",
        lambda ds: ds.map_batches(
            lambda b: bronze_normalize(b, extraction_date=extraction_date),
            batch_format="pyarrow",
        ),
    )


def promote_bronze(
    raw: Dataset, bronze: LakeTable, run_ts: str, extraction_date: str
) -> None:
    bronze.append(
        bronze_transform(extraction_date).apply(raw), run_ts=run_ts, operation="bronze-ingest"
    )


# ------------------------------------------------------------------ silver


def silver_clean_batch(batch: pa.Table) -> pa.Table:
    """Typed projection + cleaning + invariant derivation for source_files."""
    repo = cl.trim(pc.cast(batch["repo"], pa.string()))
    path = cl.trim(pc.cast(batch["path"], pa.string()))
    commit = pc.utf8_lower(cl.trim(pc.cast(batch["commit"], pa.string())))
    lang = pc.utf8_lower(cl.trim(pc.cast(batch["lang"], pa.string())))
    content = pc.cast(batch["content"], pa.large_string())
    out = pa.table(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": content,
            "content_sha256": pa.array(sha256_col(content), pa.string()),
            "size_bytes": pc.binary_length(content).cast(pa.int64()),
        }
    )
    return cl.drop_null_keys(out, ["repo", "path", "commit"])


def silver_transform() -> TableTransform:
    return TableTransform(
        "silver_clean",
        lambda ds: exact_dedup(
            ds.map_batches(silver_clean_batch, batch_format="pyarrow"),
            SOURCE_FILES_KEY,
        ),
    )


def promote_silver(bronze: LakeTable, silver: LakeTable, run_ts: str) -> None:
    """Full-refresh silver promotion (the reference's overwrite mode,
    ``silver_digit_clean.py:127`` — but as an atomic snapshot swap)."""
    cols = ["repo", "path", "commit", "lang", "content"]
    ds = bronze.scan(columns=cols)
    silver.overwrite(silver_transform().apply(ds), run_ts=run_ts)


# ------------------------------------------------------------------ gold


def gold_repo_summary(silver_ds: Dataset) -> Dataset:
    """fato_resumo analog: per-repo file/commit/byte rollup.

    Pre-aggregation happens inside map_batches (partial per batch) before the
    small groupby — the combiner pattern for scale (SURVEY.md §4 skew row).
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("repo").aggregate([("commit", "count"), ("size_bytes", "sum")])
        return g.rename_columns(["repo", "n_files", "total_bytes"])

    partials = silver_ds.select_columns(["repo", "commit", "size_bytes"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return partials.groupby("repo").aggregate(
        Sum("n_files", alias_name="n_files"),
        Sum("total_bytes", alias_name="total_bytes"),
    )


def gold_lang_summary(silver_ds: Dataset) -> Dataset:
    """dim/metric table per language (grouped aggregate, ref gold_agilean.py:85-91)."""
    return silver_ds.select_columns(["lang", "size_bytes"]).groupby("lang").aggregate(
        Count(alias_name="n_files"),
        Sum("size_bytes", alias_name="total_bytes"),
        Mean("size_bytes", alias_name="avg_bytes"),
        Max("size_bytes", alias_name="max_bytes"),
        Min("size_bytes", alias_name="min_bytes"),
    )


def gold_quality_profile(silver_ds: Dataset) -> pa.Table:
    """Per-column completeness profile with GOOD/FAIR/POOR status (ref
    ``gold_agilean.py:113-129``): one partial pass per batch + tiny reduce —
    the same partial+final shape as the stats collector."""

    def partial(batch: pa.Table) -> pa.Table:
        names, totals, valids = [], [], []
        for c in batch.column_names:
            names.append(c)
            totals.append(len(batch))
            valids.append(len(batch) - batch[c].null_count)
        return pa.table(
            {"column": pa.array(names), "n": pa.array(totals, pa.int64()),
             "n_valid": pa.array(valids, pa.int64())}
        )

    agg = (
        silver_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n", alias_name="n"), Sum("n_valid", alias_name="n_valid"))
        .to_pandas()
    )
    pct = (100.0 * agg["n_valid"] / agg["n"].clip(lower=1)).round(2)
    status = pct.map(lambda p: "GOOD" if p >= 95 else ("FAIR" if p >= 80 else "POOR"))
    return pa.table(
        {
            "column": pa.array(agg["column"], pa.string()),
            "completeness_pct": pa.array(pct, pa.float64()),
            "status": pa.array(status, pa.string()),
        }
    )


def promote_gold(silver: LakeTable, gold_root: str, run_ts: str) -> dict[str, LakeTable]:
    """Build the gold layer as LakeTables under ``gold_root``."""
    out: dict[str, LakeTable] = {}
    ds = silver.scan(columns=["repo", "path", "commit", "lang", "size_bytes"])
    specs: list[tuple[str, Dataset | pa.Table]] = [
        ("repo_summary", gold_repo_summary(ds)),
        ("lang_summary", gold_lang_summary(ds)),
        ("quality_profile", gold_quality_profile(ds)),
    ]
    for name, data in specs:
        t = LakeTable.create(f"{gold_root}/{name}", stats_cols=())
        t.overwrite(data, run_ts=run_ts)
        out[name] = t
    return out


# ------------------------------------------------------------------ full run


def run_medallion(
    raw: Dataset | pa.Table,
    root: str,
    run_ts: str = "2024-01-01T00:00:00",
    extraction_date: str = "2024-01-01",
) -> dict[str, LakeTable]:
    """The flagship pipeline: raw -> bronze -> silver -> gold (the reference's
    Step-Functions DAG, ``terraform/digit_pipeline.tf:6-75``, as one driver)."""
    if isinstance(raw, pa.Table):
        raw = ray.data.from_arrow(raw)
    bronze = LakeTable.create(f"{root}/bronze", stats_cols=("repo", "lang"))
    silver = LakeTable.create(f"{root}/silver")
    promote_bronze(raw, bronze, run_ts, extraction_date)
    promote_silver(bronze, silver, run_ts)
    gold = promote_gold(silver, f"{root}/gold", run_ts)
    return {"bronze": bronze, "silver": silver, **gold}
