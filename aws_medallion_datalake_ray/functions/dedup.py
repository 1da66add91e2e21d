"""Deduplication operators (exact; near-dup variants live alongside).

Exact dedup re-expresses the reference's ``.distinct()`` on silver/gold
tables (``silver_digit_clean.py:90,98,106``, ``gold_digit_fixed.py:49,67``)
in a scale-safe shape: instead of a per-key shuffle (one tiny group per
distinct key), rows are hash-partitioned into ``num_partitions`` buckets by
key hash and each *bucket* is deduplicated with one vectorized
``drop_duplicates`` — group count = P, not n_distinct, so per-group overhead
is amortized.  The same partitioner underpins MERGE (salted hash join).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from aws_medallion_datalake_ray.functions.hashing import hash_batch_cols, salted_partition

_PART = "__dedup_part"


def _add_part(key_cols: tuple[str, ...], num_partitions: int):
    def fn(batch: pa.Table) -> pa.Table:
        h = hash_batch_cols(batch, key_cols)
        return batch.append_column(_PART, pa.array(salted_partition(h, num_partitions)))

    return fn


def exact_dedup(ds: Dataset, key_cols, num_partitions: int = 64) -> Dataset:
    """Keep one arbitrary row per distinct key tuple (D1).

    Use when duplicates are exact replicas on the key (e.g. source_files,
    where ``content`` is uniquely determined by (repo, path, commit)).
    """
    key_cols = tuple(key_cols)

    def dedup_group(df):
        return df.drop_duplicates(list(key_cols))

    out = (
        ds.map_batches(_add_part(key_cols, num_partitions), batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(dedup_group, batch_format="pandas")
    )
    return out.drop_columns([_PART])


def keep_latest(ds: Dataset, key_cols, order_col: str, num_partitions: int = 64) -> Dataset:
    """Keep the row with the max ``order_col`` per key tuple (keep-latest dedup,
    the engine's generalization of the reference's weekly master-data
    overwrite, ``bronze_digit_master_weekly.py:108-110``)."""
    key_cols = tuple(key_cols)

    def latest_group(df):
        df = df.sort_values(order_col, kind="stable")
        return df.drop_duplicates(list(key_cols), keep="last")

    out = (
        ds.map_batches(_add_part(key_cols, num_partitions), batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(latest_group, batch_format="pandas")
    )
    return out.drop_columns([_PART])
