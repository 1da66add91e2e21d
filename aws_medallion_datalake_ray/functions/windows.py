"""Event-time windowing over a partitioned log — streaming-shaped semantics.

Ray Data is a batch engine with no event-time watermarks; the reference's
"streaming" is incremental batch (SURVEY §2.8).  These operators implement the
three standard window shapes over an ``events``-like table, per the ray_guide
pattern: tumbling/sliding as vectorized ``map_batches`` assignment (+ grouped
aggregate), session windows as ``groupby(key).map_groups`` over ts-sorted
groups.  Ordering assumption: session windows sort each key's rows by ts
inside the group — no global order needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


def tumbling_assign(batch: pa.Table, ts_col: str, unit: str = "hour") -> pa.Table:
    """Append ``window_start`` = ts floored to the unit (vectorized)."""
    return batch.append_column("window_start", pc.floor_temporal(batch[ts_col], unit=unit))


def sliding_assign(
    batch: pa.Table, ts_col: str, size_hours: int = 2, slide_hours: int = 1
) -> pa.Table:
    """Explode each row into the size/slide windows containing it.

    One output row per (input row, window); window_start = floor(ts, slide)
    - k*slide for k in [0, size/slide).  Vectorized: k copies of the batch
    with shifted window starts.
    """
    n_windows = size_hours // slide_hours
    base = pc.floor_temporal(batch[ts_col], unit="hour")
    if slide_hours > 1:
        # align to the slide grid: floor epoch-us to a multiple of slide_hours
        # (truncating int division is floor for the non-negative epochs here)
        slide_us = slide_hours * 3_600_000_000
        us = pc.cast(pc.cast(base, pa.timestamp("us")), pa.int64())
        aligned = pc.multiply(pc.divide(us, slide_us), slide_us)
        base = pc.cast(pc.cast(aligned, pa.timestamp("us")), base.type)
    parts = []
    for k in range(n_windows):
        shifted = pc.subtract(
            base, pa.scalar(k * slide_hours * 3_600_000_000, pa.duration("us"))
        )
        parts.append(batch.append_column("window_start", shifted))
    return pa.concat_tables(parts)


def sessionize_group(
    g: pd.DataFrame, ts_col: str = "ts", gap_minutes: int = 30
) -> pd.DataFrame:
    """Session ids within one key's rows: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``."""
    g = g.sort_values(ts_col, kind="stable")
    gap = g[ts_col].diff() > pd.Timedelta(minutes=gap_minutes)
    g["session_id"] = gap.cumsum().astype("int64")
    return g


def session_windows(
    ds: Dataset, key_col: str = "user_id", ts_col: str = "ts",
    gap_minutes: int = 30, value_col: str = "value",
) -> pd.DataFrame:
    """Per-key session aggregation: (key, session_start, n_events, sum_value)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = sessionize_group(g, ts_col, gap_minutes)
        out = g.groupby("session_id").agg(
            session_start=(ts_col, "min"),
            n_events=(ts_col, "size"),
            sum_value=(value_col, "sum"),
        )
        out[key_col] = g[key_col].iloc[0]
        return out.reset_index(drop=True)

    res = (
        ds.select_columns([key_col, ts_col, value_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
        .to_pandas()
    )
    res["n_events"] = res["n_events"].astype("int64")
    res["sum_value"] = res["sum_value"].round(4)
    return res[[key_col, "session_start", "n_events", "sum_value"]].sort_values(
        [key_col, "session_start"]
    ).reset_index(drop=True)


def sliding_window_agg(
    ds: Dataset, ts_col: str = "ts", value_col: str = "value",
    size_hours: int = 2, slide_hours: int = 1,
) -> pd.DataFrame:
    """Global sliding-window counts/sums (combiner pattern: per-batch partial
    aggregation before the small groupby)."""

    def partial(batch: pa.Table) -> pa.Table:
        w = sliding_assign(batch.select([ts_col, value_col]), ts_col,
                           size_hours, slide_hours)
        g = w.group_by("window_start").aggregate(
            [(value_col, "count"), (value_col, "sum")]
        )
        return g.rename_columns(["window_start", "p_n", "p_sum"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("p_n", alias_name="n_events"), Sum("p_sum", alias_name="s"))
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["s"].round(4)
    return out[["window_start", "n_events", "sum_value"]].sort_values(
        "window_start"
    ).reset_index(drop=True)


def scd2_group(
    g: pd.DataFrame, key_col: str, ts_col: str, attr_cols: list[str],
    tiebreak_cols: list[str], high_date: str,
) -> pd.DataFrame:
    """SCD2 versions within one key's change log: sort by event time, drop
    no-op rows (attrs identical to the previous row), close each version at
    the next change's timestamp (the high-date sentinel marks the current
    row — standard warehouse practice, and it keeps ``effective_to``
    non-null so value-hash comparison is exact)."""
    g = g.sort_values([ts_col, *tiebreak_cols], kind="stable")
    attrs = g[attr_cols]
    change = (attrs != attrs.shift()).any(axis=1)
    change.iloc[0] = True
    v = g.loc[change, [key_col, *attr_cols, ts_col]].rename(
        columns={ts_col: "effective_from"})
    v["effective_to"] = v["effective_from"].shift(-1)
    v["effective_to"] = v["effective_to"].fillna(pd.Timestamp(high_date))
    return v.reset_index(drop=True)


def scd2_build(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    high_date: str = "2099-12-31",
) -> Dataset:
    """Slowly-changing-dimension Type 2 from a change log.

    Input: one row per observed state ``(key, ts, attrs...)`` (no-op
    repeats allowed).  Output: one row per VERSION —
    ``(key, attrs..., effective_from, effective_to)`` with half-open
    validity ``[effective_from, effective_to)`` and the current version
    closed at ``high_date``.

    Distribution: ``groupby(key).map_groups`` — a hash shuffle on the
    dimension key; group size is one key's history (bounded by per-entity
    change counts, never the table).  The reference rebuilds dimensions by
    full overwrite each run (gold_digit_fixed.py:148-157); SCD2 is the
    versioned upgrade a warehouse needs for point-in-time joins (pairs with
    ``asof_join`` for "attribute as of order date" lookups).
    """
    cols = [key_col, ts_col, *attr_cols, *(tiebreak_cols or [])]
    return (
        ds.select_columns(cols)
        .groupby(key_col)
        .map_groups(
            scd2_group, batch_format="pandas",
            fn_kwargs={
                "key_col": key_col, "ts_col": ts_col,
                "attr_cols": list(attr_cols),
                "tiebreak_cols": list(tiebreak_cols or []),
                "high_date": high_date,
            },
        )
    )


def fill_time_gaps(
    ds: Dataset,
    group_cols: list[str],
    time_col: str,
    value_fills: dict[str, float | int],
    freq: str = "MS",
) -> Dataset:
    """Densify a grouped time series: one row per (group, period) for EVERY
    period between the observed min and max, missing cells filled with the
    given constants (the date-spine pattern — reporting over sparse
    aggregates needs explicit zeros, not absent rows).

    Distribution: the spine is bounded by the TIME SPAN (months over three
    decades ≈ 360 entries), never the data, so it ships to workers as a
    plain kwarg; distinct groups stay a hash-partitioned Dataset, the grid
    is built batch-side (each group row × spine), and observed values are
    attached with a co-partitioned left-outer ``Dataset.join`` on
    (group, period).  Nothing group- or data-proportional touches the
    driver.
    """
    import pyarrow.compute as _pc

    from aws_medallion_datalake_ray.functions.dedup import exact_dedup
    from aws_medallion_datalake_ray.functions.joins import _ncpu

    # the operator consumes its (already aggregated, series-sized) input
    # three times — bounds, distinct groups, join probe: pin it once
    ds = ds.materialize()
    bounds = ds.aggregate(Min(time_col), Max(time_col))
    lo, hi = bounds[f"min({time_col})"], bounds[f"max({time_col})"]
    spine = pd.date_range(pd.Timestamp(lo), pd.Timestamp(hi), freq=freq)
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        time_type = base.field(time_col).type
    else:  # pandas-block schema: numpy dtype → arrow type
        t = sch.types[sch.names.index(time_col)]
        time_type = t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(np.dtype(t))
    spine_arr = pa.array(spine.to_numpy()).cast(time_type)

    groups = exact_dedup(ds.select_columns(group_cols), tuple(group_cols))

    def expand(t: pa.Table, spine_a=spine_arr) -> pa.Table:
        n, m = t.num_rows, len(spine_a)
        idx = pa.array(np.repeat(np.arange(n), m))
        out = t.take(idx)
        tiled = pa.chunked_array([spine_a] * n) if n else spine_a.slice(0, 0)
        return out.append_column(time_col, tiled)

    grid = groups.map_batches(expand, batch_format="pyarrow")
    joined = grid.join(
        ds, join_type="left_outer",
        num_partitions=max(2, _ncpu() // 2),
        on=tuple(group_cols) + (time_col,),
    )

    def coalesce(t: pa.Table) -> pa.Table:
        for c, fill in value_fills.items():
            filled = _pc.fill_null(t[c], fill)
            t = t.set_column(t.column_names.index(c), c, filled)
        return t

    return joined.map_batches(coalesce, batch_format="pyarrow")
