"""Vectorized cleaning/normalization kernels — the reference's silver rules.

Each kernel is a pure function over ``pyarrow`` arrays/tables, designed to be
composed inside ``Dataset.map_batches(fn, batch_format="pyarrow")``.  They
re-express the reference's per-record transforms (SURVEY.md §2.2):

- M1  stringify-normalize           (ref ``bronze_digit.py:131-139``)
- M2  constant metadata columns     (ref ``bronze_digit.py:84-90``)
- M3  typed projection select/cast  (ref ``silver_digit_clean.py:69-116``)
- M4  trim                          (ref ``silver_digit_clean.py:75``)
- M5  control-char scrub            (ref ``docs/SILVER_API_DIGIT_TRANSFORMACAO.md:27``)
- M6  digits-only (CPF/PIS)         (ref doc ``:28``)
- M7  null-coalesce default         (ref ``silver_digit_clean.py:87-88``)
- M8  invalid-date -> null          (ref doc ``:17``)
- M9  S/N -> boolean                (ref doc ``:30-31``)
- M10 unix epoch -> timestamp       (ref doc ``:54``; produced ``bronze_digit_3months.py:111``)
- M11 run-ts stamp (deterministic)  (ref ``silver_digit_clean.py:80`` — nondeterministic
      ``current_timestamp()`` there; here a job-level run_ts so reruns are byte-identical)
- M12 null-key filter               (ref ``silver_digit_clean.py:81``)
- M13 JSON-path extraction          (ref ``bronze_agilean.py:124-144``)
- M15 JSON array explode            (ref doc ``:68-79``)
- M16 CASE bucketing                (ref ``sql/examples/athena_queries_digit.sql:67-90``)
- M17 date-part extraction          (ref ``docs/GOLD_API_DIGIT_STAR_SCHEMA.md:42-47``)
"""

from __future__ import annotations

import json
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- M1 / M2


def stringify_batch(batch: pa.Table) -> pa.Table:
    """Cast every column to string; nested types -> JSON strings; null -> ''."""
    cols = {}
    for name in batch.column_names:
        col = batch[name]
        t = col.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            out = col
        elif pa.types.is_nested(t):
            vals = col.to_pylist()
            out = pa.array(
                [None if v is None else json.dumps(v, ensure_ascii=False) for v in vals],
                pa.string(),
            )
        else:
            out = pc.cast(col, pa.string())
        cols[name] = pc.fill_null(out, "")
    return pa.table(cols)


def add_constant_columns(batch: pa.Table, constants: dict) -> pa.Table:
    """Append lineage/metadata constant columns (M2)."""
    n = len(batch)
    for name, value in constants.items():
        if isinstance(value, datetime):
            arr = pa.nulls(n, pa.timestamp("us")).fill_null(value)
        else:
            arr = pa.nulls(n, pa.string()).fill_null(str(value))
        batch = batch.append_column(name, arr)
    return batch


# ---------------------------------------------------------------- M3


def typed_projection(batch: pa.Table, spec: list[tuple[str, str, pa.DataType]]) -> pa.Table:
    """Select+rename+cast: spec = [(src_col, dst_col, arrow_type), ...].

    Cast failures on dirty strings (e.g. non-numeric TotalHoras) become null
    (safe cast), matching Spark's permissive cast-to-null semantics.
    """
    cols = {}
    for src, dst, typ in spec:
        col = batch[src]
        if typ.equals(col.type):
            cols[dst] = col
        else:
            try:
                cols[dst] = pc.cast(col, typ)
            except pa.ArrowInvalid:
                # safe cast: invalid entries -> null
                vals = col.to_pylist()
                out = []
                for v in vals:
                    try:
                        out.append(None if v in (None, "") else _py_cast(v, typ))
                    except (ValueError, TypeError):
                        out.append(None)
                cols[dst] = pa.array(out, typ)
    return pa.table(cols)


def _py_cast(v, typ: pa.DataType):
    if pa.types.is_floating(typ):
        return float(v)
    if pa.types.is_integer(typ):
        return int(float(v))
    if pa.types.is_boolean(typ):
        return v in ("true", "True", "1", "S")
    return v


# ---------------------------------------------------------------- M4-M10


def trim(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.utf8_trim_whitespace(col)


def scrub_control_chars(col) -> pa.Array:
    """Remove tabs/newlines/CRs from names (M5)."""
    return pc.replace_substring_regex(col, r"[\t\n\r]", "")


def digits_only(col) -> pa.Array:
    """Keep only digits (CPF '123.456.789-00' -> '12345678900') (M6)."""
    return pc.replace_substring_regex(col, r"\D", "")


def coalesce_default(col, default: str = "") -> pa.Array:
    return pc.fill_null(col, default)


def invalid_date_to_null(col, sentinel: str = "0000-00-00") -> pa.Array:
    return pc.if_else(pc.equal(col, sentinel), pa.scalar(None, pa.string()), col)


def flag_to_bool(col, true_value: str = "S") -> pa.Array:
    return pc.equal(col, true_value)


def epoch_to_timestamp(col) -> pa.Array:
    """Unix-epoch string/int -> timestamp[s] (M10)."""
    as_int = pc.cast(col, pa.int64()) if not pa.types.is_integer(col.type) else col
    return pc.cast(as_int, pa.timestamp("s"))


def stamp_run_ts(batch: pa.Table, col_name: str, run_ts: datetime) -> pa.Table:
    """M11 with determinism: constant job-level timestamp, not wall clock."""
    arr = pa.nulls(len(batch), pa.timestamp("us")).fill_null(run_ts)
    return batch.append_column(col_name, arr)


# ---------------------------------------------------------------- M12


def drop_null_keys(batch: pa.Table, key_cols: list[str], empty_is_null: bool = True) -> pa.Table:
    """Filter rows whose key columns are null (or empty-string)."""
    mask = None
    for c in key_cols:
        valid = pc.is_valid(batch[c])
        if empty_is_null and pa.types.is_string(batch[c].type):
            valid = pc.and_(valid, pc.not_equal(pc.fill_null(batch[c], ""), ""))
        mask = valid if mask is None else pc.and_(mask, valid)
    return batch.filter(mask)


# ---------------------------------------------------------------- M13 / M15


def json_extract(col, path: list[str]):
    """Navigate a JSON-string column by key path; None where missing (M13)."""
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            cur = json.loads(v)
            for k in path:
                cur = cur[k] if isinstance(cur, dict) else None
                if cur is None:
                    break
            out.append(
                cur if isinstance(cur, str) or cur is None else json.dumps(cur, ensure_ascii=False)
            )
        except (json.JSONDecodeError, KeyError, TypeError):
            out.append(None)
    return pa.array(out, pa.string())


def explode_json_array(
    batch: pa.Table, json_col: str, element_fields: list[str], keep_cols: list[str]
) -> pa.Table:
    """Explode a JSON-string array column into one row per element (M15).

    Keeps ``keep_cols`` replicated; adds one string column per element field.
    Rows with empty/invalid arrays disappear (matching an inner explode).
    """
    rows_idx: list[int] = []
    field_vals: dict[str, list] = {f: [] for f in element_fields}
    for i, v in enumerate(batch[json_col].to_pylist()):
        if not v:
            continue
        try:
            arr = json.loads(v)
        except json.JSONDecodeError:
            continue
        if not isinstance(arr, list):
            continue
        for el in arr:
            if not isinstance(el, dict):
                continue
            rows_idx.append(i)
            for f in element_fields:
                ev = el.get(f)
                field_vals[f].append(None if ev is None else str(ev))
    idx = pa.array(rows_idx, pa.int64())
    out = batch.select(keep_cols).take(idx)
    for f in element_fields:
        out = out.append_column(f, pa.array(field_vals[f], pa.string()))
    return out


# ---------------------------------------------------------------- M16 / M17


def case_bucket(col, edges: list[float], labels: list[str]) -> pa.Array:
    """CASE WHEN bucketing: len(labels) == len(edges)+1; edges are upper
    bounds (value < edge). Vectorized via numpy searchsorted."""
    vals = np.asarray(pc.cast(col, pa.float64()).to_pandas(), dtype=float)
    idx = np.searchsorted(np.asarray(edges, dtype=float), vals, side="right")
    lab = np.asarray(labels, dtype=object)
    out = lab[idx]
    out[np.isnan(vals)] = None
    return pa.array(out, pa.string())


_NOME_MES = pa.array(
    ["janeiro", "fevereiro", "março", "abril", "maio", "junho", "julho",
     "agosto", "setembro", "outubro", "novembro", "dezembro"], pa.string()
)
_NOME_DIA_SEMANA = pa.array(
    ["segunda-feira", "terça-feira", "quarta-feira", "quinta-feira",
     "sexta-feira", "sábado", "domingo"], pa.string()
)


def date_parts(col) -> dict[str, pa.Array]:
    """ano/mes/dia/trimestre/semestre/dia_semana/eh_fim_semana plus the
    spelled-out ``nome_mes`` / ``nome_dia_semana`` from a timestamp column
    (dim_tempo derivation, M17; ref docs/GOLD_API_DIGIT_STAR_SCHEMA.md:42-47
    'Nomes por extenso')."""
    ts = col if pa.types.is_timestamp(col.type) else pc.cast(col, pa.timestamp("us"))
    month = pc.month(ts)
    dow = pc.day_of_week(ts)  # Monday=0 .. Sunday=6
    return {
        "ano": pc.year(ts),
        "mes": month,
        "dia": pc.day(ts),
        "trimestre": pc.quarter(ts),
        "semestre": pc.if_else(pc.less_equal(month, 6), 1, 2),
        "nome_mes": pc.take(_NOME_MES, pc.subtract(month, 1)),
        "dia_semana": dow,
        "nome_dia_semana": pc.take(_NOME_DIA_SEMANA, dow),
        "eh_fim_semana": pc.greater_equal(dow, 5),
    }
