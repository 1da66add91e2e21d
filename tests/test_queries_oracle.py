"""Driver-style oracle parity: every SQL-expressible query must match DuckDB
on row count, schema (column names), and order-insensitive values."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.pipelines.queries import ORACLE_SQL, SQL_QUERIES

import os

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    all columns, everything stringified."""
    if isinstance(df, pa.Table):
        df = df.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: f"{v}")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_query_matches_oracle(name, con):
    got = _canon(SQL_QUERIES[name](SF_DIR))
    exp = _canon(con.execute(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(exp.columns), f"{name}: column mismatch"
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, obj=name)
