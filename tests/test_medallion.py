"""Medallion promotion over source_files: bronze stringly -> silver typed ->
gold aggregates, verified against a DuckDB oracle on the same data."""

import duckdb
import pyarrow as pa
import pytest
import ray.data

from aws_medallion_datalake_ray.pipelines.medallion import (
    bronze_normalize,
    gold_quality_profile,
    run_medallion,
    silver_clean_batch,
)


@pytest.fixture(scope="module")
def medallion(tmp_path_factory, source_files_small):
    root = str(tmp_path_factory.mktemp("medallion"))
    tables = run_medallion(source_files_small, root, run_ts="2024-01-01T00:00:00")
    return tables, source_files_small


def test_bronze_is_stringly_with_lineage(source_files_small):
    out = bronze_normalize(source_files_small.slice(0, 10), extraction_date="2024-01-01")
    assert all(pa.types.is_string(f.type) or pa.types.is_large_string(f.type) for f in out.schema)
    assert out["api_source"].to_pylist()[0] == "fixtures"
    assert out["extraction_date"].to_pylist()[0] == "2024-01-01"


def test_silver_clean_derives_invariants(source_files_small):
    import hashlib

    out = silver_clean_batch(source_files_small.slice(0, 5))
    row = out.to_pylist()[0]
    assert row["content_sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()
    assert row["size_bytes"] == len(row["content"].encode())


def test_silver_drops_dirty_keys():
    dirty = pa.table(
        {
            "repo": ["r1", "", None, "r2"],
            "path": ["p", "p", "p", "  p2  "],
            "commit": ["c1", "c2", "c3", "C4"],
            "lang": ["PY", "py", "py", "go"],
            "content": pa.array(["a", "b", "c", "d"], pa.large_string()),
        }
    )
    out = silver_clean_batch(dirty)
    assert out.num_rows == 2
    assert out["lang"].to_pylist() == ["py", "go"]
    assert out["path"].to_pylist()[1] == "p2"  # trimmed
    assert out["commit"].to_pylist()[1] == "c4"  # lowercased


def test_silver_rowcount_matches_duckdb_oracle(medallion):
    tables, base = medallion
    got = tables["silver"].to_arrow()
    expected = duckdb.sql(
        """SELECT count(*) FROM (
             SELECT DISTINCT repo, path, "commit" FROM base
             WHERE repo IS NOT NULL AND repo <> '' AND path <> '' AND "commit" <> ''
           )"""
    ).fetchone()[0]
    assert got.num_rows == expected


def test_gold_lang_summary_matches_duckdb(medallion):
    tables, base = medallion
    got = (
        tables["lang_summary"].to_arrow().to_pandas().sort_values("lang").reset_index(drop=True)
    )
    exp = duckdb.sql(
        """SELECT lang, count(*) AS n_files,
                  sum(strlen(content)) AS total_bytes
           FROM (SELECT DISTINCT repo, path, "commit", lang, content FROM base)
           GROUP BY lang ORDER BY lang"""
    ).df()
    assert list(got["lang"]) == list(exp["lang"])
    assert list(got["n_files"]) == list(exp["n_files"])
    assert [int(x) for x in got["total_bytes"]] == [int(x) for x in exp["total_bytes"]]


def test_gold_repo_summary_matches_duckdb(medallion):
    tables, base = medallion
    got = (
        tables["repo_summary"].to_arrow().to_pandas().sort_values("repo").reset_index(drop=True)
    )
    exp = duckdb.sql(
        """SELECT repo, count(*) AS n_files FROM
             (SELECT DISTINCT repo, path, "commit" FROM base)
           GROUP BY repo ORDER BY repo"""
    ).df()
    assert list(got["repo"]) == list(exp["repo"])
    assert list(got["n_files"]) == list(exp["n_files"])


def test_gold_quality_profile(medallion):
    tables, _ = medallion
    prof = tables["quality_profile"].to_arrow().to_pandas().set_index("column")
    assert (prof["completeness_pct"] == 100.0).all()
    assert (prof["status"] == "GOOD").all()


def test_quality_profile_flags_nulls():
    t = pa.table({"a": [1, None, None, None], "b": [1, 2, 3, 4]})
    prof = gold_quality_profile(ray.data.from_arrow(t)).to_pandas().set_index("column")
    assert prof.loc["a", "status"] == "POOR"
    assert prof.loc["b", "status"] == "GOOD"
