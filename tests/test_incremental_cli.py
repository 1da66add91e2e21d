"""Incremental watermark-gated promotion (SURVEY I1-I4) + CLI orchestration."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from aws_medallion_datalake_ray.pipelines.incremental import (
    discover_partitions,
    incremental_promote,
)
from aws_medallion_datalake_ray.sources.fixtures import make_source_files
from aws_medallion_datalake_ray.state.ledger import Ledger
from aws_medallion_datalake_ray.state.table import LakeTable

TS = "2024-01-01T00:00:00"


@pytest.fixture()
def partitioned_input(tmp_path):
    base = make_source_files(900, seed=5)
    root = tmp_path / "incoming"
    for i, day in enumerate(["2024-01-01", "2024-01-02", "2024-01-03"]):
        d = root / day
        d.mkdir(parents=True)
        pq.write_table(base.slice(i * 300, 300), str(d / "part-0.parquet"))
    return str(root), base


def test_incremental_processes_once_and_resumes(tmp_path, partitioned_input):
    root, base = partitioned_input
    target = LakeTable.create(str(tmp_path / "tbl"))

    r1 = incremental_promote(root, target, lambda ds: ds, job_id="inc-1", run_ts=TS)
    assert sorted(r1["processed"]) == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert sum(f.rows for f in target.files()) == 900

    # rerun with the same job id: everything already completed -> no-op
    r2 = incremental_promote(root, target, lambda ds: ds, job_id="inc-1", run_ts=TS)
    assert r2["processed"] == [] and len(r2["skipped"]) == 3
    assert sum(f.rows for f in target.files()) == 900

    # a late partition lands: only it is processed (watermark-set semantics)
    extra = make_source_files(100, seed=9)
    d = os.path.join(root, "2023-12-31")
    os.makedirs(d)
    pq.write_table(extra, os.path.join(d, "part-0.parquet"))
    r3 = incremental_promote(root, target, lambda ds: ds, job_id="inc-1", run_ts=TS)
    assert r3["processed"] == ["2023-12-31"]
    assert sum(f.rows for f in target.files()) == 1000

    # lineage recorded per partition
    led = Ledger(str(tmp_path / "tbl"), "inc-1")
    t = led.state["tasks"]["2024-01-02"]
    assert t["status"] == "completed" and t["input_files"] and t["output_files"]


def test_discover_partitions(partitioned_input):
    root, _ = partitioned_input
    parts = discover_partitions(root)
    assert list(parts) == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert all(len(v) == 1 for v in parts.values())


# ---------------------------------------------------------------- CLI
# The CLI owns its own Ray session, so it runs as a subprocess (the test
# session's Ray is separate).


def _run_cli(*args):
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "aws_medallion_datalake_ray.cli", *args],
        capture_output=True, text=True, env=env, timeout=300,
    )
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
    return r.returncode, json.loads(line)


@pytest.mark.slow
def test_cli_pipeline_and_maintenance(tmp_path):
    src = tmp_path / "raw.parquet"
    pq.write_table(make_source_files(800, seed=3), str(src))
    rc, out = _run_cli("pipeline", "--input", str(src), "--root", str(tmp_path / "lake"))
    assert rc == 0 and out["status"] == "ok"
    assert out["tables"]["silver"]["rows"] > 0

    silver = str(tmp_path / "lake" / "silver")
    rc, out = _run_cli("compact", "--table", silver, "--target-mb", "8")
    assert rc == 0 and out["status"] == "ok"
    rc, out = _run_cli("verify-scan", "--table", silver)
    assert rc == 0 and out["rows"] == out["rows"]  # present
    assert out["checksum"] > 0


def test_cli_failure_is_structured(tmp_path):
    rc, out = _run_cli("pipeline", "--input", str(tmp_path / "missing.parquet"),
                       "--root", str(tmp_path / "lake2"))
    assert rc == 1
    assert out["status"] == "failed"
    assert out["failed_stage"] == "bronze"
    assert "error" in out


def test_cli_dedup_near(tmp_path):
    """dedup-near subcommand: planted near-dups removed via the CLI surface."""
    from aws_medallion_datalake_ray.state.table import LakeTable

    base = make_source_files(600, seed=21)
    bp = base.slice(0, 4).to_pandas()
    bp["path"] = "zzz_dup_" + bp["path"]
    bp["commit"] = [f"{i:040x}" for i in range(4)]
    bp["content"] = bp["content"] + "// planted\n"
    import pyarrow as pa

    t = LakeTable.create(str(tmp_path / "t"))
    t.append(pa.concat_tables(
        [base, pa.Table.from_pandas(bp, preserve_index=False).cast(base.schema)]
    ))
    rc, out = _run_cli(
        "dedup-near", "--table", str(tmp_path / "t"), "--threshold", "0.9"
    )
    assert rc == 0 and out["status"] == "ok"
    assert out["near_dup_rows"] >= 4


def test_cli_evolve_and_change_feed(tmp_path):
    """evolve-schema and change-feed subcommands over a real table."""
    import pyarrow as pa

    base = make_source_files(300, seed=31)
    t = LakeTable.create(str(tmp_path / "t"))
    t.append(base, run_ts=TS)
    s1 = t.store.head_id()

    rc, out = _run_cli("evolve-schema", "--table", str(tmp_path / "t"),
                       "--add", "stars:int64:0", "--rename", "lang=language")
    assert rc == 0 and out["status"] == "ok"
    assert out["summary"]["added_cols"] == ["stars"]

    # merge an in-place rewrite so the feed has one update
    t2 = LakeTable(str(tmp_path / "t"))
    upd = base.slice(0, 3).set_column(
        4, "content", pa.array(["a", "b", "c"], pa.large_string()))
    upd = upd.rename_columns(
        [c if c != "lang" else "language" for c in upd.column_names])
    upd = upd.append_column("stars", pa.array([1, 1, 1], pa.int64()))
    t2.merge(upd, run_ts="2024-01-02T00:00:00")

    rc, out = _run_cli("change-feed", "--table", str(tmp_path / "t"),
                       "--from-snapshot", str(s1))
    assert rc == 0 and out["status"] == "ok"
    assert out["changes"] == {"update": 3}
