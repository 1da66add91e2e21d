"""REST fan-out source (SURVEY S1): init-once auth, fan-out completeness,
retry behavior — on the deterministic no-network fake transport."""

import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.sources.rest import (
    FakeDigitTransport,
    RestFetcher,
    TransportError,
    read_rest_fanout,
)


def test_fanout_completeness_and_lineage(ray_session):
    ds = read_rest_fanout(
        entity_ids=[f"O{i}" for i in range(10)],
        endpoints=["horas", "resumo"],
        transport_factory=lambda: FakeDigitTransport(rows_per_entity=3),
        auth={"user": "u", "password": "p"},
        lineage={"api_source": "digit", "data_type": "horas_funcao"},
        concurrency=(1, 2),
    )
    t = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)),
        promote_options="permissive",
    )
    assert t.num_rows == 10 * 2 * 3
    assert set(t["endpoint"].to_pylist()) == {"horas", "resumo"}
    assert set(t["api_source"].to_pylist()) == {"digit"}
    # bronze normalization: everything stringified
    assert all(pa.types.is_string(f.type) for f in t.schema)


def test_token_acquired_once_per_actor():
    tr = FakeDigitTransport()
    f = RestFetcher(lambda: tr, auth={"user": "x"})
    assert tr.auth_calls == 1
    f({"endpoint": ["e"], "entity_id": ["1"]})
    f({"endpoint": ["e"], "entity_id": ["2"]})
    assert tr.auth_calls == 1  # per-actor, not per-batch


def test_transient_failure_retried():
    tr = FakeDigitTransport(fail_first_for=(("horas", "O1"),))
    f = RestFetcher(lambda: tr, auth={}, backoff_sec=0.0)
    out = f({"endpoint": ["horas", "horas"], "entity_id": ["O1", "O2"]})
    assert out.num_rows == 6  # O1 succeeded on retry


def test_permanent_failure_raises():
    class DeadTransport(FakeDigitTransport):
        def get(self, endpoint, entity_id, token):
            raise TransportError("always down")

    f = RestFetcher(lambda: DeadTransport(), auth={}, max_retries=2, backoff_sec=0.0)
    with pytest.raises(TransportError, match="after retries"):
        f({"endpoint": ["e"], "entity_id": ["1"]})


def test_incremental_rest_ingest_watermark_resume(tmp_path, ray_session):
    """Second run with the same job_id skips completed entity batches and
    ingests only the newly arrived one (ledger high-water mark, S1 x I1)."""
    from aws_medallion_datalake_ray.pipelines.incremental import (
        incremental_rest_ingest,
    )
    from aws_medallion_datalake_ray.state.table import LakeTable

    t = LakeTable.create(str(tmp_path / "t"), stats_cols=("entity_id",))
    kw = dict(
        endpoints=["horas"],
        transport_factory=lambda: FakeDigitTransport(rows_per_entity=2),
        job_id="j1",
        run_ts="2024-01-01T00:00:00",
    )
    r1 = incremental_rest_ingest(t, {"b0": ["O0", "O1"]}, **kw)
    assert r1["processed"] == ["b0"] and r1["skipped"] == []
    assert t.scan().count() == 4
    r2 = incremental_rest_ingest(t, {"b0": ["O0", "O1"], "b1": ["O2"]}, **kw)
    assert r2["processed"] == ["b1"] and r2["skipped"] == ["b0"]
    assert t.scan().count() == 6  # b0 NOT double-ingested
