"""CHECK constraints (expectations): in-stream ingress validation.

The reference has no constraint mechanism at all — a bad load lands in the
table and hits consumers (``silver_digit_clean.py:127``); here a violating
write fails BEFORE its snapshot commits."""

import pyarrow as pa
import pytest

import ray.data

from aws_medallion_datalake_ray.sources.fixtures import make_source_files, make_updates
from aws_medallion_datalake_ray.state.table import ConstraintViolation, LakeTable

TS = "2024-01-01T00:00:00"


@pytest.fixture()
def table(tmp_path):
    t = LakeTable.create(str(tmp_path / "tbl"))
    t.set_constraints([
        ("repo", "not-null"),
        ("lang", "in", ["py", "js", "go", "rs", "java", "c", "cpp", "ts", "md", "toml"]),
    ])
    return t


def _with_lang(tab: pa.Table, lang_values) -> pa.Table:
    i = tab.schema.get_field_index("lang")
    return tab.set_column(i, "lang", pa.array(lang_values, pa.string()))


def test_clean_append_passes_and_persists(table, tmp_path):
    table.append(make_source_files(100, seed=1), run_ts=TS)
    assert table.scan().count() == 100
    # constraints persist via table.json across re-open
    again = LakeTable(str(tmp_path / "tbl"))
    assert ("repo", "not-null") in [tuple(t) for t in again.constraints]


def test_violating_arrow_append_fails_before_commit(table):
    base = make_source_files(50, seed=2)
    bad = _with_lang(base, ["cobol"] * 50)
    head = table.store.head_id()
    with pytest.raises(ConstraintViolation, match="lang in"):
        table.append(bad, run_ts=TS)
    assert table.store.head_id() == head  # nothing committed


def test_violating_dataset_append_fails_in_stream(table):
    base = make_source_files(50, seed=3)
    bad = ray.data.from_arrow(_with_lang(base, ["py"] * 49 + [None]))
    head = table.store.head_id()
    with pytest.raises(Exception, match="violated by 1 row"):
        table.append(bad, run_ts=TS)
    assert table.store.head_id() == head
    assert table.scan().count() == 0


def test_null_fails_comparison_terms(tmp_path):
    t = LakeTable.create(str(tmp_path / "cmp"))
    t.set_constraints([("lang", "in", ["py"])])
    base = make_source_files(10, seed=4)
    with pytest.raises(ConstraintViolation):
        t.append(_with_lang(base, ["py"] * 9 + [None]), run_ts=TS)


def test_merge_update_side_gated(table):
    base = make_source_files(100, seed=5)
    table.append(base, run_ts=TS)
    upd = make_updates(base, 10, seed=6)
    bad = _with_lang(upd, ["fortran"] * len(upd))
    fp = table.content_checksum(("repo", "path", "lang"))
    with pytest.raises(Exception, match="constraint"):
        table.merge(bad, run_ts=TS)
    assert table.content_checksum(("repo", "path", "lang")) == fp


def test_update_where_set_constant_gated(table):
    table.append(make_source_files(50, seed=7), run_ts=TS)
    with pytest.raises(ConstraintViolation):
        table.update_where([("lang", "==", "py")], {"lang": "brainfuck"},
                           run_ts=TS)
    # a legal SET passes
    res = table.update_where([("lang", "==", "py")], {"lang": "js"}, run_ts=TS)
    assert res["files_rewritten"] >= 0


def test_maintenance_exempt_from_constraints(tmp_path):
    # rows written before the constraint tightened must still compact
    t = LakeTable.create(str(tmp_path / "grandfather"))
    t.append(make_source_files(100, seed=8), run_ts=TS)
    t.set_constraints([("lang", "in", ["py"])])  # most rows now "violate"
    fp = t.content_checksum(("repo", "path", "lang"))
    t.compact(min_files_per_bin=1, run_ts=TS)
    assert t.content_checksum(("repo", "path", "lang")) == fp


def test_unknown_op_rejected_eagerly(table):
    with pytest.raises(ValueError, match="unknown constraint op"):
        table.set_constraints([("lang", "~=", "py")])
