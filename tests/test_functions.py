"""Unit tests for the pure vectorized kernels (no Ray needed)."""

import json
from datetime import datetime

import numpy as np
import pyarrow as pa
import pytest

from aws_medallion_datalake_ray.functions import cleaning as cl
from aws_medallion_datalake_ray.functions.hashing import (
    hash_col,
    hash_cols,
    salted_partition,
    sha256_col,
)
from aws_medallion_datalake_ray.functions.zorder import hilbert_key, interleave_bits, zorder_key


# ---------------------------------------------------------------- hashing


def test_hash_col_stable_and_distinct():
    a = hash_col(pa.array(["x", "y", "x", None]))
    b = hash_col(pa.array(["x", "y", "x", None]))
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_hash_cols_order_sensitive():
    h1 = hash_cols(pa.array(["a"]), pa.array(["b"]))
    h2 = hash_cols(pa.array(["b"]), pa.array(["a"]))
    assert h1[0] != h2[0]


def test_salted_partition_spreads_hot_key():
    keys = hash_col(pa.array(["hot"] * 1000))
    salt = hash_col(pa.array([str(i) for i in range(1000)]))
    parts = salted_partition(keys, 16, salt=salt)
    assert len(np.unique(parts)) > 8  # hot key split across sub-partitions


def test_sha256_col():
    import hashlib

    out = sha256_col(pa.array(["abc", None]))
    assert out[0] == hashlib.sha256(b"abc").hexdigest()
    assert out[1] is None


# ---------------------------------------------------------------- zorder


def test_interleave_bits_2d_morton():
    # (x=0b11, y=0b00) -> 0b1010 with x taking the MSB of each pair
    x = np.array([0b11 << 62], dtype=np.uint64)
    y = np.array([0], dtype=np.uint64)
    z = interleave_bits([x, y], bits_per_dim=2)
    assert z[0] == 0b1010


def test_zorder_key_locality():
    # identical column values -> identical keys; differing -> different
    a = pa.array(["r1", "r1", "r2"])
    b = pa.array(["p1", "p1", "p1"])
    z = zorder_key([a, b])
    assert z[0] == z[1] and z[0] != z[2]


def test_hilbert_key_deterministic():
    cols = [pa.array(["a", "b", "c"]), pa.array(["x", "y", "z"])]
    h1, h2 = hilbert_key(cols), hilbert_key(cols)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 3


def test_hilbert_lead_major_contiguous():
    """lead_bits composition: every key of a smaller-ranked lead value sorts
    strictly below every key of a larger-ranked one — the contiguous-range
    property equality pruning relies on."""
    vocab = np.array(["aa", "bb", "cc"], dtype=object)
    lead = pa.array(["aa"] * 4 + ["bb"] * 4)
    other = pa.array(["p1", "p2", "p3", "p4"] * 2)
    k = hilbert_key([lead, other], bits_per_dim=8, bounds=[vocab, None], lead_bits=4)
    assert k[:4].max() < k[4:].min()


# ---------------------------------------------------------------- cleaning


def test_stringify_batch_nested_and_null():
    t = pa.table(
        {
            "n": pa.array([1, None], pa.int64()),
            "lst": pa.array([[1, 2], None], pa.list_(pa.int64())),
        }
    )
    out = cl.stringify_batch(t)
    assert out["n"].to_pylist() == ["1", ""]
    assert json.loads(out["lst"].to_pylist()[0]) == [1, 2]
    assert out["lst"].to_pylist()[1] == ""


def test_typed_projection_safe_cast():
    t = pa.table({"TotalHoras": pa.array(["12.5", "oops", None])})
    out = cl.typed_projection(t, [("TotalHoras", "total_horas", pa.float64())])
    assert out["total_horas"].to_pylist() == [12.5, None, None]


def test_trim_scrub_digits():
    assert cl.trim(pa.array(["  x "])).to_pylist() == ["x"]
    assert cl.scrub_control_chars(pa.array(["a\tb\nc"])).to_pylist() == ["abc"]
    assert cl.digits_only(pa.array(["123.456.789-00"])).to_pylist() == ["12345678900"]


def test_invalid_date_flag_epoch():
    assert cl.invalid_date_to_null(pa.array(["0000-00-00", "2024-01-01"])).to_pylist() == [
        None,
        "2024-01-01",
    ]
    assert cl.flag_to_bool(pa.array(["S", "N"])).to_pylist() == [True, False]
    ts = cl.epoch_to_timestamp(pa.array(["1700000000"]))
    assert ts.to_pylist()[0].year == 2023


def test_drop_null_keys_empty_string():
    t = pa.table({"k": pa.array(["a", "", None, "b"]), "v": pa.array([1, 2, 3, 4])})
    out = cl.drop_null_keys(t, ["k"])
    assert out["v"].to_pylist() == [1, 4]


def test_json_extract_and_explode():
    col = pa.array([json.dumps({"result": {"data": [1, 2]}}), None, "notjson"])
    out = cl.json_extract(col, ["result", "data"])
    assert json.loads(out.to_pylist()[0]) == [1, 2]
    assert out.to_pylist()[1] is None and out.to_pylist()[2] is None

    t = pa.table(
        {
            "obra": pa.array(["o1", "o2", "o3"]),
            "Funcionarios": pa.array(
                [
                    json.dumps([{"CodigoFuncionario": "7", "HorasTrabalhadas": 8.0}]),
                    "[]",
                    json.dumps([{"CodigoFuncionario": "9"}, {"CodigoFuncionario": "10"}]),
                ]
            ),
        }
    )
    out = cl.explode_json_array(
        t, "Funcionarios", ["CodigoFuncionario", "HorasTrabalhadas"], ["obra"]
    )
    assert out["obra"].to_pylist() == ["o1", "o3", "o3"]
    assert out["CodigoFuncionario"].to_pylist() == ["7", "9", "10"]
    assert out["HorasTrabalhadas"].to_pylist() == ["8.0", None, None]


def test_case_bucket_and_date_parts():
    out = cl.case_bucket(pa.array([5.0, 25.0, None]), [18.0], ["minor", "adult"])
    assert out.to_pylist() == ["minor", "adult", None]
    parts = cl.date_parts(pa.array([datetime(2024, 8, 17)], pa.timestamp("us")))
    assert parts["ano"].to_pylist() == [2024]
    assert parts["semestre"].to_pylist() == [2]
    assert parts["eh_fim_semana"].to_pylist() == [True]  # 2024-08-17 is a Saturday
    assert parts["nome_mes"].to_pylist() == ["agosto"]
    assert parts["nome_dia_semana"].to_pylist() == ["sábado"]


def test_stamp_run_ts_deterministic():
    t = pa.table({"a": pa.array([1, 2])})
    rt = datetime(2024, 1, 1)
    o1 = cl.stamp_run_ts(t, "data_processamento", rt)
    o2 = cl.stamp_run_ts(t, "data_processamento", rt)
    assert o1.equals(o2)


def test_scd2_build_versions():
    import pandas as pd
    import ray.data

    from aws_medallion_datalake_ray.functions.windows import scd2_build

    log = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "ts": pd.to_datetime([
            "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05",
            "2024-03-01",
        ]),
        "attr": ["a", "a", "b", "a", "x"],  # 1: a (no-op repeat), b, a again
        "eid": [1, 2, 3, 4, 5],
    })
    out = (
        scd2_build(ray.data.from_pandas(log), "k", "ts", ["attr"],
                   tiebreak_cols=["eid"])
        .to_pandas().sort_values(["k", "effective_from"]).reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 1, 1, 2]
    assert list(out["attr"]) == ["a", "b", "a", "x"]
    # no-op repeat collapsed: first version spans 01-01 -> 01-03
    assert out.loc[0, "effective_from"] == pd.Timestamp("2024-01-01")
    assert out.loc[0, "effective_to"] == pd.Timestamp("2024-01-03")
    assert out.loc[1, "effective_to"] == pd.Timestamp("2024-01-05")
    # current versions closed at the sentinel
    assert out.loc[2, "effective_to"] == pd.Timestamp("2099-12-31")
    assert out.loc[3, "effective_to"] == pd.Timestamp("2099-12-31")
    # half-open coverage: version intervals per key tile without overlap
    g = out[out["k"] == 1]
    assert (g["effective_from"].iloc[1:].to_numpy()
            == g["effective_to"].iloc[:-1].to_numpy()).all()


def test_fill_time_gaps_densifies():
    import pandas as pd
    import ray.data

    from aws_medallion_datalake_ray.functions.windows import fill_time_gaps

    sparse = pd.DataFrame({
        "g": ["a", "a", "b"],
        "m": pd.to_datetime(["2024-01-01", "2024-04-01", "2024-02-01"]),
        "v": [10, 40, 7],
    })
    out = (
        fill_time_gaps(ray.data.from_pandas(sparse), ["g"], "m", {"v": 0})
        .to_pandas().sort_values(["g", "m"]).reset_index(drop=True)
    )
    # spine = observed global min..max (Jan..Apr), every group densified
    assert len(out) == 8
    a = out[out["g"] == "a"]
    assert list(a["v"]) == [10, 0, 0, 40]
    b = out[out["g"] == "b"]
    assert list(b["v"]) == [0, 7, 0, 0]
    assert list(a["m"]) == list(pd.date_range("2024-01-01", "2024-04-01", freq="MS"))


def test_stratified_sample_deterministic_quotas():
    import hashlib

    import pandas as pd
    import ray.data

    from aws_medallion_datalake_ray.functions.hashing import (
        md5_residue,
        stratified_sample,
    )

    df = pd.DataFrame({"k": range(2000),
                       "g": ["a" if i % 2 else "b" for i in range(2000)]})
    rates = {"a": 2500}  # 25% of a; b falls to default 0
    out = stratified_sample(ray.data.from_pandas(df), "g", "k", rates)
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert set(got["g"]) == {"a"}
    # exact keep set: md5 low-half little-endian residue below threshold
    want = [k for k in range(2000) if k % 2 == 1
            and int.from_bytes(hashlib.md5(str(k).encode()).digest()[8:16],
                               "little") % 10000 < 2500]
    assert list(got["k"]) == want
    assert 0.15 < len(want) / 1000 < 0.35  # sane rate
    # rerun identical (no RNG state anywhere)
    again = stratified_sample(ray.data.from_pandas(df), "g", "k", rates)
    assert list(again.to_pandas().sort_values("k")["k"]) == want
    # vector helper agrees with the scalar definition
    assert md5_residue([7, 8], 10000).tolist() == [
        int.from_bytes(hashlib.md5(b"7").digest()[8:16], "little") % 10000,
        int.from_bytes(hashlib.md5(b"8").digest()[8:16], "little") % 10000,
    ]
