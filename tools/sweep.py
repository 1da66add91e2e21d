"""Driver-style oracle sweep: run queries() against DuckDB oracle_sql().

Usage (from anywhere, repo on PYTHONPATH):
    python tools/sweep.py                    # every oracle query at sf0.01
    python tools/sweep.py q64,q83 --sf /root/testdata/sf0.001

Mirrors the per-round driver gate: columns sorted by name, rows sorted by
all columns, exact frame equality (dtype-insensitive).  Exits non-zero on
the first mismatch so CI-style use is possible.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="?", default=None,
                    help="comma-separated query names or prefixes")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    queries, oracles = e.queries(), e.oracle_sql()
    wanted = sorted(oracles)
    if args.names:
        pats = args.names.split(",")
        wanted = [n for n in wanted if any(n.startswith(p) for p in pats)]

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    fails = 0
    for name in wanted:
        got = queries[name](args.sf)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        if isinstance(got, pa.Table):
            got = got.to_pandas()
        want = con.execute(oracles[name]).fetchdf()
        g, w = _norm(got), _norm(want)
        try:
            assert list(g.columns) == list(w.columns), \
                f"cols {list(g.columns)} vs {list(w.columns)}"
            assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
            pd.testing.assert_frame_equal(g, w, check_dtype=False)
            print(f"OK   {name} ({len(g)} rows)")
        except AssertionError as ex:
            fails += 1
            print(f"FAIL {name}: {str(ex)[:400]}")
    print(f"{len(wanted) - fails}/{len(wanted)} green")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
