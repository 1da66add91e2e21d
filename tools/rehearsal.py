"""Scale dress rehearsal (round-5 task #5): exercise the round-4 surface —
dedup removal, branches, shallow clone, merge-on-read DELETE, mask-aware
CDC, expire+GC — on the ~8-10M-row table a `GRAFT_BENCH_ROWS=9000000
python bench.py` run leaves behind, recording per-stage walls and driver
RSS.  These paths had only ever run at <= 2.6M rows; the claim under test
is that every wall grows ~linearly with rows and driver RSS stays in the
flat band (the driver holds manifests and bounded rollups, never content).

Usage:
    GRAFT_BENCH_ROWS=9000000 GRAFT_SKIP_SQL=1 python bench.py   # leaves table
    python tools/rehearsal.py [/tmp/amdl-bench-table-32]

Prints ONE JSON line: {"metric": "rehearsal", "rows": N, "timings": {...},
"driver_rss_mb": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _rss_mb() -> float:
    """Driver PRIVATE heap (RssAnon): VmRSS also counts touched pages of
    the memory-mapped plasma segment (shared, bounded by the object-store
    cap, reclaimed by Ray) — measured ~3 GB of shmem during a dedup run at
    EVERY corpus size, which says nothing about driver state.  RssAnon is
    what would grow if the driver accumulated per-row state."""
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/amdl-bench-table-32"
    if not os.path.exists(os.path.join(root, "_manifest")):
        print(f"no table at {root} — run bench.py first", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from aws_medallion_datalake_ray.state.table import LakeTable

    t = LakeTable(root)
    timings: dict[str, float] = {}
    rss: dict[str, float] = {}

    def step(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        rss[name] = _rss_mb()
        return out

    rows0 = step("scan_count", lambda: t.scan().count())

    # --- near-dup REMOVAL (bench times only the candidate scan) ---------
    # Threshold-matched banding: removal targets the fixture's ~0.9-sim
    # version chains, so 6 bands x 10 rows (LSH knee ~0.84, ~92% per-pair
    # recall at sim 0.9) is the right parameterization — the default 16x4
    # banding's ~0.5 knee floods the verify stage with sub-threshold
    # candidates on a templated corpus (standard MinHash practice: pick
    # banding for the target threshold; 8x8's 0.77 knee still admitted
    # ~100M sub-threshold pairs here and OOMed the verify join).
    # max_bucket=64: this fixture is adversarially self-similar (every doc
    # shares templated lines), so mid-size buckets' all-pairs triu emits
    # O(sum m^2) pair rows — tens of GB of string pairs at 9.7M docs.  The
    # documented mega-bucket knob switches those buckets to dual-ordering
    # chains (O(m)); version chains share a (repo,path) prefix, so the
    # sorted-id chain still links every adjacent version pair
    # id_mode="digest": fixed 32-byte ids through the banding/pair shuffles
    # instead of ~90-byte (repo,path,commit) strings — the string-id run
    # spilled ~55 GB at 9.7M docs and hit OutOfDisk; digests fit
    # verify="local": texts ride the banding shuffle and every bucket-hash
    # partition verifies its own pairs — memory O(partition) at any pair
    # density.  The joined plan's pairs x texts hash join OOMed this node
    # twice at ~80M candidate pairs (6 GB/aggregator) before this mode
    dd = step("dedup_near_removal", lambda: t.dedup_near(
        threshold=0.85, num_perm=64, bands=6, max_bucket=64,
        id_mode="digest", verify="local",
        run_ts="2024-02-01T00:00:00"))

    # --- branch: fork, diverge, scan both heads -------------------------
    step("create_branch", lambda: t.create_branch("rehearsal"))
    br = t.branch("rehearsal")
    from aws_medallion_datalake_ray.sources.fixtures import make_source_files

    step("branch_append", lambda: br.append(
        make_source_files(50_000, seed=777, pair_offset=10_000_000),
        run_ts="2024-02-02T00:00:00"))
    n_br = step("branch_scan", lambda: br.scan().count())
    n_main = step("main_scan", lambda: t.scan().count())
    assert n_br == n_main + 50_000, (n_br, n_main)

    # --- shallow clone: zero-copy manifests over the 9M-row file set ----
    clone_root = root + "-clone"
    import shutil

    shutil.rmtree(clone_root, ignore_errors=True)
    c = step("clone_to", lambda: t.clone_to(clone_root, run_ts="2024-02-03T00:00:00"))

    # --- merge-on-read DELETE + mask-aware CDC --------------------------
    pre = t.store.head_id()
    step("mor_delete", lambda: t.delete_where(
        [("lang", "==", "go")], mode="lazy", run_ts="2024-02-04T00:00:00"))
    n_after = step("masked_scan", lambda: t.scan().count())
    assert n_after < n_main, (n_after, n_main)
    cdc = step("cdc_across_mor", lambda: t.change_feed(
        pre, key_cols=("repo", "path", "commit"),
        columns=["repo", "path", "commit"]).count())
    assert cdc == n_main - n_after, (cdc, n_main, n_after)
    step("apply_pending_deletes", lambda: t.apply_pending_deletes(
        run_ts="2024-02-05T00:00:00"))
    assert t.scan().count() == n_after

    # --- retention: every ref (branch head, clone pin) must survive -----
    step("expire_gc", lambda: (t.expire_snapshots(keep_last=1), t.gc_orphans()))
    assert br.scan().count() == n_br
    assert c.scan().count() == n_main

    out = {
        "metric": "rehearsal",
        "rows": rows0,
        "dedup_removed": dd.get("near_dup_rows"),
        "cdc_rows": cdc,
        "timings": timings,
        "rss_after_stage_mb": rss,
        "driver_rss_mb": _rss_mb(),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
