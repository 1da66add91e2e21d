#!/usr/bin/env python
"""Benchmark harness — prints the full-detail JSON line, then ONE short
headline JSON line (all metrics, per-query dict omitted) as the LAST line.

Headline (per BASELINE.json): the table-maintenance cycle on the canonical
source-code fixture — ingest -> compact -> zorder -> merge -> checksum-verified
post-maintenance full scan -> expire/GC — plus per-query timings for the
oracle suite over $GRAFT_SF_DIR.

  RAY_GRAFT_CPUS=32 GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py
  python bench.py --scaling     # N=4 vs 4N=16 CPUs in fresh processes

Scaling protocol (BASELINE.md): same input, fresh ray.init at N=4 and 4N=16
CPUs; efficiency = throughput(4N) / (4 * throughput(N)).  Levels 4/16 rather
than 8/32 because this VM's *hardware* parallel-scaling ceiling (pure-CPU
multiprocessing calibration) is ~0.91 at 4->16 but only ~0.81 at 8->32.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "800000"))
# actor pools take 3/4 of the CPUs (compute-heavy stages), the rest feeds
# them — a pool that reserves every CPU starves its own input, one that
# takes only half idles cores during the scan-heavy stages
POOL = max(2, (3 * NUM_CPUS) // 4)
TS = "2024-01-01T00:00:00"
FP_COLS = ("repo", "path", "commit", "lang", "content")


def _prepare_fixture() -> tuple[str, str]:
    """Build (once, cached) the many-small-files source table + merge updates.
    Excluded from timing; a warm-up read below levels the page cache."""
    import pyarrow.parquet as pq

    from aws_medallion_datalake_ray.sources.fixtures import make_updates, write_source_files

    fdir = f"/tmp/amdl-bench-fixture-{BENCH_ROWS}"
    upd_path = os.path.join(fdir, "updates", "updates.parquet")
    files = write_source_files(fdir, BENCH_ROWS, rows_per_file=2000, seed=42)
    if not os.path.exists(upd_path):
        # sample the update stream from the real fixture files so update keys
        # overlap the base table (hot repos stay hot in the update stream)
        sample = pq.read_table(files[: max(1, len(files) // 4)])
        os.makedirs(os.path.dirname(upd_path), exist_ok=True)
        pq.write_table(make_updates(sample, BENCH_ROWS // 10, seed=99), upd_path)
    return fdir, upd_path


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from aws_medallion_datalake_ray.pipelines.queries import SQL_QUERIES
    from aws_medallion_datalake_ray.state.table import LakeTable

    fdir, upd_path = _prepare_fixture()
    # warm page cache so both scaling levels measure compute, not cold disk
    for dirpath, _d, files in os.walk(fdir):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(dirpath, f), "rb") as fh:
                    fh.read()

    # untimed warm-up: spawns the worker pool so the first timed stage
    # measures the engine, not Ray process startup
    ray.data.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b
    ).count()

    root = f"/tmp/amdl-bench-table-{NUM_CPUS}"
    shutil.rmtree(root, ignore_errors=True)
    table = LakeTable.create(root)
    timings: dict[str, float] = {}

    rss_after: dict[str, float] = {}

    def step(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        # RssAnon after each stage: the first stage where this jumps is the
        # one that materialized driver-side state (scale-leak bisect)
        rss_after[name] = _driver_rss_mb()
        return out

    src_files = sorted(
        os.path.join(fdir, f) for f in os.listdir(fdir) if f.endswith(".parquet")
    )
    step("ingest", lambda: table.append(ray.data.read_parquet(src_files), run_ts=TS))
    checksum0 = step("scan_checksum_pre", lambda: table.content_checksum(FP_COLS))
    n_small = len(table.files())
    compact_res = step(
        "compact", lambda: table.compact(target_file_bytes=32 * 1024 * 1024, run_ts=TS)
    )
    step(
        "zorder",
        # 8 MB files => ~12 output files at sf0.1: enough granularity for the
        # repo_scan_files_frac pruning measurement to resolve below 0.3
        lambda: table.zorder(["repo", "lang", "path"], target_file_bytes=8 * 1024 * 1024,
                             run_ts=TS),
    )
    step("rewrite_stats", lambda: table.rewrite_stats(run_ts=TS))
    checksum_mid = step("scan_checksum_mid", lambda: table.content_checksum(FP_COLS))
    snap_pre_merge = table.store.head_id()
    step(
        "merge",
        lambda: table.merge(ray.data.read_parquet(upd_path), run_ts=TS),
    )
    checksum1 = step("scan_checksum_post", lambda: table.content_checksum(FP_COLS))
    sha256_post = step("scan_sha256_verify", lambda: table.sha256_checksum("content"))

    # CDC across the merge — reported OUTSIDE the headline cycle (timings/
    # value stay comparable to earlier rounds): the feed reads only the
    # merge-affected files, so this measures the O(changed-rows) claim.
    # Skipped in scaling subprocesses (GRAFT_SKIP_QUERIES) like the query
    # suite: it is a supplementary metric, not part of the scaled job.
    change_feed_sec = change_feed_rows = change_feed_full_sec = None
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        # pruned feed (columns=keys): the second pass skips the wide content
        # column — the consumption shape of every delta-rollup CDC consumer
        t0 = time.perf_counter()
        change_feed_rows = table.change_feed(
            snap_pre_merge, key_cols=("repo", "path", "commit"),
            columns=["repo", "path", "commit"],
        ).count()
        change_feed_sec = round(time.perf_counter() - t0, 3)
        # full-width feed kept for cross-round comparability (r3: 18.8 s)
        t0 = time.perf_counter()
        full_rows = table.change_feed(
            snap_pre_merge, key_cols=("repo", "path", "commit")
        ).count()
        change_feed_full_sec = round(time.perf_counter() - t0, 3)
        assert full_rows == change_feed_rows, (full_rows, change_feed_rows)

    from aws_medallion_datalake_ray.functions.dedup import near_dup_candidate_count

    def near_dup_scan():
        # content never leaves the workers — only per-block count sketches
        # move (tree aggregation, no all-to-all)
        ds = table.scan(columns=["commit", "content"])
        return near_dup_candidate_count(
            ds, text_col="content", id_col="commit", num_perm=96, bands=16,
        )

    dup_stats = step("near_dup_scan", near_dup_scan)

    def quality_scan():
        # text-analysis maintenance pass: lang-ID + quality features as
        # STATELESS tasks with a per-worker-process analyzer cache (RE2
        # tables still build once per process, but every CPU participates —
        # an actor pool idles the non-pool cores).  Arrow-native end-to-end:
        # the content column never materializes Python strings; tiny rollup
        from ray.data.aggregate import Sum

        from aws_medallion_datalake_ray.functions.text import analyze_batch_arrow

        scored = table.scan(columns=["lang", "content"]).map_batches(
            analyze_batch_arrow,
            fn_kwargs={"text_col": "content"},
            batch_format="pyarrow",
            # 4096-doc batches: whole-block batches load-balance poorly and
            # spike RE2/fingerprint buffers; measured 2.5x vs batch_size=None
            batch_size=4096,
        )

        def partial(t):
            return (
                t.select(["lang_pred", "quality_score"])
                .group_by("lang_pred")
                .aggregate([("quality_score", "count"), ("quality_score", "sum")])
                .rename_columns(["lang_pred", "n", "q"])
            )

        out = (
            scored.map_batches(partial, batch_format="pyarrow")
            .groupby("lang_pred")
            .aggregate(Sum("n", alias_name="n"), Sum("q", alias_name="q"))
            .to_pandas()
        )
        return {"langs_detected": len(out), "rows_scored": int(out["n"].sum())}

    quality_stats = step("quality_scan", quality_scan)
    step("expire_gc", lambda: (table.expire_snapshots(keep_last=2), table.gc_orphans()))

    # evidence that zorder + manifest stats actually prune: fraction of files
    # a single-repo equality scan can skip (1.0 = no pruning)
    from aws_medallion_datalake_ray.state.table import prune_files

    all_files = table.files()
    # mean over several repos (min AND max bounds -> cold and hot repos both
    # sampled); the Zipf-hot repo alone holds ~25% of rows, so its fraction
    # floors near 0.25 regardless of clustering quality
    probe_repos = sorted(
        {f.stats["repo"][b] for f in all_files for b in ("min", "max")
         if f.stats.get("repo", {}).get(b)}
    )[:8]
    pruned_frac = (
        round(
            sum(
                len(prune_files(all_files, [("repo", "==", r)])) / len(all_files)
                for r in probe_repos
            )
            / len(probe_repos),
            3,
        )
        if probe_repos
        else None
    )

    total_rows = sum(f.rows for f in table.files())
    total_bytes = sum(f.bytes for f in table.files())
    maintenance_sec = round(sum(timings.values()), 3)
    scan_gbps = round(total_bytes / max(1e-9, timings["scan_checksum_post"]) / 1e9, 4)
    files_per_sec = round(
        compact_res["files_in"] / max(1e-9, timings["compact"]), 2
    )

    qt: dict[str, float] = {}
    # GRAFT_SKIP_SQL skips only the (fixed-size, SF_DIR-driven) query suite;
    # GRAFT_SKIP_QUERIES additionally skips change_feed (scaling subprocesses)
    skip_sql = os.environ.get("GRAFT_SKIP_QUERIES") or os.environ.get("GRAFT_SKIP_SQL")
    queries = {} if skip_sql else SQL_QUERIES
    gold_build_sec = None
    if queries:
        # time the gold star-schema CONSTRUCTION separately so q28/q29/q31
        # report pure consumption (join) cost — the build is memoized
        from aws_medallion_datalake_ray.pipelines.queries import _gold_star

        t0 = time.perf_counter()
        _gold_star(SF_DIR)
        gold_build_sec = round(time.perf_counter() - t0, 3)
    for name, fn in queries.items():
        t0 = time.perf_counter()
        fn(SF_DIR)
        qt[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "maintenance_cycle_sec",
        "value": maintenance_sec,
        "unit": "sec",
        "queries": qt,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_rows": total_rows,
        "bench_bytes": total_bytes,
        "timings": timings,
        "post_scan_gbps": scan_gbps,
        "compact_files_per_sec": files_per_sec,
        "compact_files_in": compact_res["files_in"],
        "small_files_before": n_small,
        # compact+zorder must preserve the row multiset (checksum invariant);
        # merge then changes it by design (checksum recorded for the record)
        "checksum_invariant_compact_zorder": checksum0 == checksum_mid,
        "checksum_post_merge": checksum1,
        "sha256_multiset_post_merge": sha256_post,
        "near_dup": dup_stats,
        "quality": quality_stats,
        "repo_scan_files_frac": pruned_frac,
        "gold_build_sec": gold_build_sec,
        "change_feed_sec": change_feed_sec,
        "change_feed_full_sec": change_feed_full_sec,
        "change_feed_rows": change_feed_rows,
        "queries_total_sec": round(sum(qt.values()), 3),
        # driver RSS high-water (MB): the measured form of every O(1)-driver
        # claim (collision scan, change_feed, partitioned delete) — must stay
        # flat as GRAFT_BENCH_ROWS grows
        "driver_rss_mb": _driver_rss_mb(),
        "rss_after_stage_mb": rss_after,
    }
    ray.shutdown()
    return result


def _driver_rss_mb() -> float:
    """Driver PRIVATE heap (RssAnon, current): ru_maxrss / VmRSS also count
    touched pages of the shared plasma mapping (bounded by the object-store
    cap, reclaimed by Ray), which dwarfs and hides the driver's own state.
    RssAnon is what grows if the driver accumulates per-row state."""
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def run_scaling() -> dict:
    """Two parallelism levels in FRESH processes on the same (pre-warmed)
    input; reports both throughputs + scaling efficiency.

    ``GRAFT_SCALING_REPEATS`` (default 1): run each level N times and take
    the MIN wall per level — the standard estimator for a machine with
    time-varying external contention (this VM's effective capacity swings
    >2x within an hour; min-of-N approximates the uncontended hardware,
    applied identically to both levels).  Levels alternate (4,16,4,16,...)
    so slow host phases hit both rather than biasing one."""
    _prepare_fixture()  # shared, cached
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
    out = {}
    runs: dict[int, list] = {4: [], 16: []}
    for _ in range(repeats):
        for ncpu in (4, 16):
            runs[ncpu].append(_scaling_level(ncpu))
    for ncpu in (4, 16):
        out[ncpu] = min(runs[ncpu], key=lambda r: r["value"])
    out["walls"] = {n: [round(r["value"], 1) for r in runs[n]] for n in (4, 16)}
    return _scaling_report(out)


def _scaling_level(ncpu: int) -> dict:
    # N=4 vs 4N=16: this VM's pure-CPU scaling ceiling is ~0.91 at 4->16
    # but only ~0.81 at 8->32 (hypervisor/memory contention) — see
    # BASELINE.md calibration; the query suite is skipped (fixed-overhead
    # dominated at sf0.1, measured separately by the plain run)
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_SKIP_QUERIES="1",
        # a larger fixture for the scaling evidence: per-stage fixed costs
        # (~14 s/level) must be amortized by real work, as they would be
        # on a cluster-sized input.  2.4M rows since round 3: the Arrow/RE2
        # kernel rewrites halved per-row compute, so the old 1.2M fixture
        # left fixed costs dominating the 4-CPU level (eff sagged to ~0.76
        # from pure amortization, not a parallelism defect)
        GRAFT_BENCH_ROWS=os.environ.get("GRAFT_SCALING_ROWS", "2400000"),
    )
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True, check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def _scaling_report(out: dict) -> dict:
    # efficiency over the maintenance cycle (the headline job): the query
    # suite at sf0.1 is fixed-overhead-dominated and measured separately
    t_lo = out[4]["value"]
    t_hi = out[16]["value"]
    eff = (t_lo / t_hi) / (16 / 4)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": 4,
        "cpus_hi": 16,
        "maintenance_sec_4cpu": t_lo,
        "maintenance_sec_16cpu": t_hi,
        "walls_per_level": out.get("walls"),
        "rows_per_sec_4cpu": round(out[4]["bench_rows"] / t_lo, 1),
        "rows_per_sec_16cpu": round(out[16]["bench_rows"] / t_hi, 1),
        "sf": SF_DIR,
        "bench_rows": out[16]["bench_rows"],
        # per-stage speedups (ideal 4.0): identifies the scaling floor-raisers
        "stage_speedup": {
            k: round(out[4]["timings"][k] / max(1e-9, out[16]["timings"][k]), 2)
            for k in out[16]["timings"]
        },
        "timings_16cpu": out[16]["timings"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        res = run_bench()
        # two lines: full detail first (may be long), then a SHORT headline
        # line without the per-query dict — the r3 driver record came back
        # parsed:null because one long line overflowed its tail capture
        print(json.dumps(res, separators=(",", ":")))
        headline = {k: v for k, v in res.items() if k != "queries"}
        headline["n_queries"] = len(res.get("queries") or {})
        print(json.dumps(headline, separators=(",", ":")))
