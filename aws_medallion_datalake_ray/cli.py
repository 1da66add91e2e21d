"""CLI entry points — one command per engine op, ``ray job submit``-able.

Replaces the reference's Step-Functions DAG + poll-until-terminal runner
(``terraform/digit_pipeline.tf:6-75``, ``scripts/run_digit_pipeline.py:19-45``):
the sequential bronze→silver→gold pipeline is a single driver process here
(`pipeline`), stage failures are recorded as stage-tagged structured errors in
the job ledger (the reference's error-classifier Lambda, C4) and per-stage
metrics are printed + persisted (the success-metric Lambda, C5).

Usage (single node):
    python -m aws_medallion_datalake_ray.cli compact --table /path/t [--target-mb 128]
    python -m aws_medallion_datalake_ray.cli pipeline --input raw.parquet --root /path/lake
Cluster: ``ray job submit -- python -m aws_medallion_datalake_ray.cli ...``
(the script only calls ray.init when no session exists).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _table(path: str):
    from aws_medallion_datalake_ray.state.table import LakeTable

    return LakeTable(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="amdl-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, **kw):
        p = sub.add_parser(name, **kw)
        p.add_argument("--run-ts", default="1970-01-01T00:00:00")
        return p

    p = add("compact")
    p.add_argument("--table", required=True)
    p.add_argument("--target-mb", type=int, default=128)
    p.add_argument("--job-id", default=None)

    p = add("zorder")
    p.add_argument("--table", required=True)
    p.add_argument("--cols", default="repo,lang,path")
    p.add_argument("--curve", choices=["zorder", "hilbert"], default="zorder")
    p.add_argument("--target-mb", type=int, default=128)

    p = add("merge")
    p.add_argument("--table", required=True)
    p.add_argument("--updates", required=True, help="parquet path of the update stream")
    p.add_argument("--key", default="repo,path,commit")

    p = add("dedup-near")
    p.add_argument("--table", required=True)
    p.add_argument("--text-col", default="content")
    p.add_argument("--key", default="repo,path,commit")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--num-perm", type=int, default=64)

    p = add("expire")
    p.add_argument("--table", required=True)
    p.add_argument("--keep-last", type=int, default=2)

    p = add("rewrite-stats")
    p.add_argument("--table", required=True)

    p = add("build-blooms")
    p.add_argument("--table", required=True)
    p.add_argument("--cols", required=True, help="comma-separated columns to index")
    p.add_argument("--fpp", type=float, default=0.02)

    p = add("verify-scan")
    p.add_argument("--table", required=True)
    p.add_argument("--cols", default="repo,path,commit,lang,content")

    p = add("tag")
    p.add_argument("--table", required=True)
    p.add_argument("--name", default=None, help="omit to list tags")
    p.add_argument("--snapshot-id", type=int, default=None)
    p.add_argument("--drop", action="store_true")

    p = add("clone")
    p.add_argument("--table", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--snapshot-id", type=int, default=None)
    p.add_argument("--no-pin", action="store_true",
                   help="do not tag-pin the source snapshot")

    p = add("schedule")
    p.add_argument("--cron", required=True,
                   help="5-field cron or EventBridge cron(...) expression")
    p.add_argument("--now", required=True, help="ISO timestamp of this tick")
    p.add_argument("--last-run", default=None,
                   help="ISO timestamp of the last successful run")

    p = add("set-constraints")
    p.add_argument("--table", required=True)
    p.add_argument("--term", action="append", default=[],
                   help="col:op[:value] CHECK term (repeatable); op in "
                        "==,!=,<,<=,>,>=,in,not-null; in takes a comma list. "
                        "No terms clears all constraints")

    p = add("branch")
    p.add_argument("--table", required=True)
    p.add_argument("--name", default=None, help="omit to list branches")
    p.add_argument("--at", type=int, default=None,
                   help="snapshot to branch from (default HEAD)")
    p.add_argument("--drop", action="store_true")
    p.add_argument("--fast-forward", action="store_true",
                   help="move HEAD to this branch's head")

    p = add("delete-where")
    p.add_argument("--table", required=True)
    p.add_argument("--where", action="append", required=True,
                   help="col:op:value term (repeatable, ANDed); op in ==,<,<=,>,>=")
    p.add_argument("--lazy", action="store_true",
                   help="merge-on-read: record the predicate as a pending "
                        "delete spec (O(manifest)); scans mask the rows")

    p = add("apply-deletes")
    p.add_argument("--table", required=True)

    p = add("update-where")
    p.add_argument("--table", required=True)
    p.add_argument("--where", action="append", required=True)
    p.add_argument("--set", action="append", required=True,
                   help="col=value (repeatable)")

    p = add("maintain")
    p.add_argument("--table", required=True)
    p.add_argument("--target-mb", type=int, default=128)
    p.add_argument("--keep-last", type=int, default=3)

    p = add("evolve-schema")
    p.add_argument("--table", required=True)
    p.add_argument("--add", default=None,
                   help="col:type[:default] pairs, comma-separated (e.g. stars:int64:0)")
    p.add_argument("--rename", default=None, help="old=new pairs, comma-separated")

    p = add("change-feed")
    p.add_argument("--table", required=True)
    p.add_argument("--from-snapshot", type=int, required=True)
    p.add_argument("--to-snapshot", type=int, default=None)
    p.add_argument("--key", default="repo,path,commit")
    p.add_argument("--out", default=None, help="write the feed to this parquet dir")

    p = add("pipeline")
    p.add_argument("--input", required=True, help="raw source parquet path/glob")
    p.add_argument("--root", required=True, help="lake root for bronze/silver/gold")

    p = add("incremental")
    p.add_argument("--input-root", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--job-id", required=True)

    args = ap.parse_args(argv)
    _ensure_ray()
    t0 = time.time()
    out: dict = {"cmd": args.cmd}

    try:
        if args.cmd == "compact":
            out |= _table(args.table).compact(
                target_file_bytes=args.target_mb << 20, run_ts=args.run_ts,
                job_id=args.job_id,
            )
        elif args.cmd == "zorder":
            out |= _table(args.table).zorder(
                args.cols.split(","), curve=args.curve,
                target_file_bytes=args.target_mb << 20, run_ts=args.run_ts,
            )
        elif args.cmd == "merge":
            import ray.data

            out |= _table(args.table).merge(
                ray.data.read_parquet(args.updates), key=tuple(args.key.split(",")),
                run_ts=args.run_ts,
            )
        elif args.cmd == "dedup-near":
            out |= _table(args.table).dedup_near(
                text_col=args.text_col, key=tuple(args.key.split(",")),
                threshold=args.threshold, bands=args.bands,
                num_perm=args.num_perm, run_ts=args.run_ts,
            )
        elif args.cmd == "expire":
            t = _table(args.table)
            out["expired"] = t.expire_snapshots(keep_last=args.keep_last)
            out["orphans_deleted"] = len(t.gc_orphans())
        elif args.cmd == "rewrite-stats":
            snap = _table(args.table).rewrite_stats(run_ts=args.run_ts)
            out["snapshot_id"] = snap.snapshot_id
        elif args.cmd == "build-blooms":
            snap = _table(args.table).build_blooms(
                args.cols.split(","), fpp=args.fpp, run_ts=args.run_ts)
            out["snapshot_id"] = snap.snapshot_id
            out["bloom_cols"] = snap.summary["bloom_cols"]
        elif args.cmd == "verify-scan":
            t = _table(args.table)
            cols = tuple(args.cols.split(","))
            out["checksum"] = t.content_checksum(cols)
            out["rows"] = sum(f.rows for f in t.files())
            out["files"] = len(t.files())
        elif args.cmd == "tag":
            t = _table(args.table)
            if args.name and args.drop:
                t.drop_tag(args.name)
            elif args.name:
                t.tag_snapshot(args.name, args.snapshot_id)
            out["tags"] = t.tags()
        elif args.cmd == "clone":
            t = _table(args.table)
            c = t.clone_to(args.dest, run_ts=args.run_ts,
                           snapshot_id=args.snapshot_id,
                           pin_source=not args.no_pin)
            out["cloned_snapshot"] = c.store.head_id()
            out["rows"] = sum(f.rows for f in c.files())
        elif args.cmd == "schedule":
            import datetime as _dt

            from aws_medallion_datalake_ray.state.schedule import due, next_fire
            now = _dt.datetime.fromisoformat(args.now)
            last = (_dt.datetime.fromisoformat(args.last_run)
                    if args.last_run else None)
            out["due"] = due(args.cron, last, now)
            out["next_fire"] = next_fire(args.cron, now).isoformat()
        elif args.cmd == "set-constraints":
            t = _table(args.table)
            terms = []
            for raw in args.term:
                parts = raw.split(":", 2)
                if len(parts) == 2:
                    terms.append([parts[0], parts[1]])
                else:
                    col, op, val = parts
                    if op == "in":
                        terms.append([col, op, val.split(",")])
                    else:
                        for cast in (int, float):
                            try:
                                val = cast(val)
                                break
                            except ValueError:
                                pass
                        terms.append([col, op, val])
            t.set_constraints(terms)
            out["constraints"] = t.constraints
        elif args.cmd == "branch":
            t = _table(args.table)
            if args.name and args.drop:
                t.drop_branch(args.name)
            elif args.name and args.fast_forward:
                out["head"] = t.fast_forward(args.name).snapshot_id
            elif args.name:
                out["created_at"] = t.create_branch(args.name, args.at)
            out["branches"] = t.branches()
        elif args.cmd in ("delete-where", "update-where"):
            def _coerce(v: str):
                for cast in (int, float):
                    try:
                        return cast(v)
                    except ValueError:
                        pass
                return v

            pred = []
            for term in args.where:
                col, op, val = term.split(":", 2)
                pred.append((col, op, _coerce(val)))
            t = _table(args.table)
            if args.cmd == "delete-where":
                out |= t.delete_where(
                    pred, run_ts=args.run_ts,
                    mode="lazy" if args.lazy else "copy-on-write")
            else:
                sets = {}
                for pair in args.set:
                    k, _, v = pair.partition("=")
                    sets[k] = _coerce(v)
                out |= t.update_where(pred, sets, run_ts=args.run_ts)
        elif args.cmd == "apply-deletes":
            out |= _table(args.table).apply_pending_deletes(run_ts=args.run_ts)
        elif args.cmd == "maintain":
            out["actions"] = _table(args.table).maintain(
                run_ts=args.run_ts, target_file_bytes=args.target_mb << 20,
                keep_last=args.keep_last,
            )
        elif args.cmd == "evolve-schema":
            import pyarrow as _pa

            def _parse_default(raw: str):
                if raw.lower() in ("true", "false"):
                    return raw.lower() == "true"
                for cast in (int, float):
                    try:
                        return cast(raw)
                    except ValueError:
                        pass
                return raw

            add_spec: dict = {}
            for part in filter(None, (args.add or "").split(",")):
                bits = part.split(":")
                dtype = _pa.type_for_alias(bits[1])
                if len(bits) > 2:
                    add_spec[bits[0]] = (dtype, _parse_default(bits[2]))
                else:
                    add_spec[bits[0]] = dtype
            ren = dict(p.split("=") for p in filter(None, (args.rename or "").split(",")))
            snap = _table(args.table).evolve_schema(
                add=add_spec or None, rename=ren or None, run_ts=args.run_ts)
            out["snapshot_id"] = snap.snapshot_id
            out["summary"] = {k: v for k, v in snap.summary.items()
                              if k.endswith("_cols")}
        elif args.cmd == "change-feed":
            feed = _table(args.table).change_feed(
                args.from_snapshot, args.to_snapshot,
                key_cols=tuple(args.key.split(",")),
            )
            if args.out:
                feed = feed.materialize()
                feed.write_parquet(args.out, compression="zstd")
                out["written_to"] = args.out
            c = feed.groupby("_change").count().to_pandas()
            out["changes"] = dict(zip(c["_change"], c["count()"].astype(int))) \
                if len(c) else {}
        elif args.cmd == "pipeline":
            import ray.data

            from aws_medallion_datalake_ray.pipelines.medallion import run_medallion

            stage = "bronze"  # stage-tagged error classification (ref C4)
            try:
                tables = run_medallion(
                    ray.data.read_parquet(args.input), args.root, run_ts=args.run_ts
                )
                stage = "done"
                out["tables"] = {
                    k: {"files": len(v.files()), "rows": sum(f.rows for f in v.files())}
                    for k, v in tables.items()
                }
            except Exception as e:
                out["failed_stage"] = stage
                out["error"] = f"{type(e).__name__}: {e}"[:500]
                raise
        elif args.cmd == "incremental":
            from aws_medallion_datalake_ray.pipelines.incremental import incremental_promote

            out |= incremental_promote(
                args.input_root, _table(args.table), lambda ds: ds,
                job_id=args.job_id, run_ts=args.run_ts,
            )
    except Exception as e:  # structured failure record (ref lambda_error_handler)
        out["status"] = "failed"
        out.setdefault("error", f"{type(e).__name__}: {e}"[:500])
        out["seconds"] = round(time.time() - t0, 3)
        print(json.dumps(out))
        return 1

    out["status"] = "ok"
    out["seconds"] = round(time.time() - t0, 3)
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
