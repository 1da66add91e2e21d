"""Per-partition checkpoint ledger — fine-grained resume + lineage + metrics.

The reference tracks progress at month granularity in DynamoDB with
fail-stop resume (``step-functions/digit-historical-load.json:28-43``,
``scripts/watermark_helper.py:9-42``).  The engine's ledger is the
per-partition generalization required by BASELINE.json: every maintenance /
promotion job gets one JSON ledger recording, per task (a compaction bin, a
merge partition, an ingest shard), its status, its **lineage**
(``input_files -> output_files``) and its metrics.  On restart the job skips
``completed`` tasks and re-runs the rest; output files of non-completed tasks
are orphans, protected from GC only while their ledger is ``running``.

Writes are atomic (temp file + ``os.replace``); a single driver owns each
ledger so no cross-process locking is needed.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable

from aws_medallion_datalake_ray.state.manifest import atomic_write_json

LEDGER_DIR = "_ledger"


class Ledger:
    def __init__(self, table_root: str, job_id: str, op: str = "", run_ts: str = ""):
        self.dir = os.path.join(table_root, LEDGER_DIR)
        self.path = os.path.join(self.dir, f"{job_id}.json")
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)
        else:
            os.makedirs(self.dir, exist_ok=True)
            self.state = {
                "job_id": job_id,
                "op": op,
                "run_ts": run_ts,
                "status": "running",
                "tasks": {},
            }
            self._save()

    def _save(self) -> None:
        atomic_write_json(self.path, self.state)

    # ------------------------------------------------------------ tasks

    def task_status(self, key: str) -> str | None:
        t = self.state["tasks"].get(key)
        return t["status"] if t else None

    def is_completed(self, key: str) -> bool:
        return self.task_status(key) == "completed"

    def mark_running(self, key: str, input_files: list[str] | None = None) -> None:
        self.state["tasks"][key] = {
            "status": "running",
            "input_files": input_files or [],
            "output_files": [],
            "metrics": {},
        }
        self._save()

    def mark_completed(
        self,
        key: str,
        input_files: Iterable[str],
        output_files: Iterable[str],
        metrics: dict[str, Any] | None = None,
    ) -> None:
        self.state["tasks"][key] = {
            "status": "completed",
            "input_files": list(input_files),
            "output_files": list(output_files),
            "metrics": metrics or {},
        }
        self._save()

    def mark_failed(self, key: str, error: str) -> None:
        t = self.state["tasks"].setdefault(key, {"input_files": [], "output_files": []})
        t["status"] = "failed"
        t["metrics"] = {"error": error[:500]}
        self._save()

    def completed_tasks(self) -> dict[str, dict]:
        return {k: v for k, v in self.state["tasks"].items() if v["status"] == "completed"}

    def pending(self, keys: Iterable[str]) -> list[str]:
        """Of the planned task keys, the ones still needing work (resume)."""
        return [k for k in keys if not self.is_completed(k)]

    # ------------------------------------------------------------ job

    def finish(self, status: str = "completed", metrics: dict | None = None) -> None:
        self.state["status"] = status
        if metrics:
            self.state["metrics"] = metrics
        self._save()

    def abandon(self) -> None:
        """Mark a dead job abandoned: its uncommitted output files stop being
        GC-protected (the crash-cleanup path — a job that will never commit
        must not pin orphans forever)."""
        self.finish(status="abandoned")

    @property
    def job_metrics(self) -> dict:
        agg: dict[str, float] = {}
        for t in self.state["tasks"].values():
            for k, v in (t.get("metrics") or {}).items():
                if isinstance(v, (int, float)):
                    agg[k] = agg.get(k, 0) + v
        return agg

    # ------------------------------------------------------------ GC safety

    @staticmethod
    def active_output_files(table_root: str) -> set[str]:
        """Output files referenced by any non-finished ledger: these are
        in-flight (their snapshot hasn't committed yet) and must be treated
        as reachable by orphan GC (SURVEY.md §7.5.7)."""
        d = os.path.join(table_root, LEDGER_DIR)
        out: set[str] = set()
        if not os.path.isdir(d):
            return out
        for name in os.listdir(d):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(d, name)) as f:
                    st = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            if st.get("status") == "running":
                for t in st.get("tasks", {}).values():
                    out.update(t.get("output_files", []))
        return out
