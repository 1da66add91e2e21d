"""Snapshot / manifest tree — the engine's table format.

Replaces the reference's *side-channel* schema registry (Glue Catalog DDL,
``silver_digit_clean.py:131-235``) and its non-atomic ``mode("overwrite")``
table state (``silver_digit_clean.py:127``) with an Iceberg-style, engine-owned
metadata tree giving **serializable snapshot isolation**:

- data files are immutable;
- a *manifest* is an immutable JSON file listing data-file entries
  (path, rows, bytes, partition values, per-column min/max/null stats);
- a *snapshot* is an immutable JSON file referencing a set of manifests;
- ``HEAD`` is one tiny JSON pointer, swapped atomically (``os.replace``)
  under an optimistic-concurrency check (expected parent id) guarded by an
  ``O_EXCL`` lock file.  On a real object store the same protocol maps to
  put-if-absent on versioned pointer names; the swap point is identical.

Commits are **incremental**: a commit only rewrites manifests that contain
removed files and writes new manifests for added files — unchanged manifests
are reused by reference, so commit cost is O(changed files), not O(table),
which is what makes maintenance commits feasible on a 10^12-file table.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterable

MANIFEST_CHUNK = 10_000  # data-file entries per manifest file
_LOCK_STALE_SEC = 120.0


class CommitConflict(RuntimeError):
    """Another writer committed since this writer's snapshot was resolved."""


@dataclass
class DataFile:
    """One immutable Parquet data file registered in a manifest."""

    path: str  # relative to table root
    rows: int
    bytes: int
    partition: dict[str, str] = field(default_factory=dict)
    # col -> {"min": v, "max": v, "nulls": n}; bounds may be absent (None)
    stats: dict[str, dict[str, Any]] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "rows": self.rows,
            "bytes": self.bytes,
            "partition": self.partition,
            "stats": self.stats,
        }

    @staticmethod
    def from_json(d: dict) -> "DataFile":
        return DataFile(
            path=d["path"],
            rows=d["rows"],
            bytes=d["bytes"],
            partition=d.get("partition", {}),
            stats=d.get("stats", {}),
        )


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    ts: str  # ISO-8601, from the job-level run_ts (determinism: no wall clock in data)
    operation: str
    manifests: list[str]  # manifest file names (relative to _manifest/)
    summary: dict[str, Any] = field(default_factory=dict)
    schema_json: str | None = None  # serialized arrow schema (optional)

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "ts": self.ts,
            "operation": self.operation,
            "manifests": self.manifests,
            "summary": self.summary,
            "schema_json": self.schema_json,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(**d)


def atomic_write_json(path: str, obj: Any) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class ManifestStore:
    """Owns the ``_manifest/`` directory of one table."""

    def __init__(self, table_root: str):
        self.root = table_root
        self.dir = os.path.join(table_root, "_manifest")

    # ------------------------------------------------------------ reads

    def head_id(self) -> int | None:
        try:
            with open(os.path.join(self.dir, "HEAD")) as f:
                return json.load(f)["snapshot_id"]
        except FileNotFoundError:
            return None

    def head(self) -> Snapshot | None:
        sid = self.head_id()
        return None if sid is None else self.snapshot(sid)

    def snapshot(self, snapshot_id: int) -> Snapshot:
        with open(os.path.join(self.dir, f"snap-{snapshot_id}.json")) as f:
            return Snapshot.from_json(json.load(f))

    def read_manifest(self, name: str) -> list[DataFile]:
        with open(os.path.join(self.dir, name)) as f:
            return [DataFile.from_json(e) for e in json.load(f)["entries"]]

    def files(self, snapshot: Snapshot | int | None = None) -> list[DataFile]:
        if snapshot is None:
            snapshot = self.head()
            if snapshot is None:
                return []
        if isinstance(snapshot, int):
            snapshot = self.snapshot(snapshot)
        out: list[DataFile] = []
        for m in snapshot.manifests:
            out.extend(self.read_manifest(m))
        return out

    def snapshots(self) -> list[Snapshot]:
        """All snapshot objects on disk, ascending by id."""
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("snap-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(Snapshot.from_json(json.load(f)))
        return sorted(out, key=lambda s: s.snapshot_id)

    # ------------------------------------------------------------ commit

    def _acquire_lock(self) -> tuple[str, str]:
        """Returns (lock_path, owner_token).  The token is written into the
        lock file; ownership is RE-VERIFIED (:meth:`_owns_lock`) before the
        HEAD swap and before release, because the stale-steal path below can
        — in a narrow multi-writer race — remove a fresh lock it failed to
        restore.  A holder whose lock was removed then sees a token mismatch
        and raises :class:`CommitConflict` instead of double-committing."""
        lock = os.path.join(self.dir, "COMMIT.lock")
        token = f"{os.getpid()}-{time.monotonic_ns()}-{uuid.uuid4().hex}"
        deadline = time.monotonic() + 30.0
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                return lock, token
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                    if age > _LOCK_STALE_SEC:
                        # steal by rename-to-unique: only one stealer can win.
                        # Between the age check and the rename, the holder may
                        # release and a NEW writer create a fresh lock at the
                        # same path — so re-verify staleness AFTER the rename
                        # and restore (hard-link back) a fresh lock instead of
                        # discarding it.
                        stale = f"{lock}.stale-{os.getpid()}-{time.monotonic_ns()}"
                        try:
                            os.rename(lock, stale)
                            still_stale = (
                                time.time() - os.path.getmtime(stale)
                            ) > _LOCK_STALE_SEC
                            if not still_stale:
                                try:
                                    os.link(stale, lock)  # only if path free
                                except FileExistsError:
                                    pass
                            os.unlink(stale)
                        except FileNotFoundError:
                            pass
                        continue
                except FileNotFoundError:
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock held too long: {lock}")
                time.sleep(0.05)

    def _owns_lock(self, lock: str, token: str) -> bool:
        try:
            with open(lock) as f:
                return f.read() == token
        except FileNotFoundError:
            return False

    @contextlib.contextmanager
    def locked(self):
        """Hold the commit lock around a non-commit critical section (e.g.
        the tags.json read-modify-write): two concurrent taggers doing an
        unlocked RMW could silently lose a tag — and a lost tag removes its
        retention pin, letting expire_snapshots delete the snapshot it was
        meant to protect."""
        lock, token = self._acquire_lock()
        try:
            yield
        finally:
            if self._owns_lock(lock, token):
                os.unlink(lock)

    def commit(
        self,
        added: Iterable[DataFile],
        removed_paths: Iterable[str],
        operation: str,
        run_ts: str,
        expected_parent: int | None = "HEAD",  # type: ignore[assignment]
        summary: dict | None = None,
        schema_json: str | None = None,
        stage: bool = False,
    ) -> Snapshot:
        """Atomically produce a new snapshot = parent - removed + added.

        ``expected_parent="HEAD"`` (default) means "whatever HEAD is at lock
        time" (blind append/maintenance); passing the snapshot id the writer
        *read from* enforces optimistic serializable isolation and raises
        :class:`CommitConflict` when another writer got there first.

        ``stage=True`` is write-audit-publish: the snapshot file is written
        but HEAD does NOT move — readers keep the old table, auditors scan
        the staged id, and :meth:`publish` swaps HEAD after validation (or
        :meth:`drop_staged` abandons it).  Snapshot ids come from
        ``max(existing)+1`` (not ``HEAD+1``) so staged and published commits
        never collide.
        """
        os.makedirs(self.dir, exist_ok=True)
        added = list(added)
        removed = set(removed_paths)
        lock, lock_token = self._acquire_lock()
        try:
            head = self.head()
            parent_id = head.snapshot_id if head else None
            if expected_parent != "HEAD" and expected_parent != parent_id:
                raise CommitConflict(
                    f"expected parent {expected_parent} but HEAD is {parent_id}"
                )
            existing = [
                int(n[5:-5]) for n in os.listdir(self.dir)
                if n.startswith("snap-") and n.endswith(".json")
                and n[5:-5].isdigit()
            ]
            new_id = max([parent_id or 0, *existing], default=0) + 1
            if schema_json is None and head is not None:
                schema_json = head.schema_json
            # schema-evolution spec (renames/defaults) rides on snapshots the
            # same way schema_json does: inherited by every descendant commit
            # unless a commit explicitly sets a new one, so time travel to a
            # pre-evolution snapshot sees no spec
            if (
                head is not None
                and "evolution" in (head.summary or {})
                and "evolution" not in (summary or {})
            ):
                summary = dict(summary or {}, evolution=head.summary["evolution"])
            # pending merge-on-read delete specs ride the chain the same way;
            # a commit that sets "deletes" explicitly (even []) retires them
            if (
                head is not None
                and (head.summary or {}).get("deletes")
                and "deletes" not in (summary or {})
            ):
                summary = dict(summary or {}, deletes=head.summary["deletes"])

            manifests: list[str] = []
            rewrite_spill: list[DataFile] = []
            seen_removed: set[str] = set()
            reused_files = reused_rows = reused_bytes = 0
            if head is not None:
                for m in head.manifests:
                    entries = self.read_manifest(m)
                    hit = [e for e in entries if e.path in removed]
                    if not hit:
                        manifests.append(m)  # reuse untouched manifest
                        reused_files += len(entries)
                        reused_rows += sum(e.rows for e in entries)
                        reused_bytes += sum(e.bytes for e in entries)
                    else:
                        seen_removed.update(e.path for e in hit)
                        rewrite_spill.extend(e for e in entries if e.path not in removed)
            missing = removed - seen_removed
            if missing:
                raise ValueError(f"removing files not in parent snapshot: {sorted(missing)[:5]}")

            new_entries = rewrite_spill + added
            for i in range(0, len(new_entries), MANIFEST_CHUNK):
                name = f"manifest-{new_id}-{i // MANIFEST_CHUNK}.json"
                atomic_write_json(
                    os.path.join(self.dir, name),
                    {"entries": [e.to_json() for e in new_entries[i : i + MANIFEST_CHUNK]]},
                )
                manifests.append(name)

            snap = Snapshot(
                snapshot_id=new_id,
                parent_id=parent_id,
                ts=run_ts,
                operation=operation,
                manifests=manifests,
                summary=dict(
                    summary or {},
                    added_files=len(added),
                    removed_files=len(removed),
                    total_files=len(new_entries) + reused_files,
                    total_rows=sum(e.rows for e in new_entries) + reused_rows,
                    total_bytes=sum(e.bytes for e in new_entries) + reused_bytes,
                ),
                schema_json=schema_json,
            )
            if stage:
                snap.summary["staged"] = True
            atomic_write_json(os.path.join(self.dir, f"snap-{new_id}.json"), snap.to_json())
            if stage:
                return snap  # WAP: HEAD untouched until publish()
            # fencing check: if our lock was removed by a stale-steal race,
            # another committer may be inside — abort before the swap (the
            # orphaned snap/manifest files are GC'd as unreachable)
            if not self._owns_lock(lock, lock_token):
                raise CommitConflict("commit lock lost mid-commit; retry")
            # the atomic swap: readers resolve the ref exactly once per scan
            self._swap_head(new_id)
            return snap
        finally:
            # release only if still ours — never remove a successor's lock
            if self._owns_lock(lock, lock_token):
                os.unlink(lock)

    # ------------------------------------------------------------ expiry

    def live_snapshot_ids(self, keep_last: int) -> set[int]:
        """Ids of the last ``keep_last`` snapshots on the HEAD ancestry chain."""
        keep: set[int] = set()
        cur = self.head()
        while cur is not None and len(keep) < keep_last:
            keep.add(cur.snapshot_id)
            if cur.parent_id is None:
                break
            try:
                cur = self.snapshot(cur.parent_id)
            except FileNotFoundError:  # ancestor expired in a prior pass
                break
        return keep

    def _head_chain(self) -> set[int]:
        chain: set[int] = set()
        cur = self.head()
        while cur is not None:
            chain.add(cur.snapshot_id)
            if cur.parent_id is None:
                break
            try:
                cur = self.snapshot(cur.parent_id)
            except FileNotFoundError:  # ancestor already expired
                break
        return chain

    def publish(self, snapshot_id: int) -> Snapshot:
        """Write-audit-publish step 3: swap HEAD to a previously staged
        snapshot.  Refuses (:class:`CommitConflict`) when the table advanced
        past the staged snapshot's parent — the stager must re-stage on the
        new base (its data files are unchanged; only the diff must be
        recomputed against the new parent)."""
        lock, lock_token = self._acquire_lock()
        try:
            snap = self.snapshot(snapshot_id)
            head = self.head()
            parent = head.snapshot_id if head else None
            if snap.parent_id != parent:
                raise CommitConflict(
                    f"staged snapshot {snapshot_id} has parent "
                    f"{snap.parent_id} but HEAD is {parent}; re-stage"
                )
            if not self._owns_lock(lock, lock_token):
                raise CommitConflict("commit lock lost mid-publish; retry")
            self._swap_head(snapshot_id)
            return snap
        finally:
            if self._owns_lock(lock, lock_token):
                os.unlink(lock)

    # ------------------------------------------------------------ refs

    def _swap_head(self, new_id: int) -> None:
        """Atomically move this store's writable ref (``HEAD`` here; a
        branch pointer in :class:`BranchStore`).  Callers hold the commit
        lock."""
        atomic_write_json(os.path.join(self.dir, "HEAD"), {"snapshot_id": new_id})

    def refs(self) -> dict[str, int]:
        """Named writable branch refs (name -> snapshot id).  ``HEAD`` — the
        main branch — is stored separately and is not listed here."""
        try:
            with open(os.path.join(self.dir, "refs.json")) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def _write_refs(self, refs: dict[str, int]) -> None:
        """Caller holds the commit lock (refs.json is a read-modify-write)."""
        atomic_write_json(os.path.join(self.dir, "refs.json"), refs)

    def create_branch(self, name: str, at: int | None = None) -> int:
        """Create a writable branch ref pointing at ``at`` (default: current
        HEAD).  Branch commits advance the ref without touching HEAD; main
        adopts a branch with :meth:`fast_forward`.  The locked RMW mirrors
        tags.json (an unlocked RMW can silently lose a concurrent ref)."""
        if name == "HEAD" or "/" in name or not name:
            raise ValueError(f"invalid branch name {name!r}")
        with self.locked():
            refs = self.refs()
            if name in refs:
                raise ValueError(f"branch {name!r} already exists")
            sid = at if at is not None else self.head_id()
            if sid is None:
                raise ValueError("cannot branch an empty table (no snapshots)")
            self.snapshot(sid)  # must resolve
            refs[name] = int(sid)
            self._write_refs(refs)
            return int(sid)

    def drop_branch(self, name: str) -> None:
        """Remove a branch ref.  Its snapshots lose their retention pin and
        expire like any other off-chain history; data files follow via GC."""
        with self.locked():
            refs = self.refs()
            if name not in refs:
                raise ValueError(f"no branch {name!r}")
            del refs[name]
            self._write_refs(refs)

    def branch_head_id(self, name: str) -> int:
        refs = self.refs()
        if name not in refs:
            raise ValueError(f"no branch {name!r}")
        return refs[name]

    def _chain_of(self, snapshot_id: int | None) -> set[int]:
        """Ancestry ids reachable from ``snapshot_id`` (inclusive)."""
        chain: set[int] = set()
        while snapshot_id is not None:
            chain.add(snapshot_id)
            try:
                snapshot_id = self.snapshot(snapshot_id).parent_id
            except FileNotFoundError:  # ancestor already expired
                break
        return chain

    def fast_forward(self, name: str) -> Snapshot:
        """Move HEAD to a branch's head — the branch-merge step when main
        has not advanced past the fork point (the branch head's ancestry
        must contain current HEAD; otherwise the branch must be rebased by
        replaying its ops, and this raises :class:`CommitConflict`)."""
        lock, lock_token = self._acquire_lock()
        try:
            target = self.branch_head_id(name)
            head = self.head_id()
            if head is not None and head not in self._chain_of(target):
                raise CommitConflict(
                    f"HEAD {head} is not an ancestor of branch {name!r} "
                    f"head {target}; rebase the branch"
                )
            if not self._owns_lock(lock, lock_token):
                raise CommitConflict("commit lock lost mid-fast-forward; retry")
            self._swap_head(target)
            return self.snapshot(target)
        finally:
            if self._owns_lock(lock, lock_token):
                os.unlink(lock)

    def drop_staged(self, snapshot_id: int) -> None:
        """Abandon a staged (never-published) snapshot: the snap file is
        removed; its data files become orphans for the next GC.  Refuses to
        touch anything reachable from ANY writable ref — this store's own
        chain, main's HEAD chain (a branch handle must not drop main
        history), or another branch's chain."""
        protected = self._head_chain()
        protected |= self._chain_of(ManifestStore.head_id(self))
        for sid in self.refs().values():
            protected |= self._chain_of(sid)
        if snapshot_id in protected:
            raise ValueError(
                f"snapshot {snapshot_id} is on a published/ref chain; "
                "use expire/rollback for published history"
            )
        os.unlink(os.path.join(self.dir, f"snap-{snapshot_id}.json"))

    def expire(self, keep_last: int = 2, older_than: str | None = None) -> list[int]:
        """Delete snapshot + manifest files not reachable from the kept set.

        ``older_than`` (ISO-8601): additionally keep any snapshot whose
        ``ts`` is >= the bound (time-based retention, composable with
        ``keep_last``).  Staged-but-unpublished snapshots (off the HEAD
        chain) are always kept — they are awaiting audit; use
        :meth:`drop_staged` to abandon one.

        Returns the expired snapshot ids.  Data-file GC is separate
        (:meth:`LakeTable.gc_orphans`) so a crash between the two steps never
        loses reachable data.
        """
        keep = self.live_snapshot_ids(keep_last)
        try:  # named tags pin their snapshots regardless of age/position
            with open(os.path.join(self.dir, "tags.json")) as f:
                keep |= set(json.load(f).values())
        except FileNotFoundError:
            pass
        chain = self._head_chain()
        # live branches pin their whole ancestry (a branch commit's parent
        # chain must stay resolvable until the branch is dropped or merged)
        for sid in self.refs().values():
            branch_chain = self._chain_of(sid)
            keep |= branch_chain
            chain |= branch_chain
        # HEAD is itself a ref: when expire runs through a BRANCH handle,
        # main's chain must survive in full (keep_last applies only to the
        # ref being expired; retiring main history is main's own call)
        main_id = ManifestStore.head_id(self)
        if main_id is not None and main_id != self.head_id():
            main_chain = self._chain_of(main_id)
            keep |= main_chain
            chain |= main_chain
        for snap in self.snapshots():
            if snap.snapshot_id not in chain:
                # ONLY explicitly staged snapshots survive off-chain — a
                # fencing-aborted commit's orphan snap file must expire, or
                # snapshots (and via GC-reachability, data files) leak
                if (snap.summary or {}).get("staged"):
                    keep.add(snap.snapshot_id)
            elif older_than is not None and snap.ts >= older_than:
                keep.add(snap.snapshot_id)
        kept_manifests: set[str] = set()
        expired: list[int] = []
        for snap in self.snapshots():
            if snap.snapshot_id in keep:
                kept_manifests.update(snap.manifests)
        for snap in self.snapshots():
            if snap.snapshot_id in keep:
                continue
            expired.append(snap.snapshot_id)
            os.unlink(os.path.join(self.dir, f"snap-{snap.snapshot_id}.json"))
            for m in snap.manifests:
                if m not in kept_manifests:
                    p = os.path.join(self.dir, m)
                    if os.path.exists(p):
                        os.unlink(p)
        return expired


class BranchStore(ManifestStore):
    """A :class:`ManifestStore` whose writable ref is a named branch instead
    of ``HEAD``: reads resolve the branch pointer, and every commit advances
    the branch under the SAME table-wide commit lock (one lock per table, so
    branch and main commits serialize but never corrupt each other).  All
    snapshot/manifest/data storage is shared with main — a branch is one
    integer in ``refs.json``, Iceberg-ref style."""

    def __init__(self, table_root: str, branch: str):
        super().__init__(table_root)
        self.branch = branch

    def head_id(self) -> int | None:
        return self.branch_head_id(self.branch)

    def _swap_head(self, new_id: int) -> None:
        # caller (commit/publish) holds the commit lock — plain RMW is safe
        refs = self.refs()
        if self.branch not in refs:
            raise CommitConflict(f"branch {self.branch!r} was dropped")
        refs[self.branch] = int(new_id)
        self._write_refs(refs)
