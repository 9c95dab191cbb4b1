"""Iceberg-style snapshot log for a sink table: append-only data files +
an atomically-replaced JSON metadata file standing in for Iceberg table
metadata (in production this IS an Iceberg catalog commit; the interface
and semantics below follow the public Iceberg spec's snapshot model).

Semantics implemented (and tested):
  - every write is a COMMIT that produces a new immutable snapshot
    (snapshot_id, parent_id, sequence, operation, file list, summary);
    data files are never rewritten — an `overwrite` commit only changes
    which files the new snapshot references.
  - snapshot isolation: readers resolve a snapshot FIRST, then read
    exactly its file list; a concurrent commit can't tear a read.
  - time travel: `read(spark, as_of=snapshot_id)` reads any historical
    snapshot while its files remain (no physical delete here — expiry
    would be a separate maintenance op, as in Iceberg).
  - rollback: `rollback(snapshot_id)` makes a PRIOR snapshot current by
    appending a new `rollback` snapshot referencing its files (history is
    never mutated — same as Iceberg's rollback-as-new-snapshot).
  - optimistic concurrency: commit verifies the current sequence it built
    against is still current at publish time (compare-and-swap via atomic
    rename + re-read), raising CommitConflict for the loser.

This deepens plans/lineage.py (the per-partition resume manifest): lineage
answers "which sink cells are durably written" for idempotent reruns;
this answers "what did the table look like at commit X".
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed between snapshot resolution and publish."""


class SnapshotStore:
    def __init__(self, table_path: str):
        self.table_path = table_path
        self.meta_path = os.path.join(table_path, "_snapshots.json")

    # --- metadata I/O ------------------------------------------------------
    def _load(self) -> list[dict]:
        if not os.path.exists(self.meta_path):
            return []
        with open(self.meta_path) as f:
            return json.load(f)

    # a writer that died inside the commit critical section leaves the
    # lock file behind; locks older than this are reclaimable orphans
    _ORPHAN_LOCK_AGE_S = 60.0

    def _publish(self, snapshots: list[dict], expected_seq: int) -> None:
        """True compare-and-swap: the sequence check runs INSIDE an
        exclusive commit lock (O_CREAT|O_EXCL is the atomic primitive), so
        two racing publishers — append vs append, or append vs
        expire/compact maintenance — can never both pass the check and
        silently clobber each other (the previous bare load/check/replace
        was check-then-act). The writer that finds the lock held raises
        CommitConflict immediately (optimistic model: the caller rebuilds
        and retries). A lock whose holder died mid-commit is reclaimed
        after a grace period so one crash can't wedge the table."""
        os.makedirs(self.table_path, exist_ok=True)
        lock = os.path.join(self.table_path, "_commit.lock")
        for attempt in (0, 1):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                except OSError:
                    continue  # lock vanished between open and stat: retry
                if attempt == 0 and age > self._ORPHAN_LOCK_AGE_S:
                    try:
                        os.remove(lock)  # reclaim the orphan, then retry
                    except FileNotFoundError:
                        pass
                    continue
                raise CommitConflict(
                    "another writer holds the commit lock; retry the commit"
                ) from None
        try:
            current = self._load()
            if (current[-1]["sequence"] if current else 0) != expected_seq:
                raise CommitConflict(
                    f"table advanced past sequence {expected_seq}; retry the commit"
                )
            tmp = self.meta_path + f".{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                json.dump(snapshots, f)
            os.replace(tmp, self.meta_path)
        finally:
            try:
                os.remove(lock)
            except FileNotFoundError:
                pass

    # --- snapshot resolution ----------------------------------------------
    def snapshots(self) -> list[dict]:
        return self._load()

    def current(self) -> dict | None:
        snaps = self._load()
        return snaps[-1] if snaps else None

    def snapshot(self, snapshot_id: str) -> dict:
        for s in self._load():
            if s["snapshot_id"] == snapshot_id:
                return s
        raise KeyError(f"unknown snapshot {snapshot_id!r}")

    # --- commits -----------------------------------------------------------
    def commit_files(self, files: list[str], operation: str, summary: dict | None = None) -> str:
        snaps = self._load()
        parent = snaps[-1] if snaps else None
        seq = (parent["sequence"] if parent else 0) + 1
        base = []
        if operation == "append" and parent is not None:
            base = parent["files"]
        snap = {
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "sequence": seq,
            "operation": operation,
            "files": sorted(base + files),
            "ts": time.time(),
            "summary": summary or {},
        }
        self._publish(snaps + [snap], expected_seq=seq - 1)
        return snap["snapshot_id"]

    def rollback(self, snapshot_id: str) -> str:
        target = self.snapshot(snapshot_id)
        snaps = self._load()
        seq = snaps[-1]["sequence"] + 1
        snap = {
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": snaps[-1]["snapshot_id"],
            "sequence": seq,
            "operation": "rollback",
            "files": target["files"],
            "ts": time.time(),
            "summary": {"rolled_back_to": snapshot_id},
        }
        self._publish(snaps + [snap], expected_seq=seq - 1)
        return snap["snapshot_id"]


def _drop_commit_dir(commit_dir: str) -> None:
    """Remove a commit directory whose publish lost the CAS race. The files
    are referenced by no snapshot (the commit never happened), so deleting
    them here is what keeps retried commits from stranding a table copy on
    disk — Iceberg's writers do the same cleanup when a commit fails."""
    import shutil

    shutil.rmtree(commit_dir, ignore_errors=True)


def write_snapshot(
    df: DataFrame, table_path: str, mode: str = "append", summary: dict | None = None
) -> str:
    """Commit `df` to the snapshot table. Data lands in a fresh immutable
    commit directory (never overwritten); `mode='append'` unions with the
    current snapshot's files, `mode='overwrite'` replaces the referenced
    set. `summary` entries ride on the snapshot (Iceberg summary props).
    Returns the new snapshot id."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    store = SnapshotStore(table_path)
    commit_dir = os.path.join(table_path, "data", f"commit-{uuid.uuid4().hex}")
    df.write.mode("error").parquet(commit_dir)
    files = sorted(
        os.path.join(commit_dir, f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet")
    )
    try:
        return store.commit_files(
            files, operation=mode, summary={**(summary or {}), "added_files": len(files)}
        )
    except CommitConflict:
        _drop_commit_dir(commit_dir)
        raise


def read_snapshot(spark: SparkSession, table_path: str, as_of: str | None = None) -> DataFrame:
    """Read the table at a snapshot (default: current). The file list is
    resolved BEFORE the scan, so the read is isolated from concurrent
    commits (Iceberg's reader contract)."""
    store = SnapshotStore(table_path)
    snap = store.snapshot(as_of) if as_of else store.current()
    if snap is None or not snap["files"]:
        raise ValueError(f"snapshot table {table_path!r} is empty")
    return spark.read.parquet(*snap["files"])


def compact_snapshot(
    spark: SparkSession,
    table_path: str,
    target_records_per_file: int = 1_000_000,
) -> str:
    """Small-files compaction — the Iceberg `rewrite_data_files` maintenance
    action. Streaming/micro-batch sinks accumulate many small parquet files;
    at 100 TB that inflates scan planning and footer I/O. This resolves the
    CURRENT snapshot, rewrites its rows into ceil(rows/target) right-sized
    files, and commits a `replace` snapshot referencing only the new files.

    Concurrency: the commit is published with compare-and-swap against the
    RESOLVED snapshot's sequence, so an append that lands mid-compaction
    makes the compaction lose with CommitConflict (retry) instead of
    silently dropping the appended files — Iceberg's validation rule.
    History is untouched: pre-compaction snapshots still time-travel until
    `expire_snapshots` removes them."""
    store = SnapshotStore(table_path)
    snaps = store._load()  # noqa: SLF001 — same-module maintenance op
    if not snaps or not snaps[-1]["files"]:
        raise ValueError(f"snapshot table {table_path!r} is empty")
    resolved = snaps[-1]
    df = spark.read.parquet(*resolved["files"])
    n_rows = df.count()
    n_files = max(1, -(-n_rows // int(target_records_per_file)))
    commit_dir = os.path.join(table_path, "data", f"commit-{uuid.uuid4().hex}")
    df.repartition(n_files).write.mode("error").parquet(commit_dir)
    files = sorted(
        os.path.join(commit_dir, f) for f in os.listdir(commit_dir) if f.endswith(".parquet")
    )
    snap = {
        "snapshot_id": uuid.uuid4().hex,
        "parent_id": resolved["snapshot_id"],
        "sequence": resolved["sequence"] + 1,
        "operation": "replace",
        "files": files,
        "ts": time.time(),
        "summary": {
            "compacted_from": len(resolved["files"]),
            "compacted_to": len(files),
            "rows": n_rows,
        },
    }
    try:
        store._publish(snaps + [snap], expected_seq=resolved["sequence"])  # noqa: SLF001
    except CommitConflict:
        _drop_commit_dir(commit_dir)
        raise
    return snap["snapshot_id"]


def expire_snapshots(table_path: str, keep_last: int = 2) -> dict:
    """Iceberg `expire_snapshots`: keep the most recent `keep_last`
    snapshots, rewrite the metadata to the kept history, then delete data
    files referenced ONLY by expired ones (failed-commit orphans never
    reach a snapshot — their writers reclaim them on conflict). Time travel
    to expired snapshots is gone by design; the current snapshot and its
    files are never touched."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    store = SnapshotStore(table_path)
    snaps = store._load()  # noqa: SLF001
    if len(snaps) <= keep_last:
        return {"expired_snapshots": 0, "deleted_files": 0}
    kept, expired = snaps[-keep_last:], snaps[:-keep_last]
    live = {f for s in kept for f in s["files"]}
    doomed = {f for s in expired for f in s["files"]} - live
    # Commit the trimmed metadata FIRST (Iceberg's ordering): if a concurrent
    # writer advanced the table, the CAS raises before anything is deleted,
    # and no published snapshot can ever reference a removed file. Only after
    # the kept history is durable do the now-unreferenced files go.
    store._publish(kept, expected_seq=snaps[-1]["sequence"])  # noqa: SLF001
    deleted = 0
    for f in sorted(doomed):
        try:
            os.remove(f)
            deleted += 1
        except FileNotFoundError:
            pass
    # drop commit directories no kept snapshot references at all — only
    # Spark bookkeeping (_SUCCESS, .crc) remains in them after the data
    # deletions, and a per-micro-batch committer would otherwise
    # accumulate empty dirs forever
    import shutil

    live_dirs = {os.path.dirname(f) for f in live}
    for d in {os.path.dirname(f) for f in doomed} - live_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return {"expired_snapshots": len(expired), "deleted_files": deleted}
