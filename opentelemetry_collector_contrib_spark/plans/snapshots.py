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

    def _publish(self, snapshots: list[dict], expected_seq: int) -> None:
        os.makedirs(self.table_path, exist_ok=True)
        current = self._load()
        if (current[-1]["sequence"] if current else 0) != expected_seq:
            raise CommitConflict(
                f"table advanced past sequence {expected_seq}; retry the commit"
            )
        tmp = self.meta_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(snapshots, f)
        os.replace(tmp, self.meta_path)

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


def write_snapshot(df: DataFrame, table_path: str, mode: str = "append") -> str:
    """Commit `df` to the snapshot table. Data lands in a fresh immutable
    commit directory (never overwritten); `mode='append'` unions with the
    current snapshot's files, `mode='overwrite'` replaces the referenced
    set. Returns the new snapshot id."""
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
    return store.commit_files(files, operation=mode, summary={"added_files": len(files)})


def read_snapshot(spark: SparkSession, table_path: str, as_of: str | None = None) -> DataFrame:
    """Read the table at a snapshot (default: current). The file list is
    resolved BEFORE the scan, so the read is isolated from concurrent
    commits (Iceberg's reader contract)."""
    store = SnapshotStore(table_path)
    snap = store.snapshot(as_of) if as_of else store.current()
    if snap is None or not snap["files"]:
        raise ValueError(f"snapshot table {table_path!r} is empty")
    return spark.read.parquet(*snap["files"])
