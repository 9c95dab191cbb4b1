"""Iceberg-contract snapshot store (plans/snapshots.py): commit/append/
overwrite lineage, time-travel reads, rollback-as-new-snapshot, and the
optimistic-concurrency conflict check."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.snapshots import (
    CommitConflict,
    SnapshotStore,
    read_snapshot,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"))


def test_append_overwrite_and_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    s1 = write_snapshot(_df(spark, 0, 10), tbl, mode="append")
    s2 = write_snapshot(_df(spark, 10, 15), tbl, mode="append")
    s3 = write_snapshot(_df(spark, 100, 103), tbl, mode="overwrite")

    assert read_snapshot(spark, tbl).count() == 3                 # current = overwrite
    assert read_snapshot(spark, tbl, as_of=s1).count() == 10      # time travel
    assert read_snapshot(spark, tbl, as_of=s2).count() == 15      # append unioned
    # overwrite never rewrote old data files — s1 still fully readable
    assert sorted(r["id"] for r in read_snapshot(spark, tbl, as_of=s1).collect()) == list(range(10))

    store = SnapshotStore(tbl)
    snaps = store.snapshots()
    assert [s["operation"] for s in snaps] == ["append", "append", "overwrite"]
    assert [s["sequence"] for s in snaps] == [1, 2, 3]
    assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]
    assert s3 == snaps[-1]["snapshot_id"]


def test_rollback_is_a_new_snapshot(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    s1 = write_snapshot(_df(spark, 0, 5), tbl)
    write_snapshot(_df(spark, 0, 99), tbl, mode="overwrite")
    store = SnapshotStore(tbl)
    rb = store.rollback(s1)

    assert read_snapshot(spark, tbl).count() == 5                  # current is restored
    snaps = store.snapshots()
    assert len(snaps) == 3                                         # history never mutated
    assert snaps[-1]["snapshot_id"] == rb
    assert snaps[-1]["operation"] == "rollback"
    assert snaps[-1]["summary"]["rolled_back_to"] == s1


def test_commit_conflict_detected(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 3), tbl)
    store = SnapshotStore(tbl)
    # a commit built against sequence 0 must lose once sequence 1 exists
    with pytest.raises(CommitConflict):
        store._publish([{"sequence": 1}], expected_seq=0)


def test_reader_isolated_from_later_commits(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    write_snapshot(_df(spark, 0, 4), tbl)
    df = read_snapshot(spark, tbl)          # resolves the file list NOW
    write_snapshot(_df(spark, 0, 100), tbl, mode="overwrite")
    assert df.count() == 4                  # unaffected by the overwrite
