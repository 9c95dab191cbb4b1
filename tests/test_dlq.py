"""Quarantine/DLQ sink: split invariants + resumable write contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.dlq import (
    fixture_rules,
    split_quarantine,
    write_with_dlq,
)


def test_split_partitions_the_frame(routed_t1):
    accepted, bad = split_quarantine(routed_t1, fixture_rules())
    n, na, nb = routed_t1.count(), accepted.count(), bad.count()
    assert na + nb == n and nb > 0
    assert accepted.columns == routed_t1.columns  # original schema kept
    assert "error_reason" in bad.columns
    assert bad.filter(F.col("error_reason").isNull()).count() == 0
    # first-match-wins: every raw row is 'unparsed', never the later rule
    assert (
        bad.filter(
            (F.col("pattern_id") == "raw") & (F.col("error_reason") != "unparsed")
        ).count()
        == 0
    )


def test_reasons_are_exhaustive_and_ordered(routed_t1):
    _, bad = split_quarantine(routed_t1, fixture_rules())
    reasons = {r.error_reason for r in bad.select("error_reason").distinct().collect()}
    assert reasons <= {"unparsed", "missing_tool_status"}
    # rule 2 rows really do lack a status and carry a tool
    m = bad.filter(F.col("error_reason") == "missing_tool_status")
    assert m.filter((F.col("tool") == "none") | F.col("status").isNotNull()).count() == 0


def test_write_with_dlq_is_resumable(routed_t1, tmp_path):
    base = str(tmp_path / "dlq_out")
    paths = write_with_dlq(routed_t1, fixture_rules(), base)
    assert set(paths) == {"accepted", "quarantine"}
    spark = routed_t1.sparkSession
    first = {k: spark.read.parquet(p).count() for k, p in paths.items()}
    assert first["accepted"] + first["quarantine"] == routed_t1.count()
    # rerun: manifest marks both sinks committed; counts unchanged
    paths2 = write_with_dlq(routed_t1, fixture_rules(), base)
    second = {k: spark.read.parquet(p).count() for k, p in paths2.items()}
    assert second == first
