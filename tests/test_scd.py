"""SCD2 versioned dimensions: build collapse semantics, merge == full
replay for every split point, as-of lookup interval edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.scd import (
    scd2_build,
    scd2_lookup,
    scd2_merge,
)

SCHEMA = "entity_id string, seq long, valid_from long, tier string, region string"

CHANGES = [
    # entity a: open, no-op (collapsed), real change, change back
    ("a", 1, 100, "t1", "r1"),
    ("a", 2, 200, "t1", "r1"),
    ("a", 3, 300, "t2", "r1"),
    ("a", 4, 400, "t1", "r1"),
    # entity b: single version, NULL attr handling
    ("b", 5, 150, None, "r9"),
    ("b", 6, 250, None, "r9"),  # NULL == NULL -> collapsed
    ("b", 7, 350, "tb", "r9"),  # NULL -> value opens a version
    # entity c: same-timestamp changes, seq breaks the tie
    ("c", 8, 500, "x", "r1"),
    ("c", 9, 500, "y", "r1"),
]


@pytest.fixture(scope="module")
def changes(spark):
    return spark.createDataFrame(CHANGES, SCHEMA).persist()


def _rows(df):
    rows = [
        (r.entity_id, r.valid_from, r.valid_to, r.tier, r.region) for r in df.collect()
    ]
    return sorted(rows, key=lambda t: tuple((v is None, v or 0 if not isinstance(v, str) else v) for v in t))


def test_build_collapse_and_intervals(changes):
    dim = scd2_build(changes, "entity_id", ["tier", "region"])
    assert _rows(dim) == [
        ("a", 100, 300, "t1", "r1"),
        ("a", 300, 400, "t2", "r1"),
        ("a", 400, None, "t1", "r1"),
        ("b", 150, 350, None, "r9"),
        ("b", 350, None, "tb", "r9"),
        ("c", 500, 500, "x", "r1"),  # zero-width: superseded same instant
        ("c", 500, None, "y", "r1"),
    ]
    # exactly one current version per key
    cur = dim.filter(F.col("valid_to").isNull()).groupBy("entity_id").count()
    assert all(r["count"] == 1 for r in cur.collect())


@pytest.mark.parametrize("cut", [150, 250, 350, 450, 501])
def test_merge_equals_full_replay(changes, cut):
    full = scd2_build(changes, "entity_id", ["tier", "region"])
    dim = scd2_build(changes.filter(F.col("valid_from") < cut), "entity_id", ["tier", "region"])
    batch = changes.filter(F.col("valid_from") >= cut)
    merged = scd2_merge(dim, batch, "entity_id", ["tier", "region"])
    assert _rows(merged) == _rows(full)


def test_merge_brand_new_key(changes, spark):
    dim = scd2_build(changes, "entity_id", ["tier", "region"])
    batch = spark.createDataFrame([("z", 99, 900, "tz", "rz")], SCHEMA)
    merged = scd2_merge(dim, batch, "entity_id", ["tier", "region"])
    assert ("z", 900, None, "tz", "rz") in _rows(merged)
    assert merged.count() == dim.count() + 1


def test_merge_noop_batch_opens_nothing(changes, spark):
    dim = scd2_build(changes, "entity_id", ["tier", "region"])
    # same attrs as a's current version -> must collapse into it
    batch = spark.createDataFrame([("a", 50, 999, "t1", "r1")], SCHEMA)
    merged = scd2_merge(dim, batch, "entity_id", ["tier", "region"])
    assert _rows(merged) == _rows(dim)


def test_lookup_interval_edges(changes, spark):
    dim = scd2_build(changes, "entity_id", ["tier", "region"])
    facts = spark.createDataFrame(
        [("a", 99), ("a", 100), ("a", 299), ("a", 300), ("a", 9999), ("b", 350), ("nope", 1)],
        "entity_id string, us long",
    )
    got = {
        (r.entity_id, r.us): r.tier
        for r in scd2_lookup(facts, dim, "entity_id", "us", attrs=["tier"]).collect()
    }
    assert got == {
        ("a", 99): None,      # before first version
        ("a", 100): "t1",     # valid_from is inclusive
        ("a", 299): "t1",
        ("a", 300): "t2",     # valid_to is exclusive
        ("a", 9999): "t1",    # open current version
        ("b", 350): "tb",
        ("nope", 1): None,    # unknown key survives (left join)
    }
    # versions are non-overlapping -> fact count preserved
    assert scd2_lookup(facts, dim, "entity_id", "us").count() == facts.count()


def test_lookup_plan_is_broadcast(changes, spark):
    dim = scd2_build(changes, "entity_id", ["tier", "region"])
    facts = spark.range(10).select(
        F.concat(F.lit("e"), (F.col("id") % 3).cast("string")).alias("entity_id"),
        F.col("id").alias("us"),
    )
    plan = scd2_lookup(facts, dim, "entity_id", "us")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_streaming_lookup_matches_batch(changes, spark, tmp_path):
    """scd2_lookup is stream-safe: the versioned dim is static, the fact
    side streams, the as-of join rides the stream-static broadcast hash
    join — micro-batch enrichment agrees with the batch answer exactly."""
    import json

    from opentelemetry_collector_contrib_spark.streaming import run_available_now

    d = tmp_path / "facts"
    d.mkdir()
    rows = [
        {"fact_id": i, "entity_id": e, "us": us}
        for i, (e, us) in enumerate(
            [("a", 99), ("a", 150), ("a", 350), ("b", 200), ("b", 400), ("c", 500), ("z", 1)]
        )
    ]
    (d / "f1.json").write_text("\n".join(json.dumps(r) for r in rows[:4]))
    (d / "f2.json").write_text("\n".join(json.dumps(r) for r in rows[4:]))

    dim = scd2_build(changes, "entity_id", ["tier", "region"])
    schema = "fact_id long, entity_id string, us long"
    sdf = scd2_lookup(
        spark.readStream.schema(schema).json(str(d)), dim, "entity_id", "us", attrs=["tier"]
    )
    assert sdf.isStreaming
    run_available_now(sdf, "scd2_stream", str(tmp_path / "ck"))
    got = {r.fact_id: r.tier for r in spark.table("scd2_stream").collect()}

    bdf = scd2_lookup(
        spark.read.schema(schema).json(str(d)), dim, "entity_id", "us", attrs=["tier"]
    )
    want = {r.fact_id: r.tier for r in bdf.collect()}
    assert got == want and len(got) == len(rows)
