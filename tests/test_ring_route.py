"""Consistent-hash backend routing (operators/route.py ring_route) —
Karger ring construction mirroring
exporter/loadbalancingexporter/consistent_hashing.go and its test
properties: position count, distribution balance, and the rebalancing
guarantee (removing an endpoint only moves that endpoint's keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.route import (
    RING_MAX_POSITIONS,
    build_hash_ring,
    ring_route,
)

EPS = ["backend-1", "backend-2", "backend-3"]


def test_ring_construction_mirrors_reference():
    ring = build_hash_ring(EPS, weight=200)
    # every endpoint contributes ~weight positions (probe-limit skips are rare)
    counts: dict[str, int] = {}
    for _, ep in ring:
        counts[ep] = counts.get(ep, 0) + 1
    assert set(counts) == set(EPS)
    assert all(c >= 195 for c in counts.values())
    # items sorted, positions unique and in range
    positions = [p for p, _ in ring]
    assert positions == sorted(positions)
    assert len(set(positions)) == len(positions)
    assert all(0 <= p < RING_MAX_POSITIONS for p in positions)
    # deterministic
    assert build_hash_ring(EPS, weight=200) == ring


def test_route_balance_and_wrap(spark):
    ring = build_hash_ring(EPS)
    df = spark.range(3000).select(F.concat(F.lit("trace-"), F.col("id")).alias("key"))
    got = ring_route(df, "key", ring).groupBy("backend").count().collect()
    counts = {r["backend"]: r["count"] for r in got}
    assert set(counts) == set(EPS)
    # consistent_hashing_test.go tolerates imbalance; ~uniform thirds ±25%
    assert all(abs(c - 1000) < 250 for c in counts.values()), counts


def test_removing_endpoint_only_moves_its_keys(spark):
    full = build_hash_ring(EPS)
    reduced = build_hash_ring(EPS[:-1])  # backend-3 leaves
    df = spark.range(2000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    a = {r["key"]: r["backend"] for r in ring_route(df, "key", full).collect()}
    b = {r["key"]: r["backend"] for r in ring_route(df, "key", reduced).collect()}
    moved = [k for k in a if a[k] != b[k]]
    # every moved key was on the departed backend; survivors' keys are stable
    assert moved and all(a[k] == "backend-3" for k in moved)
    assert all(b[k] != "backend-3" for k in b)


def test_ring_route_plan_is_projection(spark):
    import io
    from contextlib import redirect_stdout

    ring = build_hash_ring(EPS, weight=50)
    df = spark.range(10).select(F.col("id").cast("string").alias("key"))
    out = ring_route(df, "key", ring)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    for bad in ("Exchange", "Join", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan
