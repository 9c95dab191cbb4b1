"""Tests for template clustering, cardinality guard, metrics generation,
service-graph edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import templates


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "user 123 logged in from 10.0.0.1"),
        (2, "user 456 logged in from 10.0.0.2"),
        (3, "user 789 logged in from 172.16.0.9"),
        (4, 'payload "abc" accepted at 0xDEADBEEF'),
        (5, 'payload "xyz" accepted at 0xCAFEBABE'),
        (6, "something unique"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_drain_templates_converge(logs):
    out = {r["template"]: r for r in templates.drain_templates(logs).collect()}
    assert out["user <*> logged in from <*>"]["match_count"] == 3
    assert out["payload <*> accepted at <*>"]["match_count"] == 2
    assert out["something unique"]["match_count"] == 1
    # deterministic example: lexicographic min raw text
    assert out["user <*> logged in from <*>"]["example"] == "user 123 logged in from 10.0.0.1"


def test_drain_word_position_merge(spark):
    """Drain README convergence across WORD tokens: 'user alice logged in'
    ≡ 'user bob logged in' → one 'user <*> logged in' template once the
    position's distinct-count exceeds the merge threshold."""
    rows = [(i, f"user {name} logged in") for i, name in enumerate(
        ["alice", "bob", "carol", "dave", "erin"])]
    rows += [(90, "session opened fine"), (91, "session closed fine")]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["template"]: r["match_count"] for r in templates.drain_templates(df).collect()}
    assert out["user <*> logged in"] == 5
    # below-threshold variability (2 distinct) keeps separate clusters
    assert out["session opened fine"] == 1 and out["session closed fine"] == 1
    # mask-only mode still available
    raw = {r["template"] for r in templates.drain_templates(df, merge_threshold=None).collect()}
    assert "user alice logged in" in raw and len(raw) == 7


def test_annotate_templates(logs):
    out = templates.annotate_templates(logs)
    assert out.count() == logs.count()          # annotate-only: rows unchanged
    r = out.filter(F.col("id") == 1).collect()[0]
    assert r["log_template"] == "user <*> logged in from <*>"
    assert r["text"].startswith("user 123")


def test_cardinality_guard(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], ["hi_card", "lo_card"])
    out = {r["key"]: r for r in templates.cardinality_guard(df, ["hi_card", "lo_card"], limit=10).collect()}
    assert out["hi_card"]["distinct_count"] == 100 and out["hi_card"]["over_limit"]
    assert out["lo_card"]["distinct_count"] == 3 and not out["lo_card"]["over_limit"]
    # approx path stays within HLL tolerance
    approx = {r["key"]: r["distinct_count"] for r in templates.cardinality_guard(df, ["hi_card"], 10, exact=False).collect()}
    assert abs(approx["hi_card"] - 100) <= 10


def test_metrics_generation_ratio(spark):
    rows = [
        ("g1", "purchase", 10.0), ("g1", "purchase", 5.0), ("g1", "view", 3.0),
        ("g2", "view", 7.0),
    ]
    df = spark.createDataFrame(rows, ["g", "name", "v"])
    out = {r["g"]: r for r in templates.metrics_generation_ratio(df, ["g"], "name", "v", "purchase", "view").collect()}
    assert out["g1"]["ratio"] == 5.0
    assert out["g2"]["ratio"] is None  # no numerator -> null num_total -> null ratio


def test_service_graph_edges(spark):
    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"), ("c1", 3, "assistant"),
        ("c2", 0, "system"), ("c2", 1, "user"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role"])
    out = {(r["caller"], r["callee"]): r["call_count"] for r in templates.service_graph_edges(df).collect()}
    assert out[("user", "assistant")] == 2
    assert out[("assistant", "user")] == 1
    assert out[("system", "user")] == 1
    assert sum(out.values()) == 4  # n_rows - n_traces

def test_pagerank_hub_wins_and_mass_conserved(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.operators.templates import (
        pagerank_iterations,
    )

    edges = spark.createDataFrame(
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1), ("hub", "a", 3)],
        "caller string, callee string, call_count long",
    )
    out = {r.node: r.pagerank for r in pagerank_iterations(edges, n_iter=5).collect()}
    assert out["hub"] == max(out.values())
    assert out["b"] == out["c"]  # symmetric spokes tie
    assert out["a"] > out["b"]  # a also receives the hub's outflow
    # no dangling nodes in this graph -> total mass conserved
    assert abs(sum(out.values()) - 1.0) < 1e-4
